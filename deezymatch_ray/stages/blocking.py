"""Blocking stage: derive join keys, control skew, group co-candidates.

The reference has no blocking — its candidate_ranker brute-forces a
global faiss index over every candidate (candidateRanker.py:361-364),
which cannot scale past one node. Blocking is our scale path (SURVEY
§7.1): documents sharing a q-gram of their normalized join text (or a
phonetic Soundex key) land in the same block; only within-block pairs
are scored. The pairwise-F1 target is defined on labeled pairs *sharing
a blocking key*.

Skew policy (explicit, logged — SURVEY §4): q-gram keys are Zipf-like;
a key appearing in more than ``max_block_size`` docs carries little
discriminative signal and would generate O(n²) pairs, so oversized
blocks are DROPPED from pair generation and reported in the block-stats
table — never silently.

All batch fns are Arrow-vectorized; `derive_block_keys` is a flat_map
implemented as `map_batches` returning more rows than in (the idiomatic
vectorized explode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from deezymatch_ray.config import BlockingConfig, PreprocessingConfig
from deezymatch_ray.functions.similarity import soundex_batch
from deezymatch_ray.functions.text import normalize_array, qgram_keys_table


class DeriveBlockKeys:
    """map_batches fn: (doc_id, <text_col>) → exploded (doc_id, block_key).

    Emits distinct q-gram keys of the bounded normalized text plus an
    optional Soundex key prefixed "snd:". Stateless and deterministic.
    """

    def __init__(
        self,
        text_col: str = "join_text",
        id_col: str = "doc_id",
        qgram: int = 3,
        use_phonetic: bool = True,
        preprocessing: PreprocessingConfig | None = None,
        prefix: str = "|",
        suffix: str = "|",
    ):
        self.text_col = text_col
        self.id_col = id_col
        self.qgram = qgram
        self.use_phonetic = use_phonetic
        self.prep = preprocessing or PreprocessingConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = normalize_array(
            batch[self.text_col],
            uni2ascii=self.prep.uni2ascii,
            lowercase=self.prep.lowercase,
            strip=self.prep.strip,
            only_latin_letters=self.prep.only_latin_letters,
        )
        out = qgram_keys_table(
            batch[self.id_col], norm, n=self.qgram, prefix="|", suffix="|",
            distinct=True, id_name=self.id_col, key_name="block_key",
        )
        if self.use_phonetic:
            snd = soundex_batch(norm.to_pylist())
            mask = np.array([bool(k) for k in snd])
            if mask.any():
                sel = pa.array(np.flatnonzero(mask), type=pa.int64())
                ids = (batch[self.id_col].combine_chunks()
                       if isinstance(batch[self.id_col], pa.ChunkedArray)
                       else batch[self.id_col]).take(sel)
                keys = pa.array([f"snd:{snd[i]}" for i in np.flatnonzero(mask)])
                out = pa.concat_tables(
                    [out, pa.table({self.id_col: ids, "block_key": keys})]
                )
        return out


def block_stats(keys: ray.data.Dataset) -> ray.data.Dataset:
    """(block_key, n_docs) — the block-size histogram / skew metric."""
    return keys.groupby("block_key").count()


def hot_keys(
    keys: ray.data.Dataset, max_block_size: int
) -> list[str]:
    """Collect keys exceeding the cap. The result is small by construction
    (#keys with count > cap ≤ total_rows / cap) — safe to take_all."""
    stats = block_stats(keys)
    hot = stats.filter(lambda row: row["count()"] > max_block_size)
    return [r["block_key"] for r in hot.take_all()]


def attach_payload(
    keys: ray.data.Dataset,
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("norm_text",),
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Hash-join block keys back to their payload columns (text,
    embeddings) so per-block groups are self-contained."""
    right = docs.select_columns([id_col, *payload_cols])
    return keys.join(
        right, join_type="inner", num_partitions=num_partitions, on=(id_col,)
    )
