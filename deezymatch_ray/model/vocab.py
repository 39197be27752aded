"""Vocabulary: token → dense index, with reserved _PAD=0 / _UNK=1.

Mirrors the reference's ``lookupToken`` (data_processing.py:474-494) but
with *deterministic* index assignment (tokens sorted lexicographically)
so every actor replica built from the same token set is identical —
a requirement the reference's insertion-order dict does not meet
(SURVEY §7.4). Persisted as Parquet ``(token, index, count)``, never
pickle.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

PAD_TOKEN = "_PAD"
UNK_TOKEN = "_UNK"


def assign_indices(token_counts: dict[str, int]) -> dict[str, int]:
    """Dense indices: _PAD=0, _UNK=1, then sorted tokens from 2."""
    tok2index = {PAD_TOKEN: 0, UNK_TOKEN: 1}
    for t in sorted(token_counts):
        if t not in tok2index:
            tok2index[t] = len(tok2index)
    return tok2index


def build_vocab_local(
    strings: Iterable[str],
    tokenize: Sequence[str] = ("char", "ngram"),
    min_gram: int = 2,
    max_gram: int = 3,
    token_sep: str = "default",
    prefix_suffix=("<", ">"),
    seed_tokens: Iterable[str] = (),
) -> tuple[dict[str, int], dict[str, int]]:
    """Driver-side vocab build (small inputs / tests). Returns
    (tok2index, tok2count). ``seed_tokens`` mirrors the reference's
    pre-seeded char list (data_processing.py:219-228)."""
    from deezymatch_ray.functions.text import string_split

    counts: Counter[str] = Counter()
    for t in seed_tokens:
        counts[t] += 0
    for s in strings:
        counts.update(
            string_split(s, tokenize=tokenize, min_gram=min_gram, max_gram=max_gram,
                         token_sep=token_sep, prefix_suffix=prefix_suffix)
        )
    return assign_indices(dict(counts)), dict(counts)


def build_vocab_distributed(
    ds,
    text_cols: Sequence[str] = ("s1", "s2"),
    tokenize: Sequence[str] = ("char", "ngram"),
    min_gram: int = 2,
    max_gram: int = 3,
    token_sep: str = "default",
    prefix_suffix=("<", ">"),
    seed_tokens: Iterable[str] = (),
) -> tuple[dict[str, int], dict[str, int]]:
    """A2 as a Ray pipeline: per-batch token Counters (combiner) →
    groupby(token).sum → driver collects the (small) token table and
    assigns deterministic indices. ``seed_tokens`` unions in the
    reference's pre-seeded char list (D3, data_processing.py:219-228)."""
    from ray.data.aggregate import Sum

    from deezymatch_ray.functions.text import string_split

    def explode(batch: pa.Table) -> pa.Table:
        c: Counter[str] = Counter()
        for col in text_cols:
            for s in batch[col].to_pylist():
                if s is not None:
                    c.update(string_split(
                        s, tokenize=tokenize, min_gram=min_gram,
                        max_gram=max_gram, token_sep=token_sep,
                        prefix_suffix=prefix_suffix))
        return pa.table({
            "token": pa.array(list(c.keys()), type=pa.string()),
            "partial": pa.array(list(c.values()), type=pa.int64()),
        })

    agg = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("partial", alias_name="n"))
    )
    counts = {r["token"]: int(r["n"]) for r in agg.take_all()}
    for t in seed_tokens:
        counts.setdefault(t, 0)
    return assign_indices(counts), counts


def vocab_to_table(tok2index: dict[str, int], tok2count: dict[str, int] | None = None) -> pa.Table:
    toks = sorted(tok2index, key=tok2index.__getitem__)
    return pa.table(
        {
            "token": pa.array(toks, type=pa.string()),
            "index": pa.array([tok2index[t] for t in toks], type=pa.int32()),
            "count": pa.array(
                [(tok2count or {}).get(t, 0) for t in toks], type=pa.int64()
            ),
        }
    )


def save_vocab(path: str, tok2index: dict[str, int], tok2count: dict[str, int] | None = None) -> None:
    pq.write_table(vocab_to_table(tok2index, tok2count), path)


def load_vocab(path: str) -> dict[str, int]:
    tab = pq.read_table(path, columns=["token", "index"])
    return dict(zip(tab["token"].to_pylist(), tab["index"].to_pylist()))
