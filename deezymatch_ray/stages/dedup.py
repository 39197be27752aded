"""Deduplication stages over a flat document table (id, text).

Five dedup families a large-scale training-data pipeline needs, each a
Ray Data plan (the reference has only per-ranker exact dedup,
candidateRanker.py:483-492 — SURVEY §2.7 D1; everything else here is
the engine's own scale surface):

- ``exact_dedup``: hash-partition on the full text, keep min id per
  group — one ``groupby`` shuffle, no driver materialization.
- ``jaccard_near_dup``: EXACT word-shingle Jaccard near-dup. Candidate
  generation = share-a-shingle blocking (complete: J(a,b) > 0 ⟹ a and b
  share a shingle), verification = exact Jaccard inside the block, and
  each surviving pair is emitted exactly once — by the block whose key
  equals the pair's lexicographically-smallest shared shingle — so no
  pair-dedup shuffle is needed. Matches the brute-force SQL oracle
  row-for-row.
- ``minhash_lsh_near_dup``: the 100 TB path. Docs → k-perm MinHash
  signatures → banded LSH keys → per-band candidate pairs → signature-
  estimated Jaccard filter; pairs dedup via min-band emission.
- ``simhash_fingerprints`` / ``simhash_near_dup``: 64-bit SimHash;
  near-dup candidates from 8-bit band blocking (Hamming ≤ r pairs must
  share one of r+1 bands when banded into r+1 segments — pigeonhole),
  verified by exact Hamming distance.
- ``embedding_near_dup``: exact cosine over an embedding column against
  a broadcast matrix (valid while one side fits in the object store;
  the blocked/IVF variant is `ann.py`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from deezymatch_ray.functions.dedup import (
    band_keys,
    hamming64,
    minhash_signatures,
    simhash64_batch,
    word_shingles,
    words,
)


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(text, doc_id=min id among exact duplicates). One shuffle."""
    return (
        ds.select_columns([id_col, text_col])
        .groupby(text_col)
        .aggregate(Min(id_col, alias_name=id_col))
    )


class _ShingleExplode:
    """map_batches fn: (id, text) → (shingle, id, shingles) rows, one per
    distinct shingle. The full (sorted) shingle list travels with each
    row so per-block verification is self-contained."""

    def __init__(self, text_col: str, id_col: str, n: int):
        self.text_col, self.id_col, self.n = text_col, id_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_key: list[str] = []
        out_id: list = []
        out_sh: list[list[str]] = []
        for i, t in enumerate(texts):
            sh = sorted(word_shingles(t or "", self.n))
            for s in sh:
                out_key.append(s)
                out_id.append(ids[i])
                out_sh.append(sh)
        return pa.table({
            "shingle": pa.array(out_key, type=pa.string()),
            "id": pa.array(out_id),
            "shingles": pa.array(out_sh, type=pa.list_(pa.string())),
        })


def _jaccard_block(group: pd.DataFrame, *, threshold: float, max_block: int) -> pd.DataFrame:
    """Within one shingle block: exact Jaccard for id_a < id_b pairs;
    emit only pairs whose min shared shingle is this block's key."""
    empty = pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    n = len(group)
    if n < 2 or n > max_block:
        return empty
    key = group["shingle"].iloc[0]
    order = np.argsort(group["id"].to_numpy(), kind="stable")
    ids = group["id"].to_numpy()[order]
    sets = [set(s) for s in group["shingles"].to_numpy()[order]]
    ra, rb, rj = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            if ids[i] == ids[j]:
                continue
            inter = sets[i] & sets[j]
            if min(inter) != key:  # another block owns this pair
                continue
            jac = len(inter) / (len(sets[i]) + len(sets[j]) - len(inter))
            if jac >= threshold:
                ra.append(ids[i]); rb.append(ids[j]); rj.append(round(jac, 6))
    return pd.DataFrame({"doc_a": ra, "doc_b": rb, "jaccard": rj})


def jaccard_near_dup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_block: int = 10_000,
) -> ray.data.Dataset:
    """Exact word-n-gram-Jaccard near-dup pairs (doc_a < doc_b)."""
    import functools

    keyed = ds.map_batches(
        _ShingleExplode(text_col, id_col, n), batch_format="pyarrow"
    )
    return keyed.groupby("shingle").map_groups(
        functools.partial(_jaccard_block, threshold=threshold, max_block=max_block),
        batch_format="pandas",
    )


class _MinHashStage:
    """Actor-pool stage: (id, text) → (id, sig fixed_size_list<uint64 as
    int64-bitcast>, band_key exploded rows). MinHash params are built
    once per actor in __init__."""

    def __init__(self, text_col: str, id_col: str, n: int, k: int, n_bands: int, seed: int):
        self.text_col, self.id_col = text_col, id_col
        self.n, self.k, self.n_bands, self.seed = n, k, n_bands, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        shingles = [word_shingles(t or "", self.n) for t in texts]
        sigs = minhash_signatures(shingles, k=self.k, seed=self.seed)
        keys = band_keys(sigs, self.n_bands)
        out_key, out_id, out_sig = [], [], []
        for i in range(len(ids)):
            for bk in keys[i]:
                out_key.append(bk)
                out_id.append(ids[i])
                out_sig.append(sigs[i].view(np.int64))
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(out_sig) if out_sig else np.array([], dtype=np.int64)),
            self.k,
        )
        return pa.table({
            "band_key": pa.array(out_key, type=pa.string()),
            "id": pa.array(out_id),
            "sig": sig_col,
        })


def _first_equal_band(eq: np.ndarray, rows_per_band: int) -> int:
    nb = len(eq) // rows_per_band
    bands = eq[: nb * rows_per_band].reshape(nb, rows_per_band)
    full = bands.all(axis=1)
    idx = np.flatnonzero(full)
    return int(idx[0]) if len(idx) else -1


def minhash_lsh_near_dup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    n_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 7,
    max_block: int = 10_000,
    concurrency: tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Approximate near-dup pairs (doc_a < doc_b, est_jaccard) at scale:
    only signatures shuffle; candidate pairs come from banded LSH."""
    import functools

    keyed = ds.map_batches(
        _MinHashStage,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, n=n, k=k, n_bands=n_bands, seed=seed
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    rows_per_band = k // n_bands

    def block(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        m = len(group)
        if m < 2 or m > max_block:
            return empty
        bidx = int(group["band_key"].iloc[0].split(":", 1)[0])
        order = np.argsort(group["id"].to_numpy(), kind="stable")
        ids = group["id"].to_numpy()[order]
        sigs = np.stack(group["sig"].to_numpy()[order]).view(np.uint64)
        ra, rb, rj = [], [], []
        for i in range(m):
            for j in range(i + 1, m):
                if ids[i] == ids[j]:
                    continue
                eq = sigs[i] == sigs[j]
                if _first_equal_band(eq, rows_per_band) != bidx:
                    continue
                est = float(eq.mean())
                if est >= threshold:
                    ra.append(ids[i]); rb.append(ids[j]); rj.append(round(est, 6))
        return pd.DataFrame({"doc_a": ra, "doc_b": rb, "est_jaccard": rj})

    return keyed.groupby("band_key").map_groups(block, batch_format="pandas")


def simhash_fingerprints(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, simhash hex string) per document."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sigs = simhash64_batch([words(t or "") for t in texts])
        hexes = [f"{int(s):016x}" for s in sigs]
        return pa.table({
            id_col: batch[id_col],
            "simhash": pa.array(hexes, type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_near_dup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_block: int = 10_000,
) -> ray.data.Dataset:
    """Pairs (doc_a < doc_b, hamming) with SimHash Hamming ≤ r, found by
    (r+1)-segment band blocking (pigeonhole-complete) + exact verify."""
    n_seg = max_hamming + 1
    seg_bits = 64 // n_seg

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        sigs = simhash64_batch([words(t or "") for t in texts])
        out_key, out_id, out_sig = [], [], []
        for i, s in enumerate(sigs):
            for seg in range(n_seg):
                part = (int(s) >> (seg * seg_bits)) & ((1 << seg_bits) - 1)
                out_key.append(f"{seg}:{part:x}")
                out_id.append(ids[i])
                out_sig.append(np.int64(np.uint64(s).view(np.int64)))
        return pa.table({
            "seg_key": pa.array(out_key, type=pa.string()),
            "id": pa.array(out_id),
            "sig": pa.array(np.array(out_sig, dtype=np.int64)),
        })

    def block(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        m = len(group)
        if m < 2 or m > max_block:
            return empty
        seg_idx = int(group["seg_key"].iloc[0].split(":", 1)[0])
        order = np.argsort(group["id"].to_numpy(), kind="stable")
        ids = group["id"].to_numpy()[order]
        sigs = group["sig"].to_numpy()[order].view(np.uint64)
        ii, jj = np.triu_indices(m, 1)
        if len(ii) == 0:
            return empty
        hd = hamming64(sigs[ii], sigs[jj])
        keep = (hd <= max_hamming) & (ids[ii] != ids[jj])
        ii, jj, hd = ii[keep], jj[keep], hd[keep]
        # min-segment emission: the first matching segment owns the pair
        own = np.zeros(len(ii), dtype=bool)
        for t in range(len(ii)):
            a, b = int(sigs[ii[t]]), int(sigs[jj[t]])
            for seg in range(n_seg):
                mask = ((1 << seg_bits) - 1) << (seg * seg_bits)
                if (a & mask) == (b & mask):
                    own[t] = seg == seg_idx
                    break
        return pd.DataFrame({
            "doc_a": ids[ii[own]], "doc_b": ids[jj[own]], "hamming": hd[own]
        })

    keyed = ds.map_batches(explode, batch_format="pyarrow")
    return keyed.groupby("seg_key").map_groups(block, batch_format="pandas")


def embedding_near_dup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    round_to: int = 3,
) -> ray.data.Dataset:
    """Exact cosine near-dup pairs (vec_a < vec_b, cos_sim) via one pass
    of row-blocks against the broadcast full matrix (``ray.put`` once).
    Valid while the matrix fits in the object store; beyond that, use
    the IVF route in stages/ann.py."""
    import ray as _ray

    tbl = pa.concat_tables(
        ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow")
    )
    ids = np.asarray(tbl[id_col].to_pylist())
    mat = np.stack([np.asarray(v, dtype=np.float32) for v in tbl[vec_col].to_pylist()])
    mat64 = mat.astype(np.float64)
    norms = np.linalg.norm(mat64, axis=1)
    payload = _ray.put((ids, mat64, norms))

    def fn(batch: pa.Table) -> pa.Table:
        c_ids, c_mat, c_norms = _ray.get(payload)
        q_ids = np.asarray(batch[id_col].to_pylist())
        q = np.stack([np.asarray(v, dtype=np.float32) for v in batch[vec_col].to_pylist()]).astype(np.float64)
        qn = np.linalg.norm(q, axis=1)
        sims = (q @ c_mat.T) / np.maximum(qn[:, None] * c_norms[None, :], 1e-12)
        qi, ci = np.nonzero((sims >= threshold) & (q_ids[:, None] < c_ids[None, :]))
        return pa.table({
            "vec_a": pa.array(q_ids[qi]),
            "vec_b": pa.array(c_ids[ci]),
            # Python round (correctly rounded) — np.round can land one ulp
            # off DuckDB's round and break value-hash compares
            "cos_sim": pa.array([round(float(v), round_to) for v in sims[qi, ci]],
                                type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
