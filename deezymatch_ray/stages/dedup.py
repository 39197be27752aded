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


def _shingle_hashes(texts: list, n: int) -> list[np.ndarray]:
    """Per-text distinct word-n-gram shingles as sorted 128-bit blake2b
    hashes (dtype 'S16'). 128 bits makes hash-identity a cryptographically
    safe stand-in for string identity, so every downstream count over
    hashes equals the count over the shingle strings themselves."""
    import hashlib

    out = []
    for t in texts:
        sh = word_shingles(t or "", n)
        if sh:
            h = np.array(
                [hashlib.blake2b(s.encode("utf-8"), digest_size=16).digest() for s in sh],
                dtype="S16",
            )
            h.sort()
        else:
            h = np.array([], dtype="S16")
        out.append(h)
    return out


def _hot_member(h: np.ndarray, hot: np.ndarray) -> np.ndarray:
    """Boolean mask: which of (sorted) ``h`` are in sorted ``hot``."""
    if hot.size == 0 or h.size == 0:
        return np.zeros(len(h), dtype=bool)
    idx = np.searchsorted(hot, h)
    idx = np.minimum(idx, len(hot) - 1)
    return hot[idx] == h


def _pack16(arr: np.ndarray) -> bytes:
    """Pack an 'S16' hash array into one blob (Acero joins reject
    list<binary> non-key fields; a flat binary column joins fine)."""
    return b"".join(bytes(v).ljust(16, b"\0") for v in arr)


def _unpack16(blob: bytes | None) -> set[bytes]:
    if not blob:
        return set()
    return {blob[i : i + 16].rstrip(b"\0") for i in range(0, len(blob), 16)}


def _join_partitions(requested: int) -> int:
    """Hash-shuffle joins schedule one aggregator actor per partition; a
    partition count above the cluster's CPU budget deadlocks the actor
    pool on small clusters (observed at num_partitions=64 with 4 CPUs).
    Cap by available CPUs; large clusters keep the requested width."""
    import ray as _ray

    cpus = int(_ray.available_resources().get("CPU", 8) or 8)
    return max(2, min(requested, cpus))


def jaccard_near_dup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_block: int = 2_000,
    num_partitions: int = 64,
    stats_out: dict | None = None,
) -> ray.data.Dataset:
    """EXACT word-n-gram-Jaccard near-dup pairs (doc_a < doc_b, jaccard).

    Scale design (round-2 rewrite — the round-1 plan shipped the full
    shingle list with every exploded row, an O(S²)-bytes-per-doc shuffle,
    and lost pairs whose min-shingle owner block was oversized):

    1. Hot-shingle census: per-batch partial counts of shingle hashes →
       tiny groupby → shingles with document frequency > ``max_block``
       are "hot" (broadcast to every stage via ``ray.put``; Zipf heads
       are few). No full-payload shuffle.
    2. Explode ``(shingle_hash: 16 bytes, id)`` rows for NON-hot shingles
       only — shuffle volume is O(total distinct shingles), linear in
       corpus size.
    3. Per-shingle blocks (≤ max_block by construction) emit each
       co-occurring pair once; a global ``groupby(pair).count`` yields the
       exact non-hot intersection size |A∩B \\ hot|.
    4. Each candidate pair hash-joins per-doc stats (|A|, and A's — short
       — hot-shingle subset); |A∩B| = non-hot count + |hotA ∩ hotB|, so
       hot shingles still contribute exactly to every verified pair.

    The only loss: a pair sharing *exclusively* hot shingles never
    becomes a candidate (finding it would cost O(freq²) on a key with
    freq > max_block). ``stats_out`` (if given) receives
    ``{"hot_shingles": count}`` so the drop surface is visible; with an
    empty hot set the result is unconditionally exact.
    """
    from ray.data.aggregate import Count, Sum

    docs = ds.select_columns([id_col, text_col])

    # --- pass 0: hot-shingle census (partial counts → small groupby) ---
    def partial_counts(batch: pa.Table) -> pa.Table:
        hs = _shingle_hashes(batch[text_col].to_pylist(), n)
        nonempty = [h for h in hs if h.size]
        if not nonempty:
            return pa.table({"sh": pa.array([], type=pa.binary()),
                             "cnt": pa.array([], type=pa.int64())})
        u, c = np.unique(np.concatenate(nonempty), return_counts=True)
        return pa.table({"sh": pa.array(u.tolist(), type=pa.binary()),
                         "cnt": pa.array(c)})

    sizes = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("sh").aggregate(Sum("cnt", alias_name="cnt"))
    )
    hot_rows = sizes.filter(expr=f"cnt > {max_block}").take_all()
    hot = np.array(sorted(r["sh"] for r in hot_rows), dtype="S16")
    if stats_out is not None:
        stats_out["hot_shingles"] = len(hot)
    hot_ref = ray.put(hot)

    # --- per-doc stats: shingle count + (short) hot subset ---
    def doc_stats(batch: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        hs = _shingle_hashes(batch[text_col].to_pylist(), n)
        n_sh = np.array([len(h) for h in hs], dtype=np.int64)
        hot_sub = [_pack16(h[_hot_member(h, hot_arr)]) for h in hs]
        return pa.table({
            id_col: batch[id_col],
            "n_sh": pa.array(n_sh),
            "hot_sh": pa.array(hot_sub, type=pa.binary()),
        })

    stats = docs.map_batches(doc_stats, batch_format="pyarrow")

    # --- explode non-hot (shingle_hash, id) rows ---
    def explode(batch: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        ids = batch[id_col].to_pylist()
        hs = _shingle_hashes(batch[text_col].to_pylist(), n)
        keep = [h[~_hot_member(h, hot_arr)] for h in hs]
        counts = [len(h) for h in keep]
        flat = (np.concatenate([h for h in keep if h.size])
                if any(counts) else np.array([], dtype="S16"))
        rep_ids = [ids[i] for i, c in enumerate(counts) for _ in range(c)]
        return pa.table({
            "sh": pa.array(flat.tolist(), type=pa.binary()),
            "id": pa.array(rep_ids),
        })

    keyed = docs.map_batches(explode, batch_format="pyarrow")

    # --- per-shingle pair emission (bucketed; blocks ≤ max_block) ---
    from deezymatch_ray.stages.ranking import bucketize

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        df = df.sort_values(["sh", "id"], kind="stable")
        sh = df["sh"].to_numpy()
        ids = df["id"].to_numpy()
        starts = np.flatnonzero(np.concatenate([[True], sh[1:] != sh[:-1]]))
        bounds = np.append(starts, len(df))
        a_parts, b_parts = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2:
                continue
            iu, il = np.triu_indices(m, 1)  # iu < il positionally
            # ids sorted within segment → ids[s+iu] < ids[s+il] pins a < b
            a_parts.append(ids[s + iu])
            b_parts.append(ids[s + il])
        if not a_parts:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        keep = a != b  # duplicate input ids never self-pair
        return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]})

    pairs = bucketize(keyed, ["sh"], num_partitions).groupby("__bucket").map_groups(
        lambda df: emit_pairs(df.drop(columns=["__bucket"])),
        batch_format="pandas",
    )

    # --- exact non-hot intersection size per pair ---
    cand = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="inter_nh"))

    # --- join per-doc stats (hash shuffle join; both sides scale) ---
    def rename_stats(suffix: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                f"doc_{suffix}": batch[id_col],
                f"n_{suffix}": batch["n_sh"],
                f"hot_{suffix}": batch["hot_sh"],
            })
        return fn

    jp = _join_partitions(num_partitions)
    cand = cand.join(
        stats.map_batches(rename_stats("a"), batch_format="pyarrow"),
        join_type="inner", num_partitions=jp, on=("doc_a",),
    ).join(
        stats.map_batches(rename_stats("b"), batch_format="pyarrow"),
        join_type="inner", num_partitions=jp, on=("doc_b",),
    )

    # --- exact Jaccard + threshold ---
    def finish(batch: pa.Table) -> pa.Table:
        cnt = np.asarray(batch["inter_nh"].to_pylist(), dtype=np.float64)
        n_a = np.asarray(batch["n_a"].to_pylist(), dtype=np.float64)
        n_b = np.asarray(batch["n_b"].to_pylist(), dtype=np.float64)
        hot_arr = ray.get(hot_ref)
        inter = cnt
        if hot_arr.size:
            hot_a = batch["hot_a"].to_pylist()
            hot_b = batch["hot_b"].to_pylist()
            extra = np.array(
                [len(_unpack16(x) & _unpack16(y)) for x, y in zip(hot_a, hot_b)],
                dtype=np.float64,
            )
            inter = cnt + extra
        denom = n_a + n_b - inter
        jac = np.divide(inter, denom, out=np.zeros_like(inter), where=denom > 0)
        keep = jac >= threshold
        kept = batch.filter(pa.array(keep))  # preserves id column types
        return pa.table({
            "doc_a": kept["doc_a"],
            "doc_b": kept["doc_b"],
            # Python round (correctly rounded) — np.round can land one ulp
            # off DuckDB's round and break value-hash compares
            "jaccard": pa.array([round(float(v), 6) for v in jac[keep]],
                                type=pa.float64()),
        })

    return cand.map_batches(finish, batch_format="pyarrow")


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
