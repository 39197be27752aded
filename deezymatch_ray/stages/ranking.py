"""Candidate ranking: exact per-query top-k with DeezyMatch semantics.

Reproduces the reference ``candidate_ranker`` result set
(candidateRanker.py:369-570) without its sequential per-query loop:

- The adaptive faiss window loop (:369-510) converges to exactly
  {candidates with metric ≤ threshold}, ranked, deduped (keep lowest
  distance first, :483-492), truncated to ``num_candidates`` (:533-544)
  — because faiss returns neighbors in ascending distance (SURVEY §2.6
  K2). We compute that fixpoint directly.
- ``faiss_dist`` is squared L2 (faiss IndexFlatL2 convention);
  ``cosine_dist`` = 1 − cosine similarity (:420-429); ``pred_score`` =
  siamese p1 (:431-441).
- Tie-breaking at equal metric values is pinned to ascending
  ``candidate_id`` (stable) — faiss leaves tie order unspecified
  (SURVEY §7.4), so a distributed engine must fix it.

Two physical plans, same output schema:

- ``rank_blocked``: queries ∪ candidates → block keys → per-block exact
  scoring → global per-query merge. Scales to any candidate count; the
  result equals the reference restricted to pairs sharing a blocking key
  (the F1-gate population).
- ``rank_global``: broadcast the full candidate matrix via ``ray.put``
  once, stream queries through ``map_batches`` computing exact global
  top-k (chunked matmuls). Bit-identical to the reference's global
  search for the ``faiss`` metric with unique candidate strings;
  usable while candidates fit in the object store.

Documented DELIBERATE deviations from the reference (exact-parity
claims above are scoped by these):

1. Candidate-string dedup: the reference dedups duplicate candidate
   *strings* (``s2_orig``, candidateRanker.py:483-492), so two distinct
   candidate ids with the same name yield ONE row; the DEFAULT here
   dedups on (query_id, candidate_id) — duplicate-named candidates each
   keep a row. Deterministic ids are the primary key of a distributed
   result; collapsing by display string would make output depend on id
   order. Opt-in reference parity: ``ranking.dedup_on =
   "candidate_string"`` collapses spellings keep-lowest-(metric, id) —
   exact parity for ``ranking_metric="faiss"`` only (the reference
   keeps the first duplicate in faiss-walk L2 order,
   candidateRanker.py:483-492; under ``cosine``/``conf`` our
   keep-lowest-metric row can differ, consistent with deviation 2).
2. ``cosine``/``conf`` metrics: the reference walks faiss L2-ordered
   windows and breaks on a *cosine/conf* threshold (:406-476) — the
   break is non-monotone in the walk order, and ``conf`` stops once
   ``num_candidates`` accumulate in faiss order, so its result set is
   not a pure threshold fixpoint. We compute the threshold fixpoint in
   the chosen metric directly: a superset-or-equal, order-deterministic
   result. Only the ``faiss`` metric is bit-parity.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from deezymatch_ray.config import EngineConfig
from deezymatch_ray.stages.blocking import DeriveBlockKeys
from deezymatch_ray.stages.scoring import Embedder, PairScorer, emb_matrix

RANK_SCHEMA_COLS = [
    "query_id", "query", "candidate_id", "candidate",
    "faiss_dist", "cosine_dist", "pred_score", "rank",
]


def _metric_column(metric: str) -> str:
    return {"faiss": "faiss_dist", "cosine": "cosine_dist", "conf": "pred_score"}[metric]


def prepare_side(
    ds: ray.data.Dataset,
    cfg: EngineConfig,
    weights_ref,
    vocab_ref,
    meta: dict,
    id_col: str,
    text_col: str,
) -> ray.data.Dataset:
    """Normalize + embed one side; output (id, orig, norm_text, emb,
    emb_valid). Projection happens here — spans/media never travel
    further (SURVEY §7.4 wide-row rule)."""
    from deezymatch_ray.functions.text import normalize_array

    prep = cfg.preprocessing

    def norm_batch(batch: pa.Table) -> pa.Table:
        norm = normalize_array(
            batch[text_col], uni2ascii=prep.uni2ascii, lowercase=prep.lowercase,
            strip=prep.strip, only_latin_letters=prep.only_latin_letters,
        )
        return pa.table({
            "id": batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col],
            "orig": batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col],
            "norm_text": norm,
        })

    out = ds.map_batches(norm_batch, batch_format="pyarrow")
    # task pool + per-worker stage cache (scoring.CachedStage): model
    # state is a zero-copy plasma fetch, so an actor pool would only add
    # its per-run process forks to every ranking pipeline
    from deezymatch_ray.stages.scoring import CachedStage

    return out.map_batches(
        CachedStage.of(
            Embedder,
            weights_ref=weights_ref, vocab_ref=vocab_ref, meta=meta,
            text_col="norm_text", preprocessing=cfg.preprocessing,
            tokenization=cfg.tokenization,
        ),
        batch_format="pyarrow",
        batch_size=cfg.execution.score_batch_size,
    )


_FNV_PRIME = np.uint64(0x100000001B3)


def _resolve_hash_backend() -> tuple[str, str | None]:
    """Decide the bucket-hash backend ONCE (on the driver, at bucketize
    call time) and ship the decision through the UDF closure. Deciding
    per worker would let a heterogeneous cluster (polars on some nodes,
    or mixed polars versions — ``pl.hash`` is only stable within one
    version) silently send identical keys to different buckets, losing
    cross-bucket matches in every bucketized groupby. Workers verify
    the shipped decision and fail loudly on mismatch instead."""
    try:
        import polars as pl

        return ("polars", pl.__version__)
    except ImportError:
        return ("pandas", None)


def _hash_col_u64(col, backend: tuple[str, str | None]) -> np.ndarray:
    """Vectorized per-row uint64 hash of one Arrow column, no Python
    objects in the loop. polars' xxhash runs directly on the Arrow
    buffers (zero-copy; ~3× faster than pandas' object-path siphash on
    strings, ~100× on ints); ``backend`` is the driver's resolved
    (name, version) — see ``_resolve_hash_backend``. Falls back to
    pandas' fixed-key siphash when the driver had no polars."""
    name, want_version = backend
    if name == "polars":
        try:
            import polars as pl
        except ImportError:
            raise RuntimeError(
                "bucketize hash backend mismatch: driver resolved polars "
                f"{want_version} but this worker has no polars — "
                "heterogeneous environments would silently split hash "
                "buckets; install polars on every node or force the "
                "pandas backend"
            ) from None
        if pl.__version__ != want_version:
            raise RuntimeError(
                "bucketize hash backend mismatch: driver polars "
                f"{want_version} vs worker polars {pl.__version__} — "
                "pl.hash is only stable within one version; a mixed-"
                "version cluster would silently split hash buckets"
            )
        return pl.from_arrow(col).hash(seed=0).to_numpy()
    return pd.util.hash_pandas_object(
        col.to_pandas(), index=False
    ).to_numpy().astype(np.uint64, copy=False)


def _stable_bucket(batch: pa.Table, key_cols: list[str],
                   num_buckets: int,
                   backend: tuple[str, str | None] | None = None) -> np.ndarray:
    """Process-stable hash buckets, fully vectorized (unlike the
    per-process-salted Python ``hash()``): one 64-bit column hash per
    key column, FNV-combined across columns in fixed order — the same
    construction as the content hash in ``state/checkpoint``. Replaces
    the round-3 per-row ``zlib.crc32(str(k))`` generator that fronted
    every shuffle."""
    if backend is None:
        backend = _resolve_hash_backend()
    acc = None
    with np.errstate(over="ignore"):
        for c in key_cols:
            h = _hash_col_u64(batch[c], backend)
            acc = h if acc is None else (acc ^ h) * _FNV_PRIME
    return (acc % np.uint64(num_buckets)).astype(np.int64)


def bucketize(ds: ray.data.Dataset, key_cols: list[str], num_buckets: int,
              col: str = "__bucket") -> ray.data.Dataset:
    """Append a stable hash-bucket column over one or more key columns.

    Buckets bound the number of map_groups invocations: Ray's
    map_groups calls the UDF once per group, so grouping directly on a
    fine key (50k q-gram blocks, one million query ids) pays per-group
    scheduling/pandas overhead that dwarfs the math. Grouping on
    ``hash(key) % num_buckets`` keeps each key's rows together while the
    UDF processes a whole bucket of groups vectorized."""
    backend = _resolve_hash_backend()  # driver-side; shipped in closure

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            col,
            pa.array(_stable_bucket(batch, key_cols, num_buckets, backend)),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def score_block_bucket(df: pd.DataFrame, *, cfg: EngineConfig,
                       self_join: bool = False,
                       keep_per_query: int | None = None) -> pd.DataFrame:
    """Score ALL blocks inside one hash bucket, vectorized across blocks.

    Emits (query_id, query, candidate_id, candidate, faiss_dist,
    cosine_dist) for within-block query×candidate pairs. Per-block
    Python work is O(#blocks) tiny index constructions; every distance /
    mask / top-k runs once over the bucket's full pair set. When the
    metric is distance-based, pairs over the selection threshold are
    dropped here (monotone filter — they can never enter the final
    result), bounding what the final shuffle carries. Per-(block, query)
    pre-top-k is sound because global top-k ⊆ union of per-block top-k.
    """
    r = cfg.ranking
    keep = keep_per_query or r.num_candidates
    out_cols = ["query_id", "query", "candidate_id", "candidate",
                "faiss_dist", "cosine_dist"]
    empty = pd.DataFrame({c: [] for c in out_cols})
    if len(df) == 0:
        return empty
    if "__bucket" in df.columns:
        df = df.drop(columns=["__bucket"])
    df = df.sort_values("block_key", kind="stable").reset_index(drop=True)
    bk = df["block_key"].to_numpy()
    starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
    bounds = np.append(starts, len(df))
    valid = df["emb_valid"].to_numpy()
    has_roles = "role" in df.columns
    roles = df["role"].to_numpy() if has_roles else None
    qi_parts, ci_parts = [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        n = e - s
        if self_join:
            # Salted tiles (key contains the tile marker) are EXEMPT from
            # the size caps: salt_hot_blocks already bounded them (groups
            # sized with 2× headroom), and skipping one here would silently
            # lose every pair the tile owns — the caps only police
            # organically oversized *unsalted* blocks, whose drop is
            # surfaced in block stats.
            is_tile = "\x1ftile:" in str(bk[s])
            # salted cross-tiles carry two roles (q = lower tile group,
            # c = upper); plain blocks / diagonal tiles are all-"q"
            if has_roles and (roles[s:e] == "c").any():
                qs = s + np.flatnonzero(roles[s:e] == "q")
                cs = s + np.flatnonzero(roles[s:e] == "c")
                if len(qs) == 0 or len(cs) == 0:
                    continue
                qi_parts.append(np.repeat(qs, len(cs)))
                ci_parts.append(np.tile(cs, len(qs)))
                continue
            if n < 2:
                continue
            if not is_tile and (
                    n > cfg.blocking.max_block_size
                    or n * (n - 1) // 2 > cfg.blocking.max_pairs_per_block):
                continue
            iu, il = np.triu_indices(n, 1)
            qi_parts.append(iu + s)
            ci_parts.append(il + s)
        else:
            qs = s + np.flatnonzero(roles[s:e] == "q")
            cs = s + np.flatnonzero(roles[s:e] == "c")
            if len(qs) == 0 or len(cs) == 0:
                continue
            if (max(len(qs), len(cs)) > cfg.blocking.max_block_size
                    or len(qs) * len(cs) > cfg.blocking.max_pairs_per_block):
                # oversized block: a key this common carries no signal and
                # would cost O(n²) — skip per the documented skew policy
                continue
            qi_parts.append(np.repeat(qs, len(cs)))
            ci_parts.append(np.tile(cs, len(qs)))
    if not qi_parts:
        return empty
    # --- per-pair distances via per-BLOCK gram matmuls ---------------
    # (the previous plan gathered [P, d] float64 matrices for the full
    # bucket pair set — multi-GB temporaries at ~10M pairs; the gram
    # form computes the same float64 ||a||² + ||b||² − 2·a·b that
    # _GlobalTopK uses, per pair gathers only SCALARS, and runs on BLAS)
    emb64 = np.stack(df["emb"].to_numpy()).astype(np.float64)
    nrm2 = (emb64 * emb64).sum(axis=1)
    want_cos = r.calc_cosine or r.ranking_metric == "cosine"
    nrm = np.sqrt(nrm2) if want_cos else None
    pair_ids = df["id"].to_numpy()
    lens = (df["norm_text"].str.len().to_numpy()
            if r.length_diff is not None else None)
    kq, kc, kf, kcs = [], [], [], []
    for qi, ci in zip(qi_parts, ci_parts):
        m = valid[qi] & valid[ci]
        qi, ci = qi[m], ci[m]
        if len(qi) == 0:
            continue
        if self_join:
            # canonical orientation (query_id < candidate_id): row order
            # inside a block is partition-dependent, so the same
            # unordered pair could otherwise surface in both
            # orientations from different blocks and evade dedup_pairs
            swap = pair_ids[qi] > pair_ids[ci]
            qi2 = np.where(swap, ci, qi)
            ci2 = np.where(swap, qi, ci)
            qi, ci = qi2, ci2
        # the block's member set is small: gather unique rows once,
        # matmul, then index the gram by local pair positions
        uniq, inv = np.unique(np.concatenate([qi, ci]), return_inverse=True)
        li, lj = inv[: len(qi)], inv[len(qi):]
        E = emb64[uniq]
        G = E @ E.T
        dot = G[li, lj]
        faiss_d = nrm2[qi] + nrm2[ci] - 2.0 * dot
        np.maximum(faiss_d, 0.0, out=faiss_d)
        faiss_d = faiss_d.astype(np.float32)
        if want_cos:
            cos_d = (1.0 - dot / np.maximum(nrm[qi] * nrm[ci], 1e-10)).astype(np.float32)
        else:
            cos_d = np.full(len(qi), np.nan, dtype=np.float32)
        if r.length_diff is not None:
            m = np.abs(lens[qi] - lens[ci]) <= r.length_diff
            qi, ci, faiss_d, cos_d = qi[m], ci[m], faiss_d[m], cos_d[m]
        if r.ranking_metric in ("faiss", "cosine"):
            metric = faiss_d if r.ranking_metric == "faiss" else cos_d
            m = metric <= r.selection_threshold
            qi, ci, faiss_d, cos_d = qi[m], ci[m], faiss_d[m], cos_d[m]
        if len(qi):
            kq.append(qi)
            kc.append(ci)
            kf.append(faiss_d)
            kcs.append(cos_d)
    if not kq:
        return empty
    qi = np.concatenate(kq)
    ci = np.concatenate(kc)
    faiss_d = np.concatenate(kf)
    cos_d = np.concatenate(kcs)
    ids = df["id"].to_numpy()
    origs = df["orig"].to_numpy()
    out = pd.DataFrame({
        "query_id": ids[qi], "query": origs[qi],
        "candidate_id": ids[ci], "candidate": origs[ci],
        "faiss_dist": faiss_d, "cosine_dist": cos_d,
        "__bk": bk[qi],
    })
    if r.ranking_metric in ("faiss", "cosine"):
        mcol = _metric_column(r.ranking_metric)
        out = (
            out.sort_values([mcol, "candidate_id"], kind="stable")
            .groupby(["__bk", "query_id"], sort=False)
            .head(keep)
        )
    return out.drop(columns=["__bk"]).reset_index(drop=True)


def select_bucket(df: pd.DataFrame, *, cfg: EngineConfig) -> pd.DataFrame:
    """Final per-query selection over a whole query-hash bucket: dedup
    keep-lowest-metric-first (candidateRanker.py:483-492), threshold on
    the ranking metric, stable sort, truncate, assign rank — one
    vectorized pandas pass for every query in the bucket."""
    r = cfg.ranking
    mcol = _metric_column(r.ranking_metric)
    asc = r.ranking_metric != "conf"
    if "__bucket" in df.columns:
        df = df.drop(columns=["__bucket"])
    if len(df) == 0:
        return pd.DataFrame({c: [] for c in RANK_SCHEMA_COLS})
    g = df.sort_values(["query_id", mcol, "candidate_id"],
                       ascending=[True, asc, True], kind="stable")
    g = g.drop_duplicates(subset=["query_id", "candidate_id"], keep="first")
    if getattr(r, "dedup_on", "candidate_id") == "candidate_string":
        # reference parity (candidateRanker.py:483-492): duplicate
        # candidate SPELLINGS collapse to the lowest-(metric, id) row —
        # the sort above already orders exactly that way per query
        g = g.drop_duplicates(subset=["query_id", "candidate"], keep="first")
    if r.ranking_metric == "conf":
        g = g[g["pred_score"] >= r.selection_threshold]
    else:
        g = g[g[mcol] <= r.selection_threshold]
    g = g.groupby("query_id", sort=False).head(r.num_candidates)
    g = g.reset_index(drop=True)
    g["rank"] = (g.groupby("query_id", sort=False).cumcount() + 1).astype(np.int32)
    return g[[c for c in RANK_SCHEMA_COLS if c in g.columns]]


def dedup_pairs(ds: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Drop duplicate (query_id, candidate_id) rows — the D1 pattern
    (SURVEY §2.7): hash-bucket the pair key, vectorized drop_duplicates
    per bucket. Distances are identical across a pair's blocks, so
    keep-any is exact."""
    keyed = bucketize(ds, ["query_id", "candidate_id"], num_buckets)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(subset=["query_id", "candidate_id"])
        return out.drop(columns=["__bucket"])

    return keyed.groupby("__bucket").map_groups(fn, batch_format="pandas")


def _with_pred(pairs: ray.data.Dataset, cfg: EngineConfig, weights_ref, vocab_ref, meta):
    """Attach pred_score via the PairScorer actor pool (needed for the
    'conf' metric or calc_predict; skipped otherwise — the reference
    only runs the model when asked, candidateRanker.py:431-441)."""
    return pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs=dict(
            weights_ref=weights_ref, vocab_ref=vocab_ref, meta=meta,
            s1_col="query", s2_col="candidate", with_classical=False,
            preprocessing=cfg.preprocessing, tokenization=cfg.tokenization,
        ),
        batch_format="pyarrow",
        batch_size=cfg.execution.score_batch_size,
        concurrency=cfg.execution.score_concurrency,
    )


def _ensure_pred_col(ds: ray.data.Dataset) -> ray.data.Dataset:
    def add_nan(batch: pa.Table) -> pa.Table:
        if "pred_score" in batch.column_names:
            return batch
        return batch.append_column(
            "pred_score", pa.array(np.full(len(batch), np.nan, dtype=np.float32))
        )
    return ds.map_batches(add_nan, batch_format="pyarrow")


def rank_blocked(
    queries: ray.data.Dataset,
    candidates: ray.data.Dataset,
    cfg: EngineConfig,
    weights_ref,
    vocab_ref,
    meta: dict,
    query_id="id", query_text="name", cand_id="id", cand_text="name",
) -> ray.data.Dataset:
    """Blocked ranking plan. Input datasets carry (id, text) columns."""
    q = prepare_side(queries, cfg, weights_ref, vocab_ref, meta, query_id, query_text)
    c = prepare_side(candidates, cfg, weights_ref, vocab_ref, meta, cand_id, cand_text)

    def tag(role):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column("role", pa.array([role] * len(batch)))
        return fn

    both = q.map_batches(tag("q"), batch_format="pyarrow").union(
        c.map_batches(tag("c"), batch_format="pyarrow")
    )
    keyed = both.map_batches(
        _KeyAndCarry(cfg), batch_format="pyarrow"
    )
    pairs = blocked_pairs(keyed, cfg)
    if cfg.ranking.ranking_metric == "conf" or cfg.ranking.calc_predict:
        # D1 dedup before the model pass: a pair surfaces once per shared
        # block key with identical distances — scoring each copy would
        # multiply the siamese forward cost by the key multiplicity
        pairs = dedup_pairs(pairs, cfg.execution.shuffle_partitions)
        pairs = _with_pred(pairs, cfg, weights_ref, vocab_ref, meta)
    else:
        pairs = _ensure_pred_col(pairs)
    return rank_pairs(pairs, cfg)


def salt_hot_blocks(
    keyed: ray.data.Dataset, cfg: EngineConfig, id_col: str = "id",
) -> ray.data.Dataset:
    """Skew-aware repartitioning of hot self-join blocks (SURVEY §4).

    A block of n > max_block_size members is tile-decomposed: members
    hash into s = ceil(n / ceil(max_block_size/2)) groups — the 2×
    headroom keeps every crc32-uniform group under max_block_size with
    overwhelming probability (expected group size ≤ cap/2; P(group >
    2×mean) is Chernoff-negligible for cap ≥ 64) — and each member is
    re-emitted once per tile it participates in (key "k␟tile:a-b",
    role q for the lower group, c for the upper), so every unordered
    within-block pair is produced by exactly one tile. Tiles are exempt
    from score_block_bucket's size caps (they are already bounded here),
    making the every-pair-exactly-once guarantee unconditional. Blocks
    needing more than ``salt_max_tiles`` groups are dropped (their key
    carries no signal at that frequency) and remain visible in the
    block-size histogram (stages/blocking.block_stats).

    Hot-key detection uses per-batch partial counts (one row per
    distinct key per batch) before the groupby — the detection shuffle
    carries O(distinct keys × batches), never a second full pass over
    the keyed payload.
    """
    import math
    import zlib

    from ray.data.aggregate import Sum

    cap = cfg.blocking.max_block_size

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["block_key"].value_counts()
        return pd.DataFrame({"block_key": vc.index.to_numpy(), "n": vc.to_numpy()})

    partials = keyed.select_columns(["block_key"]).map_batches(
        partial_counts, batch_format="pandas"
    )
    if keyed.count() <= cfg.blocking.driver_census_limit:
        # small input: summing the per-batch partials on the driver is a
        # single map pass; the distributed groupby's fixed shuffle
        # overhead (~10 s) would dwarf the work (callers pass keyed
        # MATERIALIZED, so count() here is free)
        from collections import Counter

        tot: Counter = Counter()
        for r in partials.take_all():
            tot[r["block_key"]] += int(r["n"])
        hot_rows = [{"block_key": k, "n": v} for k, v in tot.items() if v > cap]
    else:
        sizes = partials.groupby("block_key").aggregate(Sum("n", alias_name="n"))
        hot_rows = sizes.filter(expr=f"n > {cap}").take_all()
    if not hot_rows:
        return keyed
    max_tiles = cfg.blocking.salt_max_tiles
    target = max(1, cap // 2)
    hot = {
        r["block_key"]: math.ceil(r["n"] / target)
        for r in hot_rows
        if math.ceil(r["n"] / target) <= max_tiles
    }
    hot_ref = ray.put(hot)
    dropped = {r["block_key"] for r in hot_rows} - set(hot)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        hot_map = ray.get(hot_ref)
        keys = df["block_key"].to_numpy()
        is_hot = np.array([k in hot_map for k in keys])
        cold = df[~is_hot].copy()
        cold["role"] = "q"
        out = [cold[~cold["block_key"].isin(dropped)]] if dropped else [cold]
        hdf = df[is_hot]
        if len(hdf):
            ids = hdf[id_col].astype(str).to_numpy()
            hkeys = hdf["block_key"].to_numpy()
            s_per = np.array([hot_map[k] for k in hkeys], dtype=np.int64)
            g_per = np.array(
                [zlib.crc32(x.encode()) % s for x, s in zip(ids, s_per)],
                dtype=np.int64,
            )
            rep = np.repeat(np.arange(len(hdf)), s_per)
            o_vals = np.concatenate([np.arange(s) for s in s_per])
            g_rep = g_per[rep]
            a = np.minimum(g_rep, o_vals)
            b = np.maximum(g_rep, o_vals)
            new_keys = [f"{k}\x1ftile:{x}-{y}"
                        for k, x, y in zip(hkeys[rep], a, b)]
            roles = np.where(g_rep == a, "q", "c")
            exploded = hdf.iloc[rep].copy()
            exploded["block_key"] = new_keys
            exploded["role"] = roles
            out.append(exploded)
        return pd.concat(out) if out else df.iloc[:0]

    return keyed.map_batches(explode, batch_format="pandas")


def blocked_pairs(
    keyed: ray.data.Dataset, cfg: EngineConfig, self_join: bool = False,
    keep_per_query: int | None = None,
) -> ray.data.Dataset:
    """keyed (block_key + payload) rows → scored within-block pairs.

    Hash-buckets block keys (bounded map_groups invocations, vectorized
    bucket scoring) and repartitions before the groupby so the sort
    shuffle parallelizes regardless of upstream block count. Self-join
    inputs get hot blocks tile-salted first (salt_hot_blocks).

    ``keyed`` is materialized first when salting is on: the hot-key
    census, the salted re-emit and the pair groupby would otherwise each
    RE-EXECUTE the lazy upstream (including the embedding actor pool —
    observed 3× the flagship's embed cost). Materialize pins blocks to
    the (spill-backed) object store — the right trade even at scale,
    since the alternative is recomputing the most expensive stage."""
    if self_join and cfg.blocking.salt_hot_blocks:
        keyed = salt_hot_blocks(keyed.materialize(), cfg)
    P = cfg.execution.shuffle_partitions
    b = bucketize(keyed, ["block_key"], P).repartition(P)
    return b.groupby("__bucket").map_groups(
        functools.partial(score_block_bucket, cfg=cfg, self_join=self_join,
                          keep_per_query=keep_per_query),
        batch_format="pandas",
    )


def rank_pairs(pairs: ray.data.Dataset, cfg: EngineConfig) -> ray.data.Dataset:
    """Final per-query dedup + threshold + top-k + rank over scored
    pairs (bucketed by query hash; see bucketize)."""
    P = cfg.execution.shuffle_partitions
    b = bucketize(pairs, ["query_id"], P).repartition(P)
    return b.groupby("__bucket").map_groups(
        functools.partial(select_bucket, cfg=cfg), batch_format="pandas"
    )


class _KeyAndCarry:
    """Explode each prepared row to (block_key, id, orig, norm_text, emb,
    emb_valid, role) rows — key derivation + payload carry in one
    vectorized step."""

    def __init__(self, cfg: EngineConfig):
        self.derive = DeriveBlockKeys(
            text_col="norm_text", id_col="id", qgram=cfg.blocking.qgram,
            use_phonetic=cfg.blocking.use_phonetic,
            preprocessing=cfg.preprocessing.__class__(
                uni2ascii=False, lowercase=False, strip=False,
                only_latin_letters=False,
            ),  # text is already normalized
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = self.derive(batch)  # (id, block_key) distinct
        # gather keys back to this batch's rows with an Arrow kernel (the
        # round-1 Python dict + per-row comprehension was the last row
        # loop in the hot blocking path). index_in resolves a duplicated
        # id to its FIRST row in the batch — prepare_side emits one row
        # per input row, so duplicate ids (duplicate input rows) carry
        # identical payloads here and first-occurrence is exact; an input
        # with the SAME id on DIFFERENT payloads is out of contract.
        take = pc.index_in(keys["id"], value_set=batch["id"].combine_chunks())
        carried = batch.take(take)
        return carried.append_column("block_key", keys["block_key"])


def rank_global(
    queries: ray.data.Dataset,
    candidates: ray.data.Dataset,
    cfg: EngineConfig,
    weights_ref,
    vocab_ref,
    meta: dict,
    query_id="id", query_text="name", cand_id="id", cand_text="name",
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Global exact ranking: broadcast candidates once, stream queries.

    Refuses LOUDLY past ``broadcast_limit`` candidate rows — the
    driver-side concat + broadcast would OOM long before producing
    wrong results; ``rank_blocked`` is the no-broadcast scale path.

    NOTE (behavior since round 3): the default limit is 2,000,000 rows.
    Callers whose candidate sets exceed it but fit in the object store
    can raise ``broadcast_limit`` explicitly — the guard is a default,
    not a hard cap (same contract as ``embedding_near_dup`` /
    ``embedding_near_dup_incremental``)."""
    c = prepare_side(candidates, cfg, weights_ref, vocab_ref, meta, cand_id, cand_text)
    # global mode materializes the candidate payload ONCE on the driver and
    # broadcasts it (ray.put) — valid while candidates fit in the object
    # store; beyond that use rank_blocked
    batches = []
    n_rows = 0
    for b in c.iter_batches(batch_format="pyarrow"):
        n_rows += b.num_rows
        if n_rows > broadcast_limit:
            # abort DURING the single driver pass, before the concat +
            # broadcast can OOM (no extra pipeline consumption for the check)
            raise ValueError(
                f"rank_global materializes every candidate on the driver "
                f"and broadcasts them (>{broadcast_limit} rows seen); use "
                "rank_blocked for candidate sets past the object-store bound"
            )
        batches.append(b)
    ctab = pa.concat_tables(batches)
    cand_emb = emb_matrix(ctab["emb"])
    valid = np.asarray(ctab["emb_valid"].to_pylist())
    cand_emb = cand_emb[valid]
    cand_ids = np.asarray(ctab["id"].to_pylist(), dtype=object)[valid]
    cand_orig = np.asarray(ctab["orig"].to_pylist(), dtype=object)[valid]
    cand_norm_len = np.asarray(
        [len(s) for s in ctab["norm_text"].to_pylist()], dtype=np.int64
    )[valid]
    payload_ref = ray.put((cand_emb, cand_ids, cand_orig, cand_norm_len))

    q = prepare_side(queries, cfg, weights_ref, vocab_ref, meta, query_id, query_text)
    pairs = q.map_batches(
        _GlobalTopK,
        fn_constructor_kwargs=dict(payload_ref=payload_ref, cfg=cfg),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=cfg.execution.score_concurrency,
    )
    if cfg.ranking.ranking_metric == "conf" or cfg.ranking.calc_predict:
        pairs = _with_pred(pairs, cfg, weights_ref, vocab_ref, meta)
    else:
        pairs = _ensure_pred_col(pairs)
    return rank_pairs(pairs, cfg)


class _GlobalTopK:
    """Actor: holds the broadcast candidate matrix; per query batch
    computes exact distances in candidate chunks and keeps the per-query
    fixpoint set (threshold + top-k)."""

    _CHUNK = 65536

    def __init__(self, payload_ref, cfg: EngineConfig):
        self.c_emb, self.c_ids, self.c_orig, self.c_len = ray.get(payload_ref)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = self.cfg.ranking
        q_emb = emb_matrix(batch["emb"])
        q_valid = np.asarray(batch["emb_valid"].to_pylist())
        q_ids = batch["id"].to_pylist()
        q_orig = batch["orig"].to_pylist()
        q_len = np.asarray([len(s) for s in batch["norm_text"].to_pylist()])
        want_cos = r.calc_cosine or r.ranking_metric == "cosine"
        rows = {k: [] for k in ["query_id", "query", "candidate_id", "candidate",
                                 "faiss_dist", "cosine_dist"]}
        N = len(self.c_emb)
        for qs in range(0, len(q_emb), 64):
            qe = min(qs + 64, len(q_emb))
            Q = q_emb[qs:qe]
            best = [([], [], []) for _ in range(qe - qs)]  # per query: idx, faiss, cos
            Q64 = Q.astype(np.float64)
            for cs in range(0, N, self._CHUNK):
                C = self.c_emb[cs : cs + self._CHUNK].astype(np.float64)
                qc = Q64 @ C.T
                d2 = (
                    (Q64 * Q64).sum(axis=1)[:, None]
                    + (C * C).sum(axis=1)[None, :]
                    - 2.0 * qc
                )
                np.maximum(d2, 0.0, out=d2)
                d2 = d2.astype(np.float32)
                if want_cos:
                    qn = np.linalg.norm(Q64, axis=1)[:, None]
                    cn = np.linalg.norm(C, axis=1)[None, :]
                    cosd = (1.0 - qc / np.maximum(qn * cn, 1e-10)).astype(np.float32)
                else:
                    cosd = None
                metric = d2 if r.ranking_metric != "cosine" else cosd
                for i in range(qe - qs):
                    if not q_valid[qs + i]:
                        continue
                    mrow = metric[i]
                    if r.ranking_metric in ("faiss", "cosine"):
                        sel = np.flatnonzero(mrow <= r.selection_threshold)
                    else:
                        sel = np.arange(len(mrow))
                    if r.length_diff is not None:
                        sel = sel[np.abs(self.c_len[cs : cs + self._CHUNK][sel] - q_len[qs + i]) <= r.length_diff]
                    best[i][0].append(sel + cs)
                    best[i][1].append(d2[i][sel])
                    best[i][2].append(cosd[i][sel] if cosd is not None else np.full(len(sel), np.nan, np.float32))
            for i in range(qe - qs):
                idx = np.concatenate(best[i][0]) if best[i][0] else np.array([], dtype=np.int64)
                if len(idx) == 0:
                    continue
                fd = np.concatenate(best[i][1])
                cd = np.concatenate(best[i][2])
                rows["query_id"] += [q_ids[qs + i]] * len(idx)
                rows["query"] += [q_orig[qs + i]] * len(idx)
                rows["candidate_id"] += list(self.c_ids[idx])
                rows["candidate"] += list(self.c_orig[idx])
                rows["faiss_dist"] += list(fd)
                rows["cosine_dist"] += list(cd)
        return pa.table({
            "query_id": pa.array(rows["query_id"], type=pa.string()),
            "query": pa.array(rows["query"], type=pa.string()),
            "candidate_id": pa.array(rows["candidate_id"], type=pa.string()),
            "candidate": pa.array(rows["candidate"], type=pa.string()),
            "faiss_dist": pa.array(np.array(rows["faiss_dist"], dtype=np.float32)),
            "cosine_dist": pa.array(np.array(rows["cosine_dist"], dtype=np.float32)),
        })
