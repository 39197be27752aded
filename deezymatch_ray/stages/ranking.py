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
  search; usable while candidates fit in the object store.
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
    return out.map_batches(
        Embedder,
        fn_constructor_kwargs=dict(
            weights_ref=weights_ref, vocab_ref=vocab_ref, meta=meta,
            text_col="norm_text", preprocessing=cfg.preprocessing,
            tokenization=cfg.tokenization,
        ),
        batch_format="pyarrow",
        batch_size=cfg.execution.score_batch_size,
        concurrency=cfg.execution.score_concurrency,
    )


def _pair_scores(q_emb: np.ndarray, c_emb: np.ndarray, want_cosine: bool):
    """Squared-L2 (faiss convention) and cosine distances.

    Computed in float64 and cast to float32 so every physical plan
    (per-block, global matmul, driver oracle) produces bit-identical
    distances — required for reproducible tie-breaking/thresholding."""
    q = q_emb.astype(np.float64)
    c = c_emb.astype(np.float64)
    d = q - c
    faiss_d = (d * d).sum(axis=1)
    cos_d = np.full(len(q_emb), np.nan, dtype=np.float64)
    if want_cosine:
        num = (q * c).sum(axis=1)
        den = np.maximum(
            np.linalg.norm(q, axis=1) * np.linalg.norm(c, axis=1), 1e-10
        )
        cos_d = 1.0 - num / den
    return faiss_d.astype(np.float32), cos_d.astype(np.float32)


def per_block_score(group: pd.DataFrame, *, cfg: EngineConfig,
                    self_join: bool = False,
                    keep_per_query: int | None = None) -> pd.DataFrame:
    """map_groups fn over block_key groups of the unioned sides.

    Emits (query_id, query, candidate_id, candidate, faiss_dist,
    cosine_dist) for within-block query×candidate pairs; when the
    metric is distance-based, pairs over the selection threshold are
    dropped here (they can never enter the final result — monotone
    filter), bounding what the final shuffle carries. Used via
    ``functools.partial`` (map_groups requires a plain function).
    """
    if True:
        r = cfg.ranking
        keep = keep_per_query or cfg.ranking.num_candidates
        if self_join:
            qdf = cdf = group
        else:
            qdf = group[group["role"] == "q"]
            cdf = group[group["role"] == "c"]
        nq, nc = len(qdf), len(cdf)
        empty = pd.DataFrame({c: [] for c in [
            "query_id", "query", "candidate_id", "candidate",
            "faiss_dist", "cosine_dist"]})
        if nq == 0 or nc == 0:
            return empty
        if (
            max(nq, nc) > cfg.blocking.max_block_size
            or nq * nc > cfg.blocking.max_pairs_per_block
        ):
            # oversized block: a key this common carries no discriminative
            # signal and would cost O(n²) — skip, per the documented skew
            # policy (stages/blocking.py); surfaced via block_stats
            return empty
        q_emb = np.stack(qdf["emb"].to_numpy()).astype(np.float32)
        c_emb = np.stack(cdf["emb"].to_numpy()).astype(np.float32)
        qi, ci = np.repeat(np.arange(nq), nc), np.tile(np.arange(nc), nq)
        if self_join:
            m_lower = qi < ci  # unordered pairs once
            qi, ci = qi[m_lower], ci[m_lower]
        valid = qdf["emb_valid"].to_numpy()[qi] & cdf["emb_valid"].to_numpy()[ci]
        qi, ci = qi[valid], ci[valid]
        if len(qi) == 0:
            return empty
        want_cos = r.calc_cosine or r.ranking_metric == "cosine"
        faiss_d, cos_d = _pair_scores(q_emb[qi], c_emb[ci], want_cos)
        if r.length_diff is not None:
            l1 = qdf["norm_text"].str.len().to_numpy()[qi]
            l2 = cdf["norm_text"].str.len().to_numpy()[ci]
            m = np.abs(l1 - l2) <= r.length_diff
            qi, ci, faiss_d, cos_d = qi[m], ci[m], faiss_d[m], cos_d[m]
        if r.ranking_metric in ("faiss", "cosine"):
            metric = faiss_d if r.ranking_metric == "faiss" else cos_d
            m = metric <= r.selection_threshold
            qi, ci, faiss_d, cos_d = qi[m], ci[m], faiss_d[m], cos_d[m]
        out = pd.DataFrame(
            {
                "query_id": qdf["id"].to_numpy()[qi],
                "query": qdf["orig"].to_numpy()[qi],
                "candidate_id": cdf["id"].to_numpy()[ci],
                "candidate": cdf["orig"].to_numpy()[ci],
                "faiss_dist": faiss_d,
                "cosine_dist": cos_d,
            }
        )
        if r.ranking_metric in ("faiss", "cosine") and len(out) > 0:
            # per-block pre-top-k: global top-k ⊆ union of per-block top-k
            mcol = _metric_column(r.ranking_metric)
            out = (
                out.sort_values([mcol, "candidate_id"], kind="stable")
                .groupby("query_id", sort=False)
                .head(keep)
            )
        return out


def select_per_query(group: pd.DataFrame, *, cfg: EngineConfig) -> pd.DataFrame:
    """Final per-query selection (groupby(query_id).map_groups): dedup
    keep-lowest-metric-first (candidateRanker.py:483-492), threshold on
    the ranking metric, stable sort, truncate, assign rank."""
    if True:
        r = cfg.ranking
        mcol = _metric_column(r.ranking_metric)
        asc = r.ranking_metric != "conf"
        g = group.sort_values([mcol, "candidate_id"], ascending=[asc, True],
                              kind="stable")
        g = g.drop_duplicates(subset=["candidate_id"], keep="first")
        if r.ranking_metric == "conf":
            g = g[g["pred_score"] >= r.selection_threshold]
        else:
            g = g[g[mcol] <= r.selection_threshold]
        g = g.head(r.num_candidates).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[[c for c in RANK_SCHEMA_COLS if c in g.columns]]


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
    pairs = keyed.groupby("block_key").map_groups(
        functools.partial(per_block_score, cfg=cfg), batch_format="pandas"
    )
    if cfg.ranking.ranking_metric == "conf" or cfg.ranking.calc_predict:
        pairs = _with_pred(pairs, cfg, weights_ref, vocab_ref, meta)
    else:
        pairs = _ensure_pred_col(pairs)
    return pairs.groupby("query_id").map_groups(
        functools.partial(select_per_query, cfg=cfg), batch_format="pandas"
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
        keys = self.derive(batch)  # (id, block_key) distinct
        # join keys back to the full rows of this batch (small, in-memory)
        idx = {v: i for i, v in enumerate(batch["id"].to_pylist())}
        take = pa.array([idx[v] for v in keys["id"].to_pylist()], type=pa.int64())
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
) -> ray.data.Dataset:
    """Global exact ranking: broadcast candidates once, stream queries."""
    c = prepare_side(candidates, cfg, weights_ref, vocab_ref, meta, cand_id, cand_text)
    # global mode materializes the candidate payload ONCE on the driver and
    # broadcasts it (ray.put) — valid while candidates fit in the object
    # store; beyond that use rank_blocked
    ctab = pa.concat_tables(c.iter_batches(batch_format="pyarrow"))
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
    return pairs.groupby("query_id").map_groups(
        functools.partial(select_per_query, cfg=cfg), batch_format="pandas"
    )


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
