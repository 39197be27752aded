"""Distributed ranking plans vs the reference-faithful brute-force
oracle, plus the ported reference invariants (FIXTURES.md F7)."""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from deezymatch_ray.config import DEFAULT_CONFIG
from deezymatch_ray.data.synth import make_query_candidates
from deezymatch_ray.model.chargru import CharGRU
from deezymatch_ray.model.vocab import load_vocab
from deezymatch_ray.pipelines.linkage import load_model_artifacts, train_model
from deezymatch_ray.pipelines.oracle import oracle_rank
from deezymatch_ray.stages.ranking import rank_blocked, rank_global


@pytest.fixture(scope="session")
def model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("model"))
    train_model(d, n_pairs=1000, epochs=8, embedding_dim=24, hidden_dim=24)
    return d


@pytest.fixture(scope="session")
def qc_tables():
    q, c = make_query_candidates(30, 40, seed=42)
    queries = [(f"q-{i:03d}", n) for i, n in enumerate(q["name"].to_pylist())]
    cands = [(f"c-{i:03d}", n) for i, n in enumerate(c["name"].to_pylist())]
    return queries, cands


def _to_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "id": pa.array([i for i, _ in pairs], type=pa.string()),
        "name": pa.array([n for _, n in pairs], type=pa.string()),
    }))


def _cfg(model_dir, **ranking_kw):
    _, _, meta, cfg = load_model_artifacts(model_dir)
    thr = meta["suggested_faiss_threshold"]
    ranking_kw.setdefault("selection_threshold", thr)
    return cfg.replace(ranking=dataclasses.replace(cfg.ranking, **ranking_kw)), meta


def _run(plan, queries, cands, cfg, model_dir, meta):
    weights_ref, vocab_ref, _, _ = load_model_artifacts(model_dir)
    ds = plan(_to_ds(queries), _to_ds(cands), cfg, weights_ref, vocab_ref, meta)
    df = ds.to_pandas()
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _oracle(queries, cands, cfg, model_dir, restrict=False):
    from deezymatch_ray.model.chargru import load_weights

    weights, meta = load_weights(os.path.join(model_dir, "model.npz"))
    model = CharGRU(weights, num_layers=meta["num_layers"],
                    pooling_mode=meta["pooling_mode"])
    tok2index = load_vocab(os.path.join(model_dir, "vocab.parquet"))
    df = oracle_rank(queries, cands, model, tok2index, cfg,
                     restrict_to_shared_block=restrict)
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def test_global_plan_matches_oracle_exactly(model_dir, qc_tables):
    queries, cands = qc_tables
    cfg, meta = _cfg(model_dir)
    got = _run(rank_global, queries, cands, cfg, model_dir, meta)
    want = _oracle(queries, cands, cfg, model_dir, restrict=False)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "candidate_id"]],
        want[["query_id", "rank", "candidate_id"]],
    )
    np.testing.assert_allclose(got["faiss_dist"], want["faiss_dist"], atol=1e-6)


def test_blocked_plan_matches_blocked_oracle(model_dir, qc_tables):
    """The F1 gate: on pairs sharing a blocking key, the blocked plan
    must reproduce the oracle ranker (target pairwise F1 ≥ 0.99; exact
    match expected)."""
    queries, cands = qc_tables
    cfg, meta = _cfg(model_dir)
    got = _run(rank_blocked, queries, cands, cfg, model_dir, meta)
    want = _oracle(queries, cands, cfg, model_dir, restrict=True)
    got_pairs = set(zip(got["query_id"], got["candidate_id"]))
    want_pairs = set(zip(want["query_id"], want["candidate_id"]))
    tp = len(got_pairs & want_pairs)
    prec = tp / max(len(got_pairs), 1)
    rec = tp / max(len(want_pairs), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    assert f1 >= 0.99, (f1, got_pairs ^ want_pairs)
    # distances and ranks agree on the intersection
    merged = got.merge(want, on=["query_id", "candidate_id"], suffixes=("_g", "_o"))
    np.testing.assert_allclose(merged["faiss_dist_g"], merged["faiss_dist_o"], atol=1e-6)
    assert (merged["rank_g"] == merged["rank_o"]).all()


def test_self_match_distance_zero(model_dir, qc_tables):
    """Port of tests/test_pipeline_ngram.py:102-105: when queries ==
    candidates each query retrieves itself at faiss distance ≈ 0."""
    _, cands = qc_tables
    cfg, meta = _cfg(model_dir)
    got = _run(rank_global, cands, cands, cfg, model_dir, meta)
    top = got[got["rank"] == 1].set_index("query_id")
    for cid, name in cands:
        assert top.loc[cid, "candidate_id"] == cid
        assert top.loc[cid, "faiss_dist"] < 1e-6


def test_calc_predict_does_not_change_distances(model_dir, qc_tables):
    """Port of tests/test_pipeline_one_col_input.py:156-170."""
    queries, cands = qc_tables
    cfg0, meta = _cfg(model_dir, calc_predict=False)
    cfg1, _ = _cfg(model_dir, calc_predict=True)
    a = _run(rank_global, queries, cands, cfg0, model_dir, meta)
    b = _run(rank_global, queries, cands, cfg1, model_dir, meta)
    pd.testing.assert_frame_equal(
        a[["query_id", "rank", "candidate_id", "faiss_dist"]],
        b[["query_id", "rank", "candidate_id", "faiss_dist"]],
    )
    assert b["pred_score"].notna().all()
    assert a["pred_score"].isna().all()


def test_length_diff_postcondition(model_dir, qc_tables):
    """Port of tests/test_pipeline_one_col_input.py:177-199: with
    length_diff=2 every output pair differs by ≤ 2 NFKD chars."""
    from deezymatch_ray.functions.text import normalize_string

    queries, cands = qc_tables
    cfg, meta = _cfg(model_dir, length_diff=2, selection_threshold=1e9)
    got = _run(rank_global, queries, cands, cfg, model_dir, meta)
    assert len(got) > 0
    for _, row in got.iterrows():
        lq = len(normalize_string(row["query"]))
        lc = len(normalize_string(row["candidate"]))
        assert abs(lq - lc) <= 2


def test_cosine_metric_mode(model_dir, qc_tables):
    queries, cands = qc_tables
    cfg, meta = _cfg(model_dir, ranking_metric="cosine", selection_threshold=0.5)
    got = _run(rank_global, queries, cands, cfg, model_dir, meta)
    want = _oracle(queries, cands, cfg, model_dir)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "candidate_id"]],
        want[["query_id", "rank", "candidate_id"]],
    )
    assert (got["cosine_dist"] <= 0.5 + 1e-9).all()


def test_conf_metric_mode(model_dir, qc_tables):
    queries, cands = qc_tables
    cfg, meta = _cfg(model_dir, ranking_metric="conf", selection_threshold=0.5)
    got = _run(rank_global, queries, cands, cfg, model_dir, meta)
    want = _oracle(queries, cands, cfg, model_dir)
    assert (got["pred_score"] >= 0.5).all()
    got_pairs = set(zip(got["query_id"], got["candidate_id"]))
    want_pairs = set(zip(want["query_id"], want["candidate_id"]))
    assert got_pairs == want_pairs


def test_salted_hot_block_produces_exact_pair_set():
    """Tile-salting must yield every unordered within-block pair exactly
    once — identical to the unsalted computation with a raised cap."""
    import dataclasses

    import pyarrow as pa

    from deezymatch_ray.stages.ranking import blocked_pairs

    n = 30
    rng = np.random.default_rng(3)
    emb = rng.standard_normal((n, 4)).astype(np.float32)
    keyed = ray.data.from_arrow(pa.table({
        "block_key": pa.array(["hot"] * n),
        "id": pa.array([f"d{i:03d}" for i in range(n)]),
        "orig": pa.array([f"name{i}" for i in range(n)]),
        "norm_text": pa.array([f"name{i}" for i in range(n)]),
        "emb": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 4),
        "emb_valid": pa.array([True] * n),
    }))
    base = DEFAULT_CONFIG.replace(
        ranking=dataclasses.replace(
            DEFAULT_CONFIG.ranking, selection_threshold=1e9,
            num_candidates=10**6),
    )
    cfg_salt = base.replace(
        blocking=dataclasses.replace(base.blocking, max_block_size=8,
                                     salt_hot_blocks=True))
    cfg_plain = base.replace(
        blocking=dataclasses.replace(base.blocking, max_block_size=10_000,
                                     salt_hot_blocks=False))
    got = blocked_pairs(keyed, cfg_salt, self_join=True).to_pandas()
    want = blocked_pairs(keyed, cfg_plain, self_join=True).to_pandas()
    key = lambda df: sorted(zip(df.query_id, df.candidate_id))
    assert len(got) == len(want) == n * (n - 1) // 2
    assert key(got) == key(want)
    assert not got.duplicated(subset=["query_id", "candidate_id"]).any()
    m = got.merge(want, on=["query_id", "candidate_id"], suffixes=("_s", "_p"))
    np.testing.assert_allclose(m["faiss_dist_s"], m["faiss_dist_p"], atol=1e-6)


def test_hot_block_beyond_salt_cap_is_dropped_not_wedged():
    import dataclasses

    import pyarrow as pa

    from deezymatch_ray.stages.ranking import blocked_pairs

    n = 40
    emb = np.zeros((n, 4), dtype=np.float32)
    keyed = ray.data.from_arrow(pa.table({
        "block_key": pa.array(["huge"] * n),
        "id": pa.array([f"d{i}" for i in range(n)]),
        "orig": pa.array(["x"] * n),
        "norm_text": pa.array(["x"] * n),
        "emb": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 4),
        "emb_valid": pa.array([True] * n),
    }))
    cfg = DEFAULT_CONFIG.replace(
        blocking=dataclasses.replace(DEFAULT_CONFIG.blocking,
                                     max_block_size=4, salt_max_tiles=2,
                                     salt_hot_blocks=True))
    assert blocked_pairs(keyed, cfg, self_join=True).count() == 0


def test_salted_tiles_survive_group_imbalance():
    """Regression (round-2 ADVICE): crc32 group assignment is uneven, so
    some tile group WILL exceed max_block_size for a large hot block.
    Salted tiles must be exempt from the size caps — every unordered
    pair still appears exactly once."""
    from deezymatch_ray.stages.ranking import blocked_pairs

    n = 200
    rng = np.random.default_rng(11)
    emb = rng.standard_normal((n, 4)).astype(np.float32)
    keyed = ray.data.from_arrow(pa.table({
        "block_key": pa.array(["hot"] * n),
        "id": pa.array([f"d{i:04d}" for i in range(n)]),
        "orig": pa.array([f"name{i}" for i in range(n)]),
        "norm_text": pa.array([f"name{i}" for i in range(n)]),
        "emb": pa.FixedSizeListArray.from_arrays(pa.array(emb.reshape(-1)), 4),
        "emb_valid": pa.array([True] * n),
    }))
    base = DEFAULT_CONFIG.replace(
        ranking=dataclasses.replace(
            DEFAULT_CONFIG.ranking, selection_threshold=1e9,
            num_candidates=10**6),
    )
    cfg = base.replace(
        blocking=dataclasses.replace(base.blocking, max_block_size=16,
                                     salt_max_tiles=64, salt_hot_blocks=True))
    got = blocked_pairs(keyed, cfg, self_join=True).to_pandas()
    assert len(got) == n * (n - 1) // 2
    assert not got.duplicated(subset=["query_id", "candidate_id"]).any()


def test_rank_global_broadcast_gate_raises(model_dir, qc_tables):
    """rank_global materializes + broadcasts the candidate payload;
    past broadcast_limit it must abort loudly and point at
    rank_blocked, not OOM the driver (round-3 VERDICT #6)."""
    queries, cands = qc_tables
    cfg, meta = _cfg(model_dir)
    weights_ref, vocab_ref, _, _ = load_model_artifacts(model_dir)
    with pytest.raises(ValueError, match="rank_blocked"):
        rank_global(_to_ds(queries), _to_ds(cands), cfg,
                    weights_ref, vocab_ref, meta, broadcast_limit=10)


def test_candidate_string_dedup_parity_mode(model_dir):
    """dedup_on='candidate_string' (reference parity,
    candidateRanker.py:483-492): duplicate candidate SPELLINGS under
    different ids collapse to the lowest-(metric, id) row; the default
    mode keeps one row per (query_id, candidate_id)."""
    queries = [("q-000", "alpha town"), ("q-001", "beta city")]
    # two ids share the spelling "alpha town"; a third is distinct
    cands = [("c-000", "alpha town"), ("c-001", "alpha town"),
             ("c-002", "alpha towne"), ("c-003", "beta city")]
    cfg, meta = _cfg(model_dir, selection_threshold=1e9, num_candidates=100)
    got_default = _run(rank_global, queries, cands, cfg, model_dir, meta)
    cfg_s = cfg.replace(
        ranking=dataclasses.replace(cfg.ranking, dedup_on="candidate_string"))
    got_parity = _run(rank_global, queries, cands, cfg_s, model_dir, meta)
    # default: every (query, candidate_id) pair survives
    assert len(got_default) == len(queries) * len(cands)
    # parity expectation derived from the default output: per query,
    # keep the first row per spelling under the (metric, id) order,
    # then re-rank contiguously
    exp = (
        got_default.sort_values(["query_id", "faiss_dist", "candidate_id"],
                                kind="stable")
        .drop_duplicates(subset=["query_id", "candidate"], keep="first")
        .reset_index(drop=True)
    )
    exp["rank"] = exp.groupby("query_id", sort=False).cumcount() + 1
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_parity[["query_id", "candidate_id", "candidate", "rank"]],
        exp[["query_id", "candidate_id", "candidate", "rank"]].astype(
            got_parity[["query_id", "candidate_id", "candidate", "rank"]].dtypes
        ),
    )
    # both ids spelled "alpha town" never co-survive in parity mode
    per_q = got_parity.groupby("query_id")["candidate"].nunique()
    assert (got_parity.groupby("query_id").size() == per_q).all()


def test_bucketize_hash_backend_version_guard():
    """r4 ADVICE (low) / r4 VERDICT #5: the hash backend is resolved
    once on the driver and shipped through the closure; a worker whose
    polars version differs must fail loudly (silently splitting hash
    buckets loses cross-bucket matches in every bucketized groupby)."""
    from deezymatch_ray.stages.ranking import (
        _hash_col_u64,
        _resolve_hash_backend,
        _stable_bucket,
    )

    col = pa.chunked_array([pa.array(["x", "y", "z"])])
    backend = _resolve_hash_backend()
    assert backend[0] == "polars"  # sandbox has polars
    ok = _hash_col_u64(col, backend)
    assert ok.dtype == np.uint64 and len(ok) == 3
    with pytest.raises(RuntimeError, match="mismatch.*polars"):
        _hash_col_u64(col, ("polars", "0.0.0-not-installed"))
    # pandas fallback still produces stable hashes without polars
    pd_hash = _hash_col_u64(col, ("pandas", None))
    np.testing.assert_array_equal(pd_hash, _hash_col_u64(col, ("pandas", None)))
    # the shipped decision makes buckets process-stable end to end
    t = pa.table({"k": ["x", "y", "z"]})
    np.testing.assert_array_equal(
        _stable_bucket(t, ["k"], 16, backend),
        _stable_bucket(t, ["k"], 16, backend),
    )
