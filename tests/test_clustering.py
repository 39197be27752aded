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


def test_non_convergence_raises_instead_of_splitting():
    n = 64
    ids = [f"c{i:04d}" for i in range(n)]
    pairs = [(ids[i], ids[i + 1]) for i in range(n - 1)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_distributed(
            _edges_ds(pairs), max_rounds=1, num_partitions=8
        )
