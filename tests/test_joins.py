"""AS-OF join stage vs brute force: strict/non-strict boundaries,
timestamp ties, keys with no right rows, and many keys per bucket."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from deezymatch_ray.stages.joins import asof_join_latest


def _dt(s: str) -> np.datetime64:
    return np.datetime64(s, "us")


def test_asof_join_latest_matches_bruteforce():
    rng = np.random.default_rng(3)
    keys = [f"u{i}" for i in range(20)]
    base = np.datetime64("2024-01-01T00:00:00", "us")
    left_rows = []
    right_rows = []
    for i in range(400):
        left_rows.append((i, keys[int(rng.integers(0, 20))],
                          base + np.timedelta64(int(rng.integers(0, 10**6)), "s")))
    for _ in range(150):
        right_rows.append((keys[int(rng.integers(0, 15))],  # u15..u19 have NO rights
                           base + np.timedelta64(int(rng.integers(0, 10**6)), "s")))
    # deliberate tie: one left exactly at a right timestamp
    right_rows.append(("u0", left_rows[0][2]))

    left = ray.data.from_arrow(pa.table({
        "event_id": [r[0] for r in left_rows],
        "k": [r[1] for r in left_rows],
        "ts": pa.array([r[2].astype("datetime64[us]").item() for r in left_rows],
                       type=pa.timestamp("us")),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": [r[0] for r in right_rows],
        "ts": pa.array([r[1].astype("datetime64[us]").item() for r in right_rows],
                       type=pa.timestamp("us")),
    }))

    for strict in (True, False):
        got = asof_join_latest(left, right, key="k", ts_col="ts",
                               strict=strict, num_partitions=8).to_pandas()
        # carried left columns keep their input dtypes: the null-padded
        # union must not leak pandas' int64->float64 widening
        assert got["event_id"].dtype == np.int64, got.dtypes
        assert got["k"].dtype == object
        got = got.sort_values("event_id").reset_index(drop=True)
        rmap: dict[str, list] = {}
        for k, ts in right_rows:
            rmap.setdefault(k, []).append(ts)
        want = []
        for i, k, ts in left_rows:
            cands = [t for t in rmap.get(k, [])
                     if (t < ts if strict else t <= ts)]
            want.append(max(cands) if cands else None)
        for i in range(len(left_rows)):
            g = got.loc[i, "asof_ts"]
            w = want[i]
            if w is None:
                assert pd.isna(g), (strict, i)
            else:
                assert pd.Timestamp(g) == pd.Timestamp(w.astype("datetime64[us]").item()), (strict, i)
    # the tie row: strict skips the equal-ts right, non-strict takes it
    assert len(got) == 400
