"""Temporal joins Ray Data lacks natively.

``asof_join_latest``: for every left row, the greatest right-side
timestamp at-or-before (or strictly before) the left row's timestamp
within the same key — the classic AS-OF join. The reference engine has
no temporal joins (it is a string-matching pipeline); this is part of
the engine's own large-scale-pipeline surface, verified value-exact
against DuckDB's native ``ASOF JOIN``.

Physical plan: both sides union into one keyed stream (right projected
to (key, ts), left columns null-padded on the right rows), hash-bucketed
by key, and each key group resolves all its left rows with ONE sorted
``searchsorted`` pass — no per-row loop, no window materialization. The
shuffle carries each row exactly once; skewed keys are bounded by the
bucket count like every other bucketized groupby in this repo.

Determinism note: only the matched right-side TIMESTAMP (and values
derived from it) is emitted. Emitting arbitrary right-side payload
columns would be nondeterministic when several right rows tie on the
as-of timestamp — the same reason DuckDB's ASOF JOIN result is
undefined beyond the timestamp on ties.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def asof_join_latest(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts_col: str,
    out_col: str = "asof_ts",
    strict: bool = True,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Left rows + ``out_col`` = latest right ``ts_col`` before the left
    row's (strictly when ``strict``), NaT when the key has no earlier
    right row. Right side needs only (key, ts_col)."""
    from deezymatch_ray.stages.ranking import bucketize

    lsch = left.schema()
    lcols = list(lsch.names)
    ltypes = dict(zip(lsch.names, lsch.types))

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in lcols}
        cols["__side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            if c == key:
                cols[c] = b[key].cast(ltypes[key])
            elif c == ts_col:
                cols[c] = b[ts_col].cast(ltypes[ts_col])
            else:
                cols[c] = pa.nulls(b.num_rows, ltypes[c])
        cols["__side"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns([key, ts_col]).map_batches(
            tag_right, batch_format="pyarrow"
        )
    )

    side = "left" if strict else "right"

    # The null-padded right rows make pandas widen int columns to float64
    # when the Arrow block converts for map_groups; carried left columns
    # must be cast back to the LEFT schema's dtypes on emit or the output
    # silently changes type (and corrupts int ids above 2**53).
    pd_dtypes = (
        pa.table({c: pa.array([], type=ltypes[c]) for c in lcols})
        .to_pandas()
        .dtypes.to_dict()
    )

    def _restore_dtypes(df: pd.DataFrame) -> pd.DataFrame:
        bad = {}
        for c in lcols:
            if df[c].dtype == pd_dtypes[c]:
                continue
            want = pd_dtypes[c]
            # a left column that itself contains nulls can't go back to
            # a plain int dtype (IntCastingNaNError); use the pandas
            # nullable Int<bits> — Arrow still emits the original int64/
            # int32 type for it, so the output schema stays identical
            if pd.api.types.is_integer_dtype(want) and df[c].isna().any():
                kind = "UInt" if np.dtype(want).kind == "u" else "Int"
                want = pd.api.types.pandas_dtype(
                    f"{kind}{np.dtype(want).itemsize * 8}"
                )
            bad[c] = want
        return df.astype(bad) if bad else df

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket holds MANY keys: resolve per key (vectorized
        searchsorted within each key's rows; Python cost is O(#keys))."""
        lmask = df["__side"] == 1
        l = df[lmask]
        r = df[~lmask]
        nat = np.datetime64("NaT", "us")
        if len(l) == 0:
            return _restore_dtypes(l.drop(columns="__side")).assign(
                **{out_col: np.array([], dtype="datetime64[us]")}
            )
        rmap = {k: np.sort(g[ts_col].to_numpy()) for k, g in r.groupby(key, sort=False)}
        parts = []
        for k, g in l.groupby(key, sort=False):
            rts = rmap.get(k)
            lts = g[ts_col].to_numpy()
            if rts is None or len(rts) == 0:
                vals = np.full(len(g), nat)
            else:
                idx = np.searchsorted(rts, lts, side=side) - 1
                vals = np.where(idx >= 0, rts[np.maximum(idx, 0)], nat)
            parts.append(g.drop(columns="__side").assign(**{out_col: vals}))
        return _restore_dtypes(pd.concat(parts, ignore_index=True))

    return bucketize(unioned, [key], num_partitions).groupby(
        "__bucket"
    ).map_groups(
        lambda df: resolve(df.drop(columns=["__bucket"])),
        batch_format="pandas",
    )
