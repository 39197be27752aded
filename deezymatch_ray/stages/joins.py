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
``searchsorted`` pass per key — no per-row loop, no window
materialization. The shuffle carries each row exactly once; skewed keys
are bounded by the bucket count like every other bucketized groupby in
this repo.

The resolve stage runs on **pyarrow** group blocks end-to-end: carried
left columns are sliced out of the Arrow table with ``filter`` and never
pass through pandas, so an int64 id column keeps full 64-bit precision
(a pandas ``map_groups`` would widen null-padded int columns to float64
during Arrow→pandas conversion and silently corrupt ids above 2**53 —
casting back afterwards cannot restore the lost mantissa bits).

Determinism note: only the matched right-side TIMESTAMP (and values
derived from it) is emitted. Emitting arbitrary right-side payload
columns would be nondeterministic when several right rows tie on the
as-of timestamp — the same reason DuckDB's ASOF JOIN result is
undefined beyond the timestamp on ties.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def _np_col(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Column → numpy, tolerating chunking and nulls (NaT for ts)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


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
    nat = np.datetime64("NaT", "us")

    def resolve(t: pa.Table) -> pa.Table:
        """One hash bucket holds MANY keys: resolve per key (vectorized
        searchsorted within each key's rows; Python cost is O(#keys)).
        Pure-Arrow row selection — left payload columns keep their exact
        dtypes and values (no pandas float64 round-trip). Null-key or
        null-timestamp left rows are emitted with NaT (a None key can't
        equal any right key; left-join semantics keep the row); null
        right rows are excluded before the sort — object arrays holding
        None would otherwise make lexsort/argsort raise."""
        import pyarrow.compute as pc

        sides = _np_col(t["__side"])
        lmask = sides == 1
        lt = t.filter(pa.array(lmask)).drop_columns(["__side"])
        n_left = lt.num_rows
        if n_left == 0:
            return lt.append_column(
                out_col, pa.array(np.array([], dtype="datetime64[us]"))
            )
        nulls_all = pc.fill_null(
            pc.or_(pc.is_null(t[key]), pc.is_null(t[ts_col])), True
        ).to_numpy(zero_copy_only=False)
        kcol = t[key]
        if kcol.null_count and (
            pa.types.is_integer(kcol.type) or pa.types.is_floating(kcol.type)
        ):
            # a null in a numeric key column would force to_numpy into
            # float64 for EVERY row, colliding distinct int64 keys above
            # 2**53; fill nulls (those rows are excluded from matching
            # by nulls_all anyway) so valid keys keep exact dtype
            kcol = pc.fill_null(kcol, pa.scalar(0).cast(kcol.type))
        keys_all = _np_col(kcol)
        ts_all = _np_col(t[ts_col])
        lkeys, lts = keys_all[lmask], ts_all[lmask]
        lnull = nulls_all[lmask]
        rkeep = ~lmask & ~nulls_all
        rkeys, rts = keys_all[rkeep], ts_all[rkeep]
        out = np.full(n_left, nat, dtype="datetime64[us]")
        lvalid = np.flatnonzero(~lnull)
        if len(rkeys) and len(lvalid):
            ro = np.lexsort((rts, rkeys))
            rkeys_s, rts_s = rkeys[ro], rts[ro]
            lorder = lvalid[np.argsort(lkeys[lvalid], kind="stable")]
            lkeys_s, lts_s = lkeys[lorder], lts[lorder]
            n_valid = len(lorder)
            starts = np.flatnonzero(
                np.r_[True, lkeys_s[1:] != lkeys_s[:-1]]
            )
            ends = np.r_[starts[1:], n_valid]
            for s, e in zip(starts, ends):
                a = np.searchsorted(rkeys_s, lkeys_s[s], side="left")
                b = np.searchsorted(rkeys_s, lkeys_s[s], side="right")
                if a == b:
                    continue
                seg = rts_s[a:b]
                idx = np.searchsorted(seg, lts_s[s:e], side=side) - 1
                out[lorder[s:e]] = np.where(
                    idx >= 0, seg[np.maximum(idx, 0)], nat
                )
        return lt.append_column(out_col, pa.array(out))

    return bucketize(unioned, [key], num_partitions).groupby(
        "__bucket"
    ).map_groups(
        lambda t: resolve(t.drop_columns(["__bucket"])),
        batch_format="pyarrow",
    )
