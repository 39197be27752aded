"""Checkpoint/resume + per-partition lineage for pipeline stages.

The reference has no resumability (its embedding writer "resumes" by
counting files and silently mis-appends — rnn_networks.py:902-904;
SURVEY §4). Our contract, per the north rule:

- Every stage writes **partitioned Parquet**: the input is hash-bucketed
  into ``n_partitions`` by a key column, each bucket lands in its own
  ``part=<i>/`` directory (never one giant file).
- A JSON **manifest row per partition** records lineage + metrics:
  ``(stage, partition_id, input_fingerprint, rows_in, rows_out,
  wall_ms)``. Written atomically (tmp + rename) AFTER the partition's
  data file is complete, so a crash between the two leaves a re-runnable
  partition, never a corrupt "done" marker.
- On resume, ``run_stage`` lists completed manifest rows whose
  ``input_fingerprint`` still matches and filters those buckets OUT of
  the input before executing — only unfinished/invalidated partitions
  re-run. A finished run is a no-op.

The fingerprint is a stable hash of the partition's input row ids, so a
changed input invalidates exactly the partitions it touches.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_partitions: int) -> np.ndarray:
    """Stable hash-bucket per row (md5-based — never Python hash())."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_pylist()
    out = np.empty(len(vals), dtype=np.int64)
    for i, v in enumerate(vals):
        h = hashlib.md5(str(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(h[:8], "big") % n_partitions
    return out


def add_partition_column(
    ds: ray.data.Dataset, key_col: str, n_partitions: int
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", pa.array(_bucket_of(batch[key_col], n_partitions))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, "_manifest", f"part-{partition_id:05d}.json")


def load_manifest(out_dir: str) -> dict[int, dict]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for f in os.listdir(mdir):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                row = json.load(fh)
            out[row["partition_id"]] = row
    return out


def _write_manifest_row(out_dir: str, row: dict) -> None:
    path = _manifest_path(out_dir, row["partition_id"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(row, fh)
    os.replace(tmp, path)  # atomic: done-marker appears all-or-nothing


def _row_hashes(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.array(
        [int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
         for v in col.to_pylist()],
        dtype=np.uint64,
    )


def partition_fingerprint(ds: ray.data.Dataset, key_col: str) -> tuple[str, int]:
    """(fingerprint, rows): order-independent commutative sum of per-row
    md5 hashes, computed distributed (one tiny aggregate — no rows reach
    the driver)."""

    def fn(batch: pa.Table) -> pa.Table:
        h = _row_hashes(batch[key_col])
        with np.errstate(over="ignore"):
            s = np.uint64(h.sum(dtype=np.uint64))
        return pa.table({
            "h": pa.array([int(s) - (1 << 63)], type=pa.int64()),  # signed bias
            "n": pa.array([len(h)], type=pa.int64()),
        })

    agg = ds.map_batches(fn, batch_format="pyarrow")
    rows = agg.sum("n") or 0
    if rows == 0:
        return "empty", 0
    parts = [r["h"] for r in agg.take_all()]
    with np.errstate(over="ignore"):
        total = np.uint64(0)
        for p in parts:
            total = total + np.uint64(int(p) + (1 << 63))
    return f"{int(total):016x}-{rows}", int(rows)


def run_stage(
    ds: ray.data.Dataset,
    stage_fn: Callable[[ray.data.Dataset], ray.data.Dataset],
    out_dir: str,
    stage_name: str,
    key_col: str,
    n_partitions: int = 16,
) -> list[int]:
    """Run ``stage_fn`` per hash-partition of ``ds`` with skip-if-done.

    Returns the list of partition ids executed this call (completed
    partitions with matching fingerprints are skipped). Output lands in
    ``out_dir/part=<i>/data.parquet`` + ``out_dir/_manifest/``.

    Partition granularity is the resume/lineage unit: the driver-side
    loop iterates partitions, but all heavy work inside each partition
    runs as the usual distributed Ray Data pipeline. For a 100 TB run,
    ``n_partitions`` is sized so one partition ≈ one retryable slice of
    work (minutes, not hours).
    """
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    keyed = add_partition_column(ds, key_col, n_partitions).materialize()
    manifest = load_manifest(out_dir)
    ran: list[int] = []
    for pid in range(n_partitions):
        part_in = keyed.filter(expr=f"__part == {pid}").drop_columns(["__part"])
        fp, rows_in = partition_fingerprint(part_in, key_col)
        prev = manifest.get(pid)
        if prev is not None and prev.get("input_fingerprint") == fp:
            continue  # lineage says done with identical input — skip
        t0 = time.time()
        out_ds = stage_fn(part_in)
        pdir = os.path.join(out_dir, f"part={pid}")
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)  # write_parquet appends — never re-append
        rows_out = out_ds.count()
        if rows_out:
            out_ds.write_parquet(pdir)
        _write_manifest_row(out_dir, {
            "stage": stage_name,
            "partition_id": pid,
            "input_fingerprint": fp,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_ms": int((time.time() - t0) * 1000),
        })
        ran.append(pid)
    return ran


def read_stage_output(out_dir: str) -> ray.data.Dataset:
    """Read every completed partition's parquet back as one Dataset."""
    paths = [
        os.path.join(out_dir, name, f)
        for name in sorted(os.listdir(out_dir))
        if name.startswith("part=")
        for f in sorted(os.listdir(os.path.join(out_dir, name)))
        if f.endswith(".parquet")
    ]
    if not paths:
        return ray.data.from_items([])
    return ray.data.read_parquet(paths)
