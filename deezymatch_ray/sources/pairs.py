"""Labeled string-pair sources — the reference's primary input format.

Reference semantics reproduced exactly (SURVEY §2.1 S1/S2, §2.2 M5/M6/M8):

- tab-separated lines; only the first three fields are used, extras are
  discarded (data_processing.py:54, README.md:176);
- label must match true|false case-insensitively (also 1/0 after the
  reference's bool cast path); rows failing validation are DROPPED, and
  the engine counts them (never silent) (data_processing.py:49-67);
- all fields are stripped (data_processing.py:56-58);
- one-column mode duplicates the single field and injects label true
  (data_processing.py:292-296).

Ray-native shape: ``ray.data.read_text`` → vectorized Arrow parser in
``map_batches`` → (s1, s2, label) Dataset.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_TRUE_RE = r"(?i)^(true|1)$"
_VALID_RE = r"(?i)^(true|false|1|0)$"


def parse_pairs_batch(batch: pa.Table, one_column: bool = False,
                      sep: str = "\t") -> pa.Table:
    """(text) lines → (s1, s2, label bool); invalid-label rows dropped."""
    lines = batch["text"]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    if one_column:
        s = pc.utf8_trim_whitespace(lines)
        return pa.table({
            "s1": s, "s2": s,
            "label": pa.array([True] * len(s), type=pa.bool_()),
        })
    parts = pc.split_pattern(lines, sep)
    n_fields = pc.list_value_length(parts)
    keep3 = pc.greater_equal(n_fields, 3)
    t = pa.table({"parts": parts}).filter(keep3)
    parts = t["parts"].combine_chunks() if isinstance(t["parts"], pa.ChunkedArray) else t["parts"]
    s1 = pc.utf8_trim_whitespace(pc.list_element(parts, 0))
    s2 = pc.utf8_trim_whitespace(pc.list_element(parts, 1))
    lab = pc.utf8_trim_whitespace(pc.list_element(parts, 2))
    valid = pc.match_substring_regex(lab, _VALID_RE)
    out = pa.table({
        "s1": s1, "s2": s2,
        "label": pc.match_substring_regex(lab, _TRUE_RE),
    }).filter(valid)
    return out


def read_pairs_tsv(path: str, one_column: bool = False, **kwargs) -> ray.data.Dataset:
    """Read the reference's TSV pair format into (s1, s2, label)."""
    ds = ray.data.read_text(path, **kwargs)
    return ds.map_batches(
        lambda b: parse_pairs_batch(b, one_column=one_column),
        batch_format="pyarrow",
    )


def label_counts(pairs: ray.data.Dataset) -> dict[bool, int]:
    """A1: True/False label counts (logged by the reference,
    data_processing.py:68-75)."""
    out = {r["label"]: r["count()"] for r in
           pairs.groupby("label").count().take_all()}
    return {True: out.get(True, 0), False: out.get(False, 0)}


def stratified_split(
    pairs: ray.data.Dataset,
    train: float = 0.7,
    val: float = 0.15,
    seed: int = 123,
    label_col: str = "label",
) -> ray.data.Dataset:
    """K3 as a deterministic keyed split: md5-hash each row's content
    salted by its label stratum → split ∈ {train, valid, test}. Unlike
    the reference's positional slicing (data_processing.py:81-113) this
    is stable under any partitioning/order — required distributed — while
    preserving per-label proportions in expectation."""
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        s1 = batch["s1"].to_pylist()
        s2 = batch["s2"].to_pylist()
        lab = batch[label_col].to_pylist()
        splits = []
        for a, b, y in zip(s1, s2, lab):
            h = hashlib.md5(f"{seed}\x1f{y}\x1f{a}\x1f{b}".encode()).digest()
            u = int.from_bytes(h[:8], "big") / 2**64
            splits.append("train" if u < train else
                          "valid" if u < train + val else "test")
        return batch.append_column("split", pa.array(splits, type=pa.string()))

    return pairs.map_batches(fn, batch_format="pyarrow")
