"""Span-document source: read, join-text extraction, invariant helpers.

The primary input table is ``(doc_id: string, spans: list<struct<kind,
text, media_ref, offset:int32>>)`` (Parquet standing in for Lance — the
identical logical schema; ``lance`` is not installable in this sandbox).
The per-row invariant every pipeline stage must preserve is
span-sequence equality on ``(kind, text, media_ref, order)``.

A document's *join text* is the concatenation of its ``kind="text"``
span texts in list order. ``extract_join_text`` computes it fully
vectorized (offset arithmetic + one ``binary_join``), never touching
Python rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def read_documents(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read the spans table; prune columns at the read."""
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def join_text_array(spans: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized join-text: concat of kind=="text" span texts per row."""
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    # flatten() returns only the referenced child values (rebased), so the
    # arithmetic below is correct for sliced arrays too (.values is the
    # full child with absolute offsets — do not use it here)
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    values = spans.flatten()
    kind = values.field("kind")
    text = values.field("text")
    mask = pc.equal(kind, "text")
    mask_np = mask.to_numpy(zero_copy_only=False)
    cum = np.zeros(len(mask_np) + 1, dtype=np.int64)
    np.cumsum(mask_np, out=cum[1:])
    new_offsets = cum[offsets]
    new_values = text.filter(mask)
    lst = pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int32()), new_values)
    return pc.binary_join(lst, "")


def add_join_text(batch: pa.Table) -> pa.Table:
    """map_batches fn: append ``join_text`` derived from ``spans``."""
    return batch.append_column("join_text", join_text_array(batch["spans"]))


def span_signature(batch: pa.Table) -> pa.Table:
    """Per-row canonical signature of the span sequence — used by the
    invariant tests: equal signatures ⟺ span-sequence equality on
    (kind, text, media_ref, order)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    values = spans.flatten()
    per_span = pc.binary_join_element_wise(
        values.field("kind"), values.field("text"), values.field("media_ref"), "\x1f"
    )
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lst = pa.ListArray.from_arrays(pa.array(offsets - offsets[0], type=pa.int32()), per_span)
    sig = pc.binary_join(lst, "\x1e")
    return pa.table({"doc_id": batch["doc_id"], "span_sig": sig})


def flat_docs_to_spans(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Deterministically wrap a flat document table (driver testdata shape:
    doc_id:int64, text, lang, source, n_chars) into the spans shape.

    Every 3rd document also gets a leading media span (media_ref derived
    from doc_id), exercising the interleaved layout. Vectorized.
    """
    n = len(batch)
    ids = batch[id_col]
    if not pa.types.is_string(ids.type):
        ids = pc.cast(ids, pa.string())
    doc_ids = pc.binary_join_element_wise(pa.array(["d"] * n), ids, "-")
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    id_np = np.arange(n) if not pa.types.is_integer(batch[id_col].type) else batch[id_col].to_numpy(zero_copy_only=False)
    has_media = (id_np % 3) == 0
    text_np = texts.to_pylist()
    from deezymatch_ray.data.synth import SPAN_TYPE

    spans = []
    for i in range(n):
        row = []
        off = 0
        if has_media[i]:
            row.append({"kind": "media", "text": "",
                        "media_ref": f"media://img/{doc_ids[i].as_py()}-0", "offset": 0})
            off = 1
        row.append({"kind": "text", "text": text_np[i], "media_ref": "", "offset": off})
        spans.append(row)
    return pa.table({"doc_id": doc_ids, "spans": pa.array(spans, type=pa.list_(SPAN_TYPE))})
