"""Synthetic spans table + join-text extraction + span-sequence invariant."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from deezymatch_ray.data.synth import make_documents, write_documents
from deezymatch_ray.sources.spans import (
    add_join_text,
    flat_docs_to_spans,
    join_text_array,
    span_signature,
)


def test_make_documents_deterministic_and_wellformed(tmp_path):
    docs1, truth1 = make_documents(200, seed=42)
    docs2, truth2 = make_documents(200, seed=42)
    assert docs1.equals(docs2) and truth1.equals(truth2)
    assert docs1.num_rows == 200
    # offsets strictly increasing per row; text concat == truth text
    joined = join_text_array(docs1["spans"])
    assert joined.to_pylist() == truth1["text"].to_pylist()
    for spans in docs1["spans"].to_pylist()[:50]:
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        for s in spans:
            if s["kind"] == "media":
                assert s["media_ref"].startswith("media://") and s["text"] == ""
            else:
                assert s["media_ref"] == ""


def test_join_text_ray_pipeline_preserves_spans(tmp_path):
    path = write_documents(str(tmp_path / "docs"), 300, seed=7)
    ds = ray.data.read_parquet(path + "/documents_spans.parquet")
    out = ds.map_batches(add_join_text, batch_format="pyarrow")
    tab = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).sort_by("doc_id")
    orig = pq.read_table(path + "/documents_spans.parquet").sort_by("doc_id")
    truth = pq.read_table(path + "/truth.parquet").sort_by("doc_id")
    assert tab["join_text"].to_pylist() == truth["text"].to_pylist()
    # span invariant: signatures identical pre/post
    sig_in = span_signature(orig)["span_sig"].to_pylist()
    sig_out = span_signature(tab.select(["doc_id", "spans"]))["span_sig"].to_pylist()
    assert sig_in == sig_out


def test_flat_docs_to_spans_roundtrip():
    flat = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": ["alpha beta", "gamma", "delta eps", "zeta"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": pa.array([10, 5, 9, 4], type=pa.int64()),
        }
    )
    spans_tab = flat_docs_to_spans(flat)
    assert spans_tab.column_names == ["doc_id", "spans"]
    joined = join_text_array(spans_tab["spans"])
    assert joined.to_pylist() == flat["text"].to_pylist()
    # docs 0 and 3 carry a media span (doc_id % 3 == 0)
    rows = spans_tab["spans"].to_pylist()
    assert rows[0][0]["kind"] == "media" and rows[1][0]["kind"] == "text"
    assert rows[3][0]["kind"] == "media"
