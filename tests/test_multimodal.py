"""Multimodal plumbing: binary payload schema, decode/resize/frame-sample
actor stages (deterministic fake codec — real codecs are stubbed)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from deezymatch_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FrameSampler,
    ImageResizer,
    MediaDecoder,
    decode_media,
    make_media_table,
    media_batch_size,
)


@pytest.fixture(scope="module")
def media_tbl():
    refs = [f"media://img/d-{i:04d}-0" for i in range(60)]
    return make_media_table(refs, seed=42)


def test_media_table_schema_and_determinism(media_tbl):
    assert media_tbl.schema.equals(MEDIA_SCHEMA)
    again = make_media_table(media_tbl["media_ref"].to_pylist(), seed=42)
    assert media_tbl.equals(again)
    mimes = set(media_tbl["mime"].to_pylist())
    assert mimes <= {"image/png", "audio/wav", "video/mp4"}
    assert len(mimes) == 3  # all kinds present at n=60


def test_decode_stage_deterministic_unit_features(media_tbl):
    ds = ray.data.from_arrow(media_tbl)
    out = decode_media(ds, dim=32, concurrency=(1, 2)).to_pandas()
    assert len(out) == len(media_tbl)
    assert out["decode_ok"].all()
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (len(media_tbl), 32)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)
    # deterministic across a second (differently-batched) run
    out2 = decode_media(ds.repartition(7), dim=32).to_pandas()
    m = out.set_index("media_ref")["features"]
    m2 = out2.set_index("media_ref")["features"]
    for ref in out["media_ref"]:
        np.testing.assert_array_equal(m[ref], m2[ref])


def test_decoder_real_backend_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaDecoder(backend="pil")


def test_resizer_metadata_math(media_tbl):
    out = ray.data.from_arrow(media_tbl).map_batches(
        ImageResizer(max_side=16), batch_format="pyarrow"
    ).to_pandas()
    img = out[out["mime"].str.startswith("image/")]
    assert len(img) > 0
    assert (img[["out_width", "out_height"]].max(axis=1) <= 16).all()
    # aspect preserved within rounding
    ar_in = img["width"] / img["height"]
    ar_out = img["out_width"] / img["out_height"]
    assert (np.abs(ar_in - ar_out) / ar_in < 0.2).all()
    non = out[~out["mime"].str.startswith("image/")]
    assert (non[["out_width", "out_height"]] == 0).all().all()


def test_frame_sampler_explodes_videos_only(media_tbl):
    out = ray.data.from_arrow(media_tbl).map_batches(
        FrameSampler(n_frames=3), batch_format="pyarrow"
    ).to_pandas()
    n_videos = sum(1 for m in media_tbl["mime"].to_pylist() if m.startswith("video/"))
    assert len(out) == 3 * n_videos
    durs = dict(zip(media_tbl["media_ref"].to_pylist(),
                    media_tbl["duration_ms"].to_pylist()))
    assert ((out["ts_ms"] >= 0) & (out["ts_ms"] <= out["media_ref"].map(durs))).all()
    assert set(out["frame_idx"]) == {0, 1, 2}


def test_media_batch_size_bounds():
    assert media_batch_size(1 << 20, worker_heap_bytes=512 << 20) == 128
    assert media_batch_size(1 << 30) == 1  # huge payloads → row-at-a-time
