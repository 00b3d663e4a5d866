from __future__ import annotations

import pytest
import ray.data as rd

from kgforge.multimodal import (
    FEATURE_DIM,
    DecodeStub,
    decode_media,
    frame_sample_stub,
    resize_stub,
    synth_media_table,
)


def test_decode_stub_direct():
    t = synth_media_table(6)
    out = DecodeStub()(t)
    assert "payload" not in out.column_names
    feats = out["features"].to_pylist()
    assert all(len(f) == FEATURE_DIM for f in feats)
    # deterministic per payload
    again = DecodeStub()(synth_media_table(6))
    assert feats == again["features"].to_pylist()


def test_decode_stub_requires_real_raises():
    with pytest.raises(NotImplementedError):
        DecodeStub(require_real=True)


def test_decode_media_pipeline():
    ds = rd.from_arrow(synth_media_table(30))
    out = decode_media(ds, concurrency=(1, 2), batch_size=8)
    rows = out.take_all()
    assert len(rows) == 30
    assert all(r["decoded_fake"] for r in rows)


def test_resize_and_frame_sample():
    ds = rd.from_arrow(synth_media_table(9))
    resized = resize_stub(ds, target=32).take_all()
    for r in resized:
        if r["kind"] != "audio":
            assert r["width"] == 32 and r["height"] == 32
        else:
            assert r["width"] == -1
    frames = frame_sample_stub(ds, every_ms=1000).take_all()
    vids = [r for r in frames if r["kind"] == "video"]
    assert len(vids) == 3 * 5  # 3 videos × 5000ms / 1000ms
