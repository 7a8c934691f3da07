"""Multimodal kernel semantics: decode metadata, resize arithmetic,
frame fan-out, audio windowing — the plumbing is real even though the
codecs are documented stubs."""

from __future__ import annotations

import pandas as pd
import pytest

from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
    AUDIO_WINDOW_BYTES,
    FRAMES_PER_DOC,
    RESIZE_MAX_EDGE,
    _fake_decode,
    _resize_dims,
    audio_feature_batches,
    decode_binary_batches,
    sample_frame_batches,
)


def test_resize_preserves_aspect_and_caps_edge():
    w, h = _resize_dims(1000, 500)
    assert w == RESIZE_MAX_EDGE and h == RESIZE_MAX_EDGE // 2
    assert _resize_dims(100, 50) == (100, 50)  # no upscale
    assert _resize_dims(0, 10) == (0, 0)


def test_decode_deterministic():
    assert _fake_decode(b"hello") == _fake_decode(b"hello")
    assert _fake_decode(b"") == (0, 0, 0)


def test_decode_batch_schema_and_rows():
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abcd" * 100, b""]})
    out = pd.concat(list(decode_binary_batches(iter([pdf]))))
    assert list(out.columns) == [
        "doc_id", "n_bytes", "width", "height", "checksum",
        "resized_w", "resized_h", "codec",
    ]
    assert out[out.doc_id == 1].n_bytes.iloc[0] == 400
    assert out[out.doc_id == 1].codec.iloc[0] == "fake"  # text bytes ≠ image
    assert out[out.doc_id == 2].codec.iloc[0] == "empty"


def test_real_codec_used_when_pillow_present():
    """Feature-gated codec: with Pillow installed, a real PNG decodes to
    its true dimensions and is tagged codec='pil'. Skips cleanly in
    containers without image libs."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (31, 17)).save(buf, format="PNG")
    pdf = pd.DataFrame({"doc_id": [1], "payload": [buf.getvalue()]})
    out = pd.concat(list(decode_binary_batches(iter([pdf]))))
    assert out.codec.iloc[0] == "pil"
    assert (out.width.iloc[0], out.height.iloc[0]) == (31, 17)


def test_fake_codec_used_when_pillow_absent():
    """The complement: without Pillow, the deterministic fake runs and
    says so. Skips cleanly where Pillow exists."""
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow present — fake-codec path not reachable")
    except ImportError:
        pass
    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"not an image"]})
    out = pd.concat(list(decode_binary_batches(iter([pdf]))))
    assert out.codec.iloc[0] == "fake"
    assert out.width.iloc[0] > 0 and out.height.iloc[0] > 0


def test_frame_sample_fanout_bounded():
    payload = bytes(range(256)) * 64  # 16384 bytes → 256 frames
    pdf = pd.DataFrame({"doc_id": [7], "payload": [payload]})
    out = pd.concat(list(sample_frame_batches(iter([pdf]))))
    assert len(out) == FRAMES_PER_DOC
    assert out.frame_offset.is_monotonic_increasing


def test_audio_windows_cover_payload():
    payload = bytes([100]) * (AUDIO_WINDOW_BYTES * 3 + 10)
    pdf = pd.DataFrame({"doc_id": [9], "payload": [payload]})
    out = pd.concat(list(audio_feature_batches(iter([pdf]))))
    assert len(out) == 3  # floor(payload / window)
    assert (out.rms == 100.0).all() and (out.peak == 100).all()
