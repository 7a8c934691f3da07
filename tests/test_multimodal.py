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


def test_bmp_roundtrip_pure_python():
    """REAL codec, no external libs: encode a 24-bit BMP, decode it,
    recover exact dimensions; corrupted magic falls through to None."""
    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _decode_bmp,
        _encode_bmp,
    )

    payload = _encode_bmp(13, 7, b"seed-bytes")
    got = _decode_bmp(payload)
    assert got is not None and (got[0], got[1]) == (13, 7)
    assert _decode_bmp(payload) == got  # deterministic
    assert _decode_bmp(b"XX" + payload[2:]) is None  # bad magic
    assert _decode_bmp(payload[:40]) is None  # truncated header


def test_decode_tier_prefers_bmp_codec():
    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _encode_bmp,
    )

    pdf = pd.DataFrame({"doc_id": [1], "payload": [_encode_bmp(5, 4, b"abc")]})
    out = pd.concat(list(decode_binary_batches(iter([pdf]))))
    assert out.codec.iloc[0] == "bmp"
    assert (out.width.iloc[0], out.height.iloc[0]) == (5, 4)


def test_wav_roundtrip_pure_python():
    """PCM16 WAV: encode a known sine, parse it back, features match the
    analytic values (rms of a full-cycle sine = amp/sqrt(2))."""
    import numpy as np

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _encode_wav,
        _parse_wav,
    )

    n, amp = 8000, 10000.0
    t = np.arange(n) / 8000.0
    samples = (amp * np.sin(2 * np.pi * 100.0 * t)).astype("<i2")
    payload = _encode_wav(samples, 8000)
    parsed = _parse_wav(payload)
    assert parsed is not None
    got, rate = parsed
    assert rate == 8000 and len(got) == n
    assert np.allclose(got, samples.astype(np.float64))
    assert abs(np.sqrt((got**2).mean()) - amp / np.sqrt(2)) < amp * 0.01
    assert _parse_wav(b"not riff data" * 10) is None


def test_audio_kernel_tags_wav_codec():
    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        AUDIO_WINDOW_SAMPLES,
        _encode_wav,
    )

    payload = _encode_wav([1000] * (AUDIO_WINDOW_SAMPLES * 2))
    pdf = pd.DataFrame({"doc_id": [3], "payload": [payload]})
    out = pd.concat(list(audio_feature_batches(iter([pdf]))))
    assert (out.codec == "wav").all()
    assert len(out) == 2
    assert (out.rms == 1000.0).all() and (out.peak == 1000).all()


def test_decode_bmp_query_end_to_end(spark, sf_dir):
    """VERDICT r2 #7 done-criterion: multimodal decode emits codec='bmp'
    rows end-to-end through Spark without external libs."""
    import minefields_kafka_streams_deduplication_spark as engine

    out = engine.get_queries()["multimodal_decode_bmp"](spark, sf_dir).collect()
    n_docs = engine.load_table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    assert all(r.codec == "bmp" for r in out)
    assert all(r.width >= 2 and r.height >= 2 for r in out)
    # dimensions are the deterministic function of doc_id the synth used
    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        BMP_MAX_EDGE,
    )

    for r in out[:20]:
        assert r.width == r.doc_id % (BMP_MAX_EDGE - 1) + 2
        assert r.height == r.doc_id // 7 % (BMP_MAX_EDGE - 1) + 2


def test_audio_wav_query_end_to_end(spark, sf_dir):
    import minefields_kafka_streams_deduplication_spark as engine

    out = engine.get_queries()["multimodal_audio_wav"](spark, sf_dir).collect()
    assert out and all(r.codec == "wav" for r in out)
    assert all(r.rms > 0 for r in out)


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


def test_bmp_pixel_decode_roundtrip():
    """Pixels decoded from an encoded BMP equal the generator's own
    pixel function — byte-exact, including row padding and the
    bottom-up flip."""
    import numpy as np

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _decode_bmp_pixels,
        _encode_bmp,
    )

    seed = b"pixel-seed"
    w, h = 5, 3
    img = _decode_bmp_pixels(_encode_bmp(w, h, seed))
    assert img is not None and img.shape == (h, w, 3)
    n = len(seed)
    # _encode_bmp writes its y-loop rows straight into the file; BMP
    # files are bottom-up, so file row y is image row h-1-y, and the
    # decoder's flip must land generator row y at img[h-1-y] — asserted
    # strictly (no disjunct) so dropping the flip fails the test.
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            expect = [seed[(i + k) % n] ^ ((x * 7 + y * 13 + k) & 0xFF) for k in range(3)]
            assert list(img[h - 1 - y, x]) == expect


def test_bmp_topdown_rows_not_mirrored():
    """A genuine top-down BMP (negative biHeight) must decode in file
    order — no flip — so both storage orders yield the same image."""
    import struct

    import numpy as np

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _decode_bmp_pixels,
        _encode_bmp,
    )

    bottom_up = _encode_bmp(4, 3, b"xy")
    img_bu = _decode_bmp_pixels(bottom_up)
    # Rewrite the header with negative height and the pixel rows
    # reversed: semantically the same image, stored top-down.
    h, w = 3, 4
    stride = w * 3  # 12 bytes/row, already 4-aligned
    rows = [bottom_up[54 + r * stride : 54 + (r + 1) * stride] for r in range(h)]
    top_down = (
        bottom_up[:22]
        + struct.pack("<i", -h)
        + bottom_up[26:54]
        + b"".join(reversed(rows))
    )
    img_td = _decode_bmp_pixels(top_down)
    assert img_td is not None and (img_td == img_bu).all()


def test_resize_nearest_known_values():
    import numpy as np

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _resize_nearest,
    )

    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    half = _resize_nearest(img, 2, 2)
    assert half.reshape(-1).tolist() == [0, 2, 8, 10]
    same = _resize_nearest(img, 4, 4)
    assert (same == img).all()


def test_resize_bmp_query_end_to_end(spark, sf_dir):
    import minefields_kafka_streams_deduplication_spark as engine

    rows = engine.get_queries()["multimodal_resize_bmp"](spark, sf_dir).collect()
    n_docs = engine.load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.codec == "bmp"
        assert 0 < r.resized_w <= r.width and 0 < r.resized_h <= r.height
        assert max(r.resized_w, r.resized_h) <= 8
        # nearest-neighbor sampling keeps the mean in the same range
        assert abs(r.resized_mean - r.pixel_mean) < 64, r


def test_phash_perceptual_invariances(spark):
    """aHash contract: identical images pair at distance 0; a
    single-pixel edit stays within threshold; a 2x nearest upscale
    yields the SAME signature (resize invariance); a structurally
    different image does not pair."""
    import numpy as np

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _ahash,
        _decode_bmp_pixels,
        _encode_bmp,
        _encode_bmp_pixels,
        _resize_nearest,
        phash_pairs,
    )

    rng = np.random.default_rng(7)
    base_seed = bytes(rng.integers(0, 256, 256, dtype=np.uint8))
    img_a = _encode_bmp(16, 16, base_seed)

    # Single-pixel edit: flip one byte inside the pixel array.
    edited = bytearray(img_a)
    edited[-5] ^= 0xFF
    img_b = bytes(edited)

    # 2x nearest upscale of the same pixels, re-encoded.
    px = _decode_bmp_pixels(img_a)
    up = _resize_nearest(px, 32, 32)
    img_c = _encode_bmp_pixels(up)

    # Structurally different: half black, half white.
    contrast = np.zeros((16, 16, 3), dtype=np.uint8)
    contrast[:, 8:] = 255
    img_d = _encode_bmp_pixels(contrast)

    assert _ahash(_decode_bmp_pixels(img_c)) == _ahash(px)  # resize-invariant

    payloads = spark.createDataFrame(
        [(0, img_a), (1, img_a), (2, img_b), (3, img_c), (4, img_d)],
        "doc_id LONG, payload BINARY",
    )
    pairs = {
        (r.doc_id_1, r.doc_id_2): r.hamming for r in phash_pairs(payloads).collect()
    }
    assert pairs[(0, 1)] == 0                 # identical
    assert (0, 2) in pairs                    # one-pixel edit within threshold
    assert (0, 3) in pairs and pairs[(0, 3)] == 0  # upscale pairs at 0
    assert not any(4 in p for p in pairs)     # contrast image unrelated


def test_phash_keep_first_matches_pair_star_policy(spark, sf_dir):
    """Policy parity: phash_keep_first's survivors must be exactly the
    hashed docs that have NO verified pair with a smaller doc in
    phash_pairs — the same star rule, linear output."""
    import minefields_kafka_streams_deduplication_spark as engine
    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        phash_batches,
        phash_keep_first,
        phash_pairs,
        synthesize_bmp_batches,
    )

    docs = engine.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(
        synthesize_bmp_batches, "doc_id LONG, payload BINARY"
    ).localCheckpoint()
    hashed = {
        r.doc_id
        for r in payloads.mapInPandas(
            phash_batches, "doc_id LONG, phash LONG"
        ).collect()
    }
    pairs = phash_pairs(payloads).collect()
    dominated = {r.doc_id_2 for r in pairs}
    want = hashed - dominated
    got = {r.doc_id for r in phash_keep_first(payloads).collect()}
    assert got == want
    assert 0 < len(got) < len(hashed)  # the fixture has image near-dups


def test_spectral_kernel_physics():
    """The spectral features read real physics: a pure tone's centroid
    lands within one FFT bin of the sine frequency with near-zero
    flatness; white noise reads flat; rolloff brackets the tone."""
    import numpy as np

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        AUDIO_WINDOW_SAMPLES,
        _encode_wav,
        audio_spectral_batches,
    )

    rate, n = 8000, AUDIO_WINDOW_SAMPLES * 4
    bin_hz = rate / AUDIO_WINDOW_SAMPLES
    t = np.arange(n) / rate
    tone = _encode_wav((12000 * np.sin(2 * np.pi * 440.0 * t)).astype("<i2"), rate)
    noise = _encode_wav(
        np.random.RandomState(7).randint(-20000, 20000, n).astype("<i2"), rate
    )
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [tone, noise]})
    out = pd.concat(list(audio_spectral_batches(iter([pdf]))))
    assert (out.codec == "wav").all() and len(out) == 8
    tone_rows = out[out.doc_id == 1]
    assert (abs(tone_rows.centroid_hz - 440.0) <= bin_hz).all()
    assert (tone_rows.flatness < 0.01).all()
    assert (abs(tone_rows.rolloff_hz - 440.0) <= 2 * bin_hz).all()
    noise_rows = out[out.doc_id == 2]
    assert (noise_rows.flatness > 0.3).all()
    assert (noise_rows.centroid_hz > 1000).all()  # energy spread high


def test_audio_spectral_query_end_to_end(spark, sf_dir):
    """End-to-end over the synthesized corpus: every row decodes via
    the real WAV codec and each doc's centroid matches its synthesized
    sine frequency (110*(1+doc_id%12)) within two FFT bins (fixture
    tones sit BETWEEN bins, so per-window phase shifts the
    leakage-weighted centroid by up to ~1.1 bins — the on-bin tight
    pin lives in test_spectral_kernel_physics)."""
    import pyspark.sql.functions as F

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        AUDIO_WINDOW_SAMPLES,
    )
    from minefields_kafka_streams_deduplication_spark.registry import QUERIES

    out = QUERIES["multimodal_audio_spectral"](spark, sf_dir)
    bin_hz = 8000 / AUDIO_WINDOW_SAMPLES
    expected = 110.0 * (1 + F.col("doc_id") % 12)
    bad = out.filter(
        (F.col("codec") != "wav")
        | (F.abs(F.col("centroid_hz") - expected) > 2 * bin_hz)
        | (F.col("flatness") > 0.05)
    )
    assert bad.count() == 0
    # fan-out bounded: windows per doc = payload_samples // win <= 8
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.filter(F.col("count") > 8).count() == 0


def test_dct_phash_invariances():
    """The DCT pHash's construction-level invariances: brightness shift
    (DC excluded) and linear contrast scaling (AC coefs and median
    scale together) leave the signature BIT-IDENTICAL; a 2x nearest
    upscale is signature-identical; distinct images differ widely; and
    high-frequency noise perturbs the DCT signature no more than the
    pixel-grid aHash (the low-pass advantage)."""
    import numpy as np

    from minefields_kafka_streams_deduplication_spark.multimodal.binary_ops import (
        _ahash,
        _dct_phash,
        _resize_nearest,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 200, (64, 64, 3)).astype(np.uint8)
    base = _dct_phash(img)
    # brightness shift: +40 on every channel (no clipping: max 239)
    assert _dct_phash(img + 40) == base
    # contrast scale x1.2 without clipping (float pixels are fine)
    assert _dct_phash(img.astype(np.float64) * 1.2) == base
    # 2x nearest upscale
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert _dct_phash(up) == base
    # distinct random images are far apart
    other = rng.randint(0, 200, (64, 64, 3)).astype(np.uint8)
    far = bin(base ^ _dct_phash(other)).count("1")
    assert far > 15
    # high-frequency noise on NATURAL-image-like content (1/f^2 field:
    # integrated white noise — photos have decaying spectra; a uniform-
    # random image is itself white noise and carries no low-freq signal
    # for the DCT to hold on to): the low-pass pHash flips fewer bits
    # than the pixel-grid aHash, averaged over trials.
    w = rng.randn(64, 64)
    brown = np.cumsum(np.cumsum(w, axis=0), axis=1)
    brown = (brown - brown.min()) / (brown.max() - brown.min()) * 200 + 20
    nat = np.stack([brown.astype(np.uint8)] * 3, axis=2)
    nat_d, nat_a = _dct_phash(nat), _ahash(nat)
    d_dct = d_ahash = 0
    for _ in range(10):
        noisy = np.clip(
            nat.astype(np.int32) + rng.randint(-25, 26, nat.shape), 0, 255
        ).astype(np.uint8)
        d_dct += bin(nat_d ^ _dct_phash(noisy)).count("1")
        d_ahash += bin(nat_a ^ _ahash(noisy)).count("1")
    assert d_dct < d_ahash  # the low-pass advantage, 10-trial mean
    assert d_dct / 10 < 12  # and absolutely small vs the 63-bit sig
    # sanity: the 32x32 resample path is what the hash sees
    small = _resize_nearest(img, 32, 32)
    assert small.shape == (32, 32, 3)


def test_dct_phash_query_end_to_end(spark, sf_dir):
    """The DCT query emits verified pairs over the synthesized corpus
    with the same exact-copy guarantees as the aHash form: every
    identical-text pair (same BMP bytes) appears at Hamming 0."""
    import minefields_kafka_streams_deduplication_spark as engine
    import pyspark.sql.functions as F

    out = engine.get_queries()["multimodal_phash_dct_dedup"](spark, sf_dir)
    docs = engine.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("d1"), F.col("text").alias("t"))
    b = docs.select(F.col("doc_id").alias("d2"), F.col("text").alias("t"))
    twins = a.join(b, "t").filter(F.col("d1") < F.col("d2")).select("d1", "d2")
    found = out.filter(F.col("hamming") == 0).select(
        F.col("doc_id_1").alias("d1"), F.col("doc_id_2").alias("d2")
    )
    assert twins.join(found, ["d1", "d2"], "left_anti").count() == 0
