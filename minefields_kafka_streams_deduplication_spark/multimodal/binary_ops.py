"""Multimodal column operators: image/audio/video as opaque `binary`
columns with typed metadata (BASELINE.json:6).

The image DECODE step is feature-gated: when Pillow is importable the
real codec runs (`_decode` → PIL path, per-row `codec='pil'`); in this
container (no image/audio libs) a clearly-marked deterministic fake
stands in behind the real Spark plumbing (schema, `mapInPandas` batch
shape, partitioning), tagged `codec='fake'`. The distributed plan is
identical either way — that is the point.

Since the fixtures carry no binary table, `multimodal_meta` synthesizes
the binary column from `documents.text` (utf-8 encode) — which also
makes it fully oracle-checkable (byte lengths + hex prefix are
deterministic), keeping the plumbing honest.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query

DECODED_SCHEMA = (
    "doc_id LONG, n_bytes INT, width INT, height INT, checksum LONG, "
    "resized_w INT, resized_h INT, codec STRING"
)

try:  # optional real codec — absent in this container, used when present
    from PIL import Image as _PILImage  # type: ignore
except ImportError:
    _PILImage = None

RESIZE_MAX_EDGE = 224  # target max edge for the (stubbed) resize step


def _resize_dims(w: int, h: int, max_edge: int = RESIZE_MAX_EDGE) -> tuple[int, int]:
    """Aspect-preserving resize arithmetic (the real part of a resize
    op — the pixel resampling itself is the stubbed codec's job)."""
    if w <= 0 or h <= 0:
        return 0, 0
    scale = min(max_edge / w, max_edge / h, 1.0)
    return max(int(w * scale), 1), max(int(h * scale), 1)


@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       substr(md5(text), 1, 8) AS prefix_md5,
       lang
FROM documents
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column — the scan-side half
    of every multimodal pipeline (size/dedup-key extraction without
    decoding). Binary stays JVM-side; no Python in this plan."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.substring(F.md5("text"), 1, 8).alias("prefix_md5"),
        "lang",
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake standing in for an image codec
    when Pillow is unavailable or the payload isn't a decodable image.
    Returns (width, height, checksum)."""
    if not payload:
        return 0, 0, 0
    checksum = 0
    for b in payload[:256]:
        checksum = (checksum * 31 + b) % 1_000_000_007
    return (payload[0] % 64 + 1) * 16, (payload[-1] % 64 + 1) * 16, checksum


def _decode(payload: bytes) -> tuple[int, int, int, str]:
    """Feature-gated decode: real Pillow codec when importable and the
    payload decodes; deterministic fake otherwise. Returns
    (width, height, checksum, codec) with codec ∈ {pil, fake, empty}."""
    if not payload:
        return 0, 0, 0, "empty"
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(bytes(payload))) as im:
                checksum = 0
                for b in payload[:256]:
                    checksum = (checksum * 31 + b) % 1_000_000_007
                return im.width, im.height, checksum, "pil"
        except Exception:
            pass  # not an image payload — fall through to the fake
    w, h, c = _fake_decode(payload)
    return w, h, c, "fake"


def decode_binary_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches in, decoded metadata out.

    This is the real distributed shape for multimodal feature
    extraction: one Python worker per partition, Arrow transfer,
    constant memory per batch.
    """
    for pdf in it:
        decoded = [_decode(p) for p in pdf["payload"]]
        resized = [_resize_dims(d[0], d[1]) for d in decoded]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "checksum": [d[2] for d in decoded],
                "resized_w": [r[0] for r in resized],
                "resized_h": [r[1] for r in resized],
                "codec": [d[3] for d in decoded],
            }
        )


@query("multimodal_decode_stub")  # rows-only: decode is a documented stub
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over binary payloads via
    `mapInPandas` — schema, batching and partitioning are real; the
    codec is Pillow when importable, else the documented fake (the
    per-row `codec` column says which ran)."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return with_payload.mapInPandas(decode_binary_batches, DECODED_SCHEMA)


FRAME_STRIDE_BYTES = 64  # stand-in for a codec's frame boundary
FRAMES_PER_DOC = 4

FRAME_SCHEMA = "doc_id LONG, frame_idx INT, frame_offset INT, frame_sig LONG"


def sample_frame_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: uniform frame sampling from a binary stream —
    the video-shaped pipeline (1 input row → k frame rows). A real
    implementation seeks keyframes via the container index; the STUB
    treats every FRAME_STRIDE_BYTES as a frame and emits a checksum
    standing in for decoded frame features.
    """
    for pdf in it:
        out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_sig": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None or len(payload) == 0:
                continue
            n_frames = max(len(payload) // FRAME_STRIDE_BYTES, 1)
            step = max(n_frames // FRAMES_PER_DOC, 1)
            for i, frame in enumerate(range(0, n_frames, step)[:FRAMES_PER_DOC]):
                off = frame * FRAME_STRIDE_BYTES
                chunk = payload[off : off + FRAME_STRIDE_BYTES]
                sig = 0
                for b in chunk:
                    sig = (sig * 31 + b) % 1_000_000_007
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_offset"].append(off)
                out["frame_sig"].append(sig)
        yield pd.DataFrame(out)


AUDIO_WINDOW_BYTES = 256  # stand-in for a PCM analysis window

AUDIO_SCHEMA = "doc_id LONG, window_idx INT, rms DOUBLE, peak INT, n_windows INT"


def audio_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: fixed-rate windowed features over a byte
    stream — the audio pipeline shape (1 row → n_windows rows, numpy-
    vectorized per payload). A real implementation decodes PCM via
    torchaudio/soundfile (NOT in this container); the STUB treats raw
    bytes as unsigned samples, which keeps the windowing, feature math
    and fan-out real."""
    import numpy as np

    for pdf in it:
        out = {"doc_id": [], "window_idx": [], "rms": [], "peak": [], "n_windows": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None or len(payload) == 0:
                continue
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            n_win = max(len(samples) // AUDIO_WINDOW_BYTES, 1)
            usable = samples[: n_win * AUDIO_WINDOW_BYTES]
            if len(usable) < AUDIO_WINDOW_BYTES:
                usable = np.pad(samples, (0, AUDIO_WINDOW_BYTES - len(samples)))
            windows = usable.reshape(n_win, -1)
            rms = np.sqrt((windows**2).mean(axis=1))
            peak = windows.max(axis=1).astype(np.int32)
            out["doc_id"].extend([doc_id] * n_win)
            out["window_idx"].extend(range(n_win))
            out["rms"].extend(np.round(rms, 4))
            out["peak"].extend(peak)
            out["n_windows"].extend([n_win] * n_win)
        yield pd.DataFrame(out)


@query("multimodal_audio_features_stub")  # rows-only: codec is a documented stub
def multimodal_audio_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio-feature extraction over binary payloads — the
    third multimodal shape (image=decode/resize, video=frame-sample,
    audio=fixed-rate windows). Feature math is vectorized numpy per
    payload; fan-out is window-count rows per input."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return with_payload.mapInPandas(audio_feature_batches, AUDIO_SCHEMA)


@query("multimodal_frame_sample")  # rows-only: frame extraction is a documented stub
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads (video analog): 1 row in →
    k frame rows out through `mapInPandas` — the fan-out shape every
    video feature-extraction pipeline needs. Partitioning note: frame
    fan-out multiplies row counts, so repartition BEFORE this op when
    payloads are large and AFTER when frames are small."""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return with_payload.mapInPandas(sample_frame_batches, FRAME_SCHEMA)
