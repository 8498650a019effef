"""Multimodal column handling (SURVEY §2 #48).

Images/audio/video are opaque ``binary`` columns plus typed metadata —
the lakehouse-native layout (content inline for small blobs; at 100 TB
swap the binary column for a (uri, byte_range) pointer and keep every
operator below unchanged).

Real, tested plumbing: schemas, partition-friendly batch iteration
(``mapInPandas`` — Arrow batches, never per-row Python), deterministic
feature extraction (byte histograms/entropy), and frame sampling over
fixed-size chunks. Actual codec decode (PIL/ffmpeg are not in this
container) is isolated in :func:`decode_image`, which uses the real
library when importable and otherwise a clearly-marked deterministic
fake with the same schema — so pipelines are testable end-to-end and
the codec drops in without plan changes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HISTOGRAM_BINS = 16

MEDIA_SCHEMA = (
    "doc_id BIGINT, modality STRING, content BINARY, "
    "media_meta STRUCT<mime: STRING, width: INT, height: INT, duration_ms: INT>"
)


def attach_content_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata without touching Python: size + digest, JVM-side."""
    return df.withColumn("content_size", F.length(content_col)).withColumn(
        "content_sha256", F.sha2(F.col(content_col), 256)
    )


FEATURE_SCHEMA = (
    "doc_id BIGINT, modality STRING, content_size INT, entropy DOUBLE, "
    f"histogram ARRAY<DOUBLE>"
)


def byte_histogram_features(df: DataFrame) -> DataFrame:
    """Deterministic per-blob features: normalized 16-bin byte histogram
    + Shannon entropy. ``mapInPandas`` processes Arrow record batches —
    the exact execution shape of a real decode/embed stage, so this
    doubles as the template for plugging in model inference."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "content_size": [],
                "entropy": [],
                "histogram": [],
            }
            for blob in pdf["content"]:
                data = bytes(blob) if blob is not None else b""
                counts = [0] * HISTOGRAM_BINS
                for b in data:
                    counts[b >> 4] += 1
                total = max(len(data), 1)
                hist = [c / total for c in counts]
                ent = -sum(p * math.log2(p) for p in hist if p > 0)
                out["content_size"].append(len(data))
                out["entropy"].append(ent)
                out["histogram"].append(hist)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FEATURE_SCHEMA)


DECODED_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, mean_intensity DOUBLE, decoder STRING"
)

try:  # pragma: no cover - PIL is absent in this container
    from PIL import Image as _PIL_IMAGE  # type: ignore
except ImportError:
    _PIL_IMAGE = None


def decode_image(df: DataFrame, image_module=None) -> DataFrame:
    """Decode an image binary column to (width, height, mean_intensity).

    The codec is probed at import: with PIL installed (or any
    PIL-compatible module passed as ``image_module`` — how the tests
    prove the real path without the lib in this container) this is a
    real decode, labeled ``decoder='pil'``. Without it, a DETERMINISTIC
    FAKE stands in: dimensions and intensity derive from the content
    digest, so tests exercise the full Spark plumbing (schema, Arrow
    batching, partition parallelism) and results are stable. The fake
    is labeled in the ``decoder`` column — downstream must treat
    ``decoder='fake'`` rows as placeholders.
    """
    mod = image_module if image_module is not None else _PIL_IMAGE

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = {"doc_id": [], "width": [], "height": [], "mean_intensity": [], "decoder": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(blob) if blob is not None else b""
                if mod is not None:
                    img = mod.open(io.BytesIO(data)).convert("L")
                    w, h = img.size
                    mean = sum(img.getdata()) / (w * h)
                    dec = "pil"
                else:
                    digest = hashlib.sha256(data).digest()
                    w = 64 + digest[0] % 192
                    h = 64 + digest[1] % 192
                    mean = digest[2] / 255.0 * 256.0
                    dec = "fake"
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_intensity"].append(mean)
                rows["decoder"].append(dec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, content BINARY, decoder STRING"
)


def resize_image(
    df: DataFrame, width: int = 224, height: int = 224, image_module=None
) -> DataFrame:
    """Resize an image binary column to (width, height) — the standard
    normalization step before model inference. With PIL (or an injected
    PIL-compatible ``image_module``) this is a real resize re-encoded
    to PNG; without it (this container) the DETERMINISTIC FAKE emits a
    digest-seeded byte payload of the right conceptual shape
    (width*height bytes, labeled ``decoder='fake'``). Either way the
    operator contract — binary in, fixed-dims binary out,
    Arrow-batched, partition-parallel — is the real one."""
    mod = image_module if image_module is not None else _PIL_IMAGE

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            rows = {"doc_id": [], "width": [], "height": [], "content": [], "decoder": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(blob) if blob is not None else b""
                if mod is not None:
                    img = mod.open(io.BytesIO(data)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    payload, dec = buf.getvalue(), "pil"
                else:
                    seed = hashlib.sha256(data).digest()
                    reps = (width * height) // len(seed) + 1
                    payload, dec = (seed * reps)[: width * height], "fake"
                rows["doc_id"].append(doc_id)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["content"].append(payload)
                rows["decoder"].append(dec)
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_index INT, frame BINARY"


def sample_frames(df: DataFrame, frame_size: int = 1024, every_n: int = 10) -> DataFrame:
    """Frame sampling for video-like blobs: treat content as contiguous
    fixed-size frames, keep every n-th. The chunking is the real
    distribution-shape work (row explosion, memory bounds); a codec
    would only change how bytes become frames."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_index": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(blob) if blob is not None else b""
                n_frames = len(data) // frame_size
                for i in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame"].append(data[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)
