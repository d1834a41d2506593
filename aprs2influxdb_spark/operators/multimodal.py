"""Multimodal column handling (north star).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
partition flow — is real and tested; the actual media decode is
stubbed (the image/audio libraries are not in this container) behind
``decode_image_stub``, a deterministic fake with the same signature a
real decoder would have.

Scale notes: media blobs ride in their own column so column pruning
keeps them out of every query that doesn't touch them; feature
extraction is ``mapInPandas`` (one Arrow batch in, one out — no
per-row Python), and the output drops the blob so the shuffle that
follows carries features, not media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),      # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),   # opaque blob
        StructField("width", IntegerType(), True),    # typed metadata
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("feat_mean", LongType(), True),   # stub "feature"
    ]
)


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.  A real implementation would be::

        import PIL.Image, io
        img = PIL.Image.open(io.BytesIO(payload))
        ...

    and is intentionally NOT implemented here (no media libs in the
    container).  The fake derives stable pseudo-features from the
    bytes so tests can assert the plumbing end-to-end.
    """
    if payload is None:
        raise NotImplementedError("real decode requires PIL/librosa — not available")
    return {"n_bytes": len(payload), "feat_mean": sum(payload[:64]) if payload else 0}


def pil_available() -> bool:
    """True when Pillow is importable — gates the real-codec contract
    tests; this container ships without media libraries, so the
    registry pins the deterministic stubs."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_real(payload: bytes) -> dict:
    """REAL image decode (requires Pillow): the same output contract
    as :func:`decode_image_stub` — ``n_bytes`` is the blob size and
    ``feat_mean`` an integer brightness feature (mean grayscale pixel,
    floor) — so either decoder can back :func:`extract_features`
    without schema or determinism changes.  Raises ``ImportError``
    without Pillow; the contract equivalence is pinned by the
    ``pytest.importorskip('PIL')`` tests in tests/test_multimodal.py
    (green with and without the library installed)."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    px = list(img.getdata())
    return {
        "n_bytes": len(payload),
        "feat_mean": (sum(px) // len(px)) if px else 0,
    }


def resize_image_real(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize (requires Pillow), same binary-in/binary-out
    contract as :func:`resize_image_stub`: the output is the resized
    image's raw RGB tensor bytes (``tobytes`` — deterministic across
    runs, unlike re-encoding, whose compressed bytes can vary by
    encoder build), NEAREST resampling for integer-exact pixels."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
    return img.resize((width, height), PIL.Image.NEAREST).tobytes()


def extract_features(media: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over media blobs.

    mapInPandas so one Python worker call handles a whole Arrow batch;
    the blob column is consumed here and dropped from the output.
    ``decoder`` is any callable with the :func:`decode_image_stub`
    contract (``bytes -> {n_bytes, feat_mean}``); the deterministic
    stub is the default — pass :func:`decode_image_real` where Pillow
    is installed.
    """
    decoder = decoder or decode_image_stub

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feat_mean": payloads.map(
                        lambda b: decoder(b)["feat_mean"] if b is not None else 0
                    ),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), True),
        StructField("frame_digest", StringType(), True),
    ]
)


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize.  A real implementation would be::

        img = PIL.Image.open(io.BytesIO(payload)).resize((width, height))

    (PIL is not in this container).  The fake emits a deterministic
    payload derived from the input digest + target size so the
    plumbing (binary-in/binary-out through Arrow) is testable."""
    import hashlib

    if payload is None:
        raise NotImplementedError("real resize requires PIL — not available")
    return hashlib.sha256(payload + f"{width}x{height}".encode()).digest()


def resize_images(media: DataFrame, width: int, height: int, resizer=None) -> DataFrame:
    """Arrow-batched image resize: binary column in, binary column out,
    metadata updated.  The output payload is a thumbnail — orders of
    magnitude smaller than the source blob — so downstream shuffles and
    caches carry thumbnails, never originals.  ``resizer`` follows the
    :func:`resize_image_stub` contract (``(bytes, w, h) -> bytes``);
    pass :func:`resize_image_real` where Pillow is installed."""
    resizer = resizer or resize_image_stub

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(
                        lambda b: resizer(b, width, height) if b is not None else None
                    ),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(_resize, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one video row fans out to one row per
    sampled frame (``mapInPandas`` is a generator, so the fan-out never
    materializes a per-video frame list in memory).  Frame decode is
    STUBBED (no av/ffmpeg in the container) — the digest is a
    deterministic stand-in for the decoded frame tensor; row shape,
    timestamps, and partition flow are real."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_digest": []}
            for _, row in pdf.iterrows():
                # nullable longs arrive as NaN (truthy!) — `or 0` won't catch it
                dur = 0 if pd.isna(row["duration_ms"]) else int(row["duration_ms"])
                payload = row["payload"] if row["payload"] is not None else b""
                for idx, ts in enumerate(range(0, int(dur), every_ms)):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["frame_digest"].append(
                        hashlib.sha256(payload + idx.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(_sample, FRAME_SCHEMA)


def media_meta(media: DataFrame) -> DataFrame:
    """Blob-free metadata view — pure column expressions (the common
    fast path: no Python, blob column pruned at the parquet scan)."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("digest"),
        "width",
        "height",
    )
