"""Multimodal column handling (north star).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
partition flow — is real and tested.  Image decode/resize has a REAL
dependency-free path for PNG (the stdlib codec in ``functions.png``:
zlib inflate + scanline unfiltering), with Pillow as the optional
any-format twin producing identical outputs (pinned in tests where
importable).  ``decode_image_stub`` remains as the deterministic fake
for non-image blobs and the oracle-expressible registry entries;
audio/video decode stays stubbed (no codecs reachable from stdlib).

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


def decode_image_stdlib(payload: bytes) -> dict:
    """REAL image decode with no media libraries: the pure-stdlib PNG
    codec (``functions.png`` — zlib inflate + scanline unfiltering)
    or, since round 5, the baseline JPEG codec (``functions.jpeg`` —
    T.81 marker parse, huffman, IDCT) selected by magic-byte sniff.
    Grayscale via Pillow's exact ITU-R 601-2 integer formula on PNG
    (JPEG grayscale IS the luma plane), so this and
    :func:`decode_image_pil` return IDENTICAL features on any
    supported input (pinned in tests where Pillow is importable).
    Output contract of :func:`decode_image_stub`:
    ``{n_bytes, feat_mean}``, ``feat_mean`` the floor-mean luma."""
    from aprs2influxdb_spark.functions.jpeg import decode_jpeg_gray, is_jpeg
    from aprs2influxdb_spark.functions.png import decode_png, to_gray

    if is_jpeg(payload):
        _w, _h, luma = decode_jpeg_gray(payload)
    else:
        w, h, mode, px = decode_png(payload)
        luma = to_gray(mode, px)
    return {
        "n_bytes": len(payload),
        "feat_mean": (sum(luma) // len(luma)) if luma else 0,
    }


def decode_image_pil(payload: bytes) -> dict:
    """Pillow-backed decode, same contract — the cross-check twin of
    :func:`decode_image_stdlib` (and the path that also reads JPEG
    etc.).  Raises ``ImportError`` without Pillow."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    px = list(img.getdata())
    return {
        "n_bytes": len(payload),
        "feat_mean": (sum(px) // len(px)) if px else 0,
    }


def decode_image_real(payload: bytes) -> dict:
    """REAL image decode: Pillow when importable (any format), else
    the stdlib PNG codec — so in THIS container a real PNG blob gets
    real features (inflate + unfilter + luma), not the stub fake.
    Both paths emit identical values for supported PNGs; non-PNG
    payloads without Pillow raise ``ValueError`` loudly."""
    if pil_available():
        return decode_image_pil(payload)
    return decode_image_stdlib(payload)


def resize_image_stdlib(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize with no dependencies: stdlib PNG decode → flat RGB
    → NEAREST resample with Pillow's center-sampling source mapping —
    output is the raw ``width*height*3`` RGB tensor, byte-identical
    to :func:`resize_image_pil` on supported PNGs (pinned where
    Pillow is importable)."""
    from aprs2influxdb_spark.functions.png import decode_png, resize_nearest_rgb, to_rgb

    w, h, mode, px = decode_png(payload)
    return resize_nearest_rgb(to_rgb(mode, px), w, h, width, height)


def resize_image_pil(payload: bytes, width: int, height: int) -> bytes:
    """Pillow-backed resize twin: raw RGB tensor out (``tobytes`` —
    deterministic across runs, unlike re-encoding, whose compressed
    bytes can vary by encoder build), NEAREST resampling for
    integer-exact pixels.  Raises ``ImportError`` without Pillow."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
    return img.resize((width, height), PIL.Image.NEAREST).tobytes()


def resize_image_real(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize: Pillow when importable, else the stdlib PNG path —
    identical output either way for supported PNGs."""
    if pil_available():
        return resize_image_pil(payload, width, height)
    return resize_image_stdlib(payload, width, height)


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
