"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

A media item is two columns:
- ``content``: BinaryType payload (or a storage URI for out-of-line blobs)
- ``media_meta``: typed struct (modality, format, width/height,
  sample_rate/channels, duration_ms, n_bytes)

The Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shapes, UDF signatures — is real and tested. The codec step itself is
STUBBED: this container has no image/audio libraries, so ``decode_*`` either
raises ``NotImplementedError`` (``codec="real"``) or runs a deterministic
fake codec (``codec="fake"``, derives pixel/sample statistics from the bytes
by hashing) that exercises the full distributed path.

At 100 TB: keep payloads out-of-line (parquet stores a URI; executors fetch
from object storage inside mapInPandas), keep batches small
(``spark.sql.execution.arrow.maxRecordsPerBatch``) because rows are MBs, and
partition by (modality, format) so codec-specific stages don't shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("modality", T.StringType(), False),      # image|audio|video
    T.StructField("format", T.StringType(), True),         # png|jpg|wav|mp4...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_pixel", T.DoubleType(), True),
    T.StructField("phash", T.StringType(), True),
])

AUDIO_FEATURES = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("rms", T.DoubleType(), True),
])


def attach_fake_media(df: DataFrame, id_col: str = "doc_id",
                      modality: str = "image") -> DataFrame:
    """Synthesize a deterministic binary payload + metadata per row (for
    tests and fixtures): content = md5-expanded bytes of the id, metadata
    derived from the id. Entirely JVM-side."""
    seed = F.md5(F.col(id_col).cast("string"))
    content = F.to_binary(F.repeat(seed, 8), F.lit("hex"))
    width = (F.abs(F.xxhash64(F.col(id_col))) % 64 + 16).cast("int")
    height = (F.abs(F.xxhash64(F.col(id_col), F.lit(1))) % 64 + 16).cast("int")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit("fake").alias("format"),
        width.alias("width"),
        height.alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        F.lit(1).cast("int").alias("channels"),
        (F.abs(F.xxhash64(F.col(id_col), F.lit(2))) % 60000).cast("long")
        .alias("duration_ms"),
        F.octet_length(F.repeat(seed, 8)).cast("long").alias("n_bytes"),
    )
    return df.withColumn("content", content).withColumn("media_meta", meta)


def _fake_image_stats(payload: bytes) -> tuple[float, str]:
    """Deterministic stand-in for decode: mean byte value and a hex 'phash'."""
    import hashlib

    mean = sum(payload) / len(payload) if payload else 0.0
    return mean, hashlib.md5(payload).hexdigest()[:16]


def decode_images(df: DataFrame, id_col: str = "doc_id",
                  codec: str = "fake") -> DataFrame:
    """Decode image payloads to features via mapInPandas.

    ``codec="real"`` raises NotImplementedError (no PIL/opencv in this
    container — wire the real decode in the marked spot); ``codec="fake"``
    derives deterministic stats from the raw bytes so the distributed path
    (Arrow batches in, feature batches out) is fully exercised.
    """
    if codec == "real":
        raise NotImplementedError(
            "real image decode requires PIL/opencv; install and replace "
            "_fake_image_stats with Image.open(io.BytesIO(payload))"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": pdf["media_meta"].map(lambda m: m["width"]),
                "height": pdf["media_meta"].map(lambda m: m["height"]),
            })
            stats = pdf["content"].map(lambda b: _fake_image_stats(bytes(b or b"")))
            out["mean_pixel"] = stats.map(lambda s: s[0])
            out["phash"] = stats.map(lambda s: s[1])
            yield out.astype({"width": "int32", "height": "int32"})

    return df.select(id_col, "content", "media_meta").mapInPandas(
        decode_batches, schema=IMAGE_FEATURES
    )


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id", codec: str = "fake") -> DataFrame:
    """Resize stub: real codec not available; fake mode rewrites metadata and
    re-hashes content deterministically, preserving the binary column shape."""
    if codec == "real":
        raise NotImplementedError("real resize requires an image library")
    meta = F.col("media_meta")
    new_meta = F.struct(
        meta["modality"].alias("modality"),
        meta["format"].alias("format"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        meta["sample_rate"].alias("sample_rate"),
        meta["channels"].alias("channels"),
        meta["duration_ms"].alias("duration_ms"),
        meta["n_bytes"].alias("n_bytes"),
    )
    resized = F.to_binary(
        F.md5(F.concat(F.base64(F.col("content")),
                       F.lit(f":{width}x{height}"))), F.lit("hex")
    )
    return df.withColumn("media_meta", new_meta).withColumn("content", resized)


def sample_video_frames(df: DataFrame, every_ms: int = 1000,
                        id_col: str = "doc_id", codec: str = "fake") -> DataFrame:
    """Frame-sampling stub: one output row per sampled timestamp — the
    explode shape a real ffmpeg-backed sampler would produce."""
    if codec == "real":
        raise NotImplementedError("real frame sampling requires ffmpeg")
    ts = F.explode(
        F.sequence(F.lit(0),
                   F.greatest(F.col("media_meta")["duration_ms"] - 1, F.lit(0)),
                   F.lit(every_ms))
    ).alias("frame_ms")
    frame = F.to_binary(
        F.md5(F.concat(F.base64(F.col("content")), F.lit(":"),
                       F.col("frame_ms").cast("string"))), F.lit("hex"))
    return (
        df.select(F.col(id_col), F.col("content"), F.col("media_meta"), ts)
        .select(id_col, "frame_ms", frame.alias("frame"))
    )
