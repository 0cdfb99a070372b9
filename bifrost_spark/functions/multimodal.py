"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the pattern for 100 TB multimodal training pipelines: Spark moves/filters/
groups bytes and metadata; decode and feature extraction run in Arrow-batched
``mapInPandas`` stages sized by bytes-per-batch, never per-row Python.

The actual codecs (PIL/ffmpeg/etc.) are NOT installed in this container, so
the decode kernels are stubbed: ``decode_stub=True`` produces deterministic
fake features (seeded from the content digest) with the REAL schema,
partitioning, UDF signature, and batch shape; passing ``decode_stub=False``
raises NotImplementedError at the exact point a codec would be called.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_digest", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def synthesize_media(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes) for
    exercising the plumbing at any scale — generated distributed, like the
    CDC generator."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.repeat(F.sha2(F.concat(F.col("media_id").cast("string"), F.lit(seed)), 256),
                 (F.pmod(F.xxhash64("media_id", F.lit(seed + 1)), F.lit(4)) + 1).cast("int")),
        "utf-8",
    )
    return df.select(
        "media_id",
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.when(kind == "image", (F.pmod(F.xxhash64("media_id", F.lit(3)), F.lit(1024)) + 64).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.xxhash64("media_id", F.lit(4)), F.lit(1024)) + 64).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(F.xxhash64("media_id", F.lit(5)), F.lit(60000)) + 1000).cast("int")).alias("duration_ms"),
        payload.alias("payload"),
    )


def extract_features(media: DataFrame, feature_dim: int = 8, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real deployment: replace the stub branch with the codec call (PIL /
    torchaudio / pyav); the Spark plan — repartition by size, Arrow batch
    exchange, output schema — is identical.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "install PIL/ffmpeg and implement the decode branch"
                )
            digests = pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b) if b is not None else b"").hexdigest()
            )
            feats = digests.map(
                lambda d: [int(d[i * 8 : i * 8 + 8], 16) / float(1 << 32) for i in range(feature_dim)]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                    "content_digest": digests,
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode per-frame rows (timestamps)
    from duration metadata — the distributed fan-out is real; the pixel
    decode would slot into extract_features."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.posexplode(frames).alias("frame_idx", "_"))
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("frame_ts_ms"))
    )
