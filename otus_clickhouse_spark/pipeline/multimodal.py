"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is real and tested; the actual media decode is
STUBBED (the image/audio libraries are not in this container) behind
``decode_stub`` — swap in PIL/torchaudio/ffmpeg in ``_decode_bytes`` on
a real cluster.

Scale design: media bytes ride in the same rows as metadata so a single
scan serves both; feature extraction is ``mapInPandas`` (Arrow-batched,
one Python worker per partition, no shuffle); byte-size accounting and
any pruning happen on the cheap metadata columns BEFORE the expensive
decode, so predicate pushdown skips whole row-groups of bytes.
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
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("data", T.BinaryType(), True),  # opaque payload
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int")).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        (F.col("id") * 33).cast("long").alias("duration_ms"),
        F.encode(F.repeat(F.concat(F.lit("blob-"), F.col("id").cast("string")), 8), "utf-8").alias("data"),
    )
    return df


def _decode_bytes(kind: str, data: bytes) -> list[float]:
    """STUB decode: real impl would PIL-open / resample / frame-sample.

    Deterministic fake feature so tests can assert the full pipeline.
    """
    if data is None:
        raise NotImplementedError("media decode requires image/audio libs not in this container")
    # fake 4-dim feature from byte stats — stands in for a real embedding
    n = len(data)
    s = sum(data[:64])
    return [float(n), float(s % 251), float(data[0]), float(data[-1])]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched, partition-local)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(k, d) if d is not None else None
                for k, d in zip(pdf["kind"], pdf["data"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(d) if d is not None else None for d in pdf["data"]],
                    "feature": feats,
                }
            )

    # prune to needed columns BEFORE the Python boundary: Arrow ships 4 cols
    return media.select("media_id", "kind", "data").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame ts.

    The ts grid is computed JVM-side (sequence/explode); only the decode
    of selected frames would cross into Python on a real cluster.
    """
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
