"""Materialized views: per-insert-block transform pipelines.

Reference semantics (lectures/lecture_09.md:668-744, lecture_13.md:7-24):
an MV is an INSERT trigger — each inserted block is transformed and
appended to the target table; it does NOT merge with existing target
data (lecture_09.md:676-677). That is exactly Structured Streaming's
append mode per micro-batch, or ``foreachBatch`` for batch-ish flows.

Batch MVs here: ``MaterializedView.process_block(block)`` transforms one
inserted block and appends to the target — composable into cascades
(clusters/ch_and_kafka/db/init.sql:46-79 raw→parsed→out pattern).
Streaming MVs: ``attach_stream`` wires readStream → transform →
writeStream with a checkpoint.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class MaterializedView:
    name: str
    transform: Callable[[DataFrame], DataFrame]
    sink: Callable[[DataFrame], None]  # append a transformed block to the target
    cascades: list["MaterializedView"] = field(default_factory=list)
    # landing table name (when the sink appends to an engine table) —
    # lets the streaming attach enumerate every table an epoch touches
    # for its exactly-once commit/rollback protocol
    target: str | None = None

    def process_block(self, block: DataFrame) -> DataFrame:
        """Push one inserted block through the MV (per-block semantics —
        aggregation applies only to this block, lecture_13.md:7-24)."""
        out = self.transform(block)
        self.sink(out)
        for mv in self.cascades:
            mv.process_block(out)
        return out

    def attach_stream(self, stream: DataFrame, path: str, checkpoint: str, fmt: str = "parquet"):
        """Wire this MV to a streaming source (Kafka-engine pattern T1)."""
        out = self.transform(stream)
        return (
            out.writeStream.format(fmt)
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .start()
        )


def kafka_source(
    spark,
    brokers: str,
    topic: str,
    starting: str = "earliest",
    maxOffsetsPerTrigger: str | None = None,
) -> DataFrame:
    """Kafka engine table (consumer) — lecture_09.md:891-918.

    Exposes the same virtual columns the CH Kafka engine does
    (_topic/_partition/_offset/_timestamp — init.sql:24-30).
    ``maxOffsetsPerTrigger`` bounds a micro-batch so attaching over a
    deep backlog never materializes it in one trigger (r7 verdict).
    Requires the spark-sql-kafka package on the cluster; this container
    has no Kafka, so tests exercise the MV path with file/memory sources.
    """
    from pyspark.sql import functions as F

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
    )
    if maxOffsetsPerTrigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
    raw = reader.load()
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
        F.col("timestamp").alias("_timestamp"),
    )


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """Kafka engine table (producer) — homeworks/hw17.md:12,42-45."""
    from pyspark.sql import functions as F

    return (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def tumbling_window_agg(stream: DataFrame, ts_col: str, window: str, watermark: str, *aggs):
    """T4/T5: event-time tumbling window with watermark for late data.

    The reference handles lateness via versioned upserts (lecture_07.md:
    551-560); watermarks are the idiomatic-Spark superset (SURVEY.md T5/T6).
    """
    from pyspark.sql import functions as F

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*aggs)
    )
