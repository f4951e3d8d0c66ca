"""Structured Streaming runtime helpers over the events fixture.

Beyond-reference surface, flagged as such (SURVEY.md §2.10): Presto
0.235 has no event-time streaming — presto-kafka scans topics as batch
tables (reference presto-kafka/.../KafkaRecordSet.java:52). Our
streaming layer is native Structured Streaming: file source ->
watermark -> windowed/stateful ops -> sink.

Test harness shape: each streaming query runs with
Trigger.AvailableNow against the static events parquet and lands in a
memory sink, so the same builder contract (spark, sf_dir) -> batch
DataFrame holds and the DuckDB oracle can replay the equivalent batch
SQL. In production the identical pipeline reads
`spark.readStream.format("kafka")` and writes a real sink — only the
source/sink lines change.

Scale notes:
  - Windowed aggregations shuffle on (window, key) — uniform unless a
    key is hot; watermarks bound state size (state store per key ×
    open windows only).
  - File-source streaming at 100 TB: maxFilesPerTrigger bounds batch
    size; checkpointLocation (omitted here — memory sink) gives
    exactly-once.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_0_235_spark.session import ensure_session_defaults


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a stream: parquet file source with the batch schema
    (explicit — streaming sources never infer), ts restored to LTZ
    TimestampType exactly as catalog.load_table does (withWatermark
    rejects TIMESTAMP_NTZ event-time columns)."""
    from presto_0_235_spark.catalog import normalize_events_ts

    ensure_session_defaults(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source wants a directory or glob, not a bare
    # file path (basePath must be a directory).
    raw = spark.readStream.schema(schema).parquet(f"{sf_dir}/events*.parquet")
    return normalize_events_ts(raw)


def run_to_batch(
    stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion (AvailableNow) into
    a memory sink; return the settled result as a batch DataFrame.

    complete mode for aggregations: with a bounded replay the
    watermark stops short of the last windows, and append mode would
    hold them back as "still open" — complete emits every window's
    final state at termination, which is what the batch oracle
    computes. append mode is for row-level ops (dedup)."""
    name = f"stream_result_{uuid.uuid4().hex[:12]}"
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)
