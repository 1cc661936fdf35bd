"""Structured Streaming extension (SURVEY.md §2.9/§7): incremental page
ingest → postings appends, plus event-time windowed aggregation with
watermarks.

The reference's streaming is transport-level (bounded in-flight request
batches, client.py:305 `prefetch`); its *index* lifecycle is append-only —
`/index` adds docs to AnnLite shards incrementally (retriever.md:54-62).
This module is the table-level re-expression: a stream of new pages appends
(term, doc_id, tf, dl) rows; the block build (index_build stage 4) runs as a
periodic compaction over the accumulated postings — the classic
log-structured / merge-on-read index pattern.

Backpressure analog of `prefetch`: `maxFilesPerTrigger` bounds each
micro-batch. doc_id must be assigned content-deterministically (xxhash64 of
url) — a global row_number doesn't exist in a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.tokenize import build_postings

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_postings(
    pages_stream: DataFrame,
    dedup_urls: bool = True,
    watermark: str = "1 hour",
) -> DataFrame:
    """pages stream → postings rows; optional stateful URL dedup.

    dropDuplicates on url with a warc_ts watermark = the stream analog of
    the build's unique-doc assumption (state is bounded by the watermark)."""
    s = pages_stream
    if dedup_urls:
        s = s.withWatermark("warc_ts", watermark).dropDuplicates(["url"])
    with_ids = s.withColumn("doc_id", F.xxhash64(F.col("url")))
    return build_postings(with_ids)


def start_postings_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """incremental pages → append-only postings parquet. Returns the query."""
    postings = stream_postings(
        read_pages_stream(spark, input_dir, max_files_per_trigger),
        dedup_urls=False,  # file-source batches are already unique in tests
    )
    writer = (
        postings.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """event-time tumbling window counts with late-data handling."""
    # watermarks require session-tz TIMESTAMP; parquet NTZ timestamps cast
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
