"""Streaming extension tests: incremental postings ≡ batch postings, and
watermarked windowed aggregation over a file-backed event stream."""

from __future__ import annotations

import pytest

from clip_as_service_spark import fixtures
from clip_as_service_spark.operators.tokenize import build_postings
from clip_as_service_spark.streaming import incremental
from pyspark.sql import functions as F


def _write_chunk(spark, rows, path):
    from clip_as_service_spark.fixtures import pages_spark_df

    df = spark.createDataFrame(rows, incremental.PAGES_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def _postings_set(df):
    return {
        (r["term"], r["doc_id"], r["tf"], r["dl"])
        for r in df.collect()
    }


def test_incremental_postings_match_batch(spark, tmp_path):
    pages = fixtures.make_pages(120)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp_dir = str(tmp_path / "cp")

    # micro-batch 1: first 80 pages
    _write_chunk(spark, pages[:80], in_dir)
    q = incremental.start_postings_stream(spark, in_dir, out_dir, cp_dir)
    q.awaitTermination(120)

    # micro-batch 2: remaining 40 pages, resume from checkpoint
    _write_chunk(spark, pages[80:], in_dir)
    q = incremental.start_postings_stream(spark, in_dir, out_dir, cp_dir)
    q.awaitTermination(120)

    batch = build_postings(
        spark.createDataFrame(pages, incremental.PAGES_SCHEMA).withColumn(
            "doc_id", F.xxhash64("url")
        )
    )
    assert _postings_set(spark.read.parquet(out_dir)) == _postings_set(batch)


def test_windowed_event_counts_stream(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.coalesce(1).write.mode("append").parquet(ev_dir)

    stream = (
        spark.readStream.schema(events.schema).parquet(ev_dir)
    )
    out = incremental.windowed_event_counts(stream, window="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["value_sum"], 6))
        for r in spark.sql("select * from win_counts").collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["value_sum"], 6))
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
        .collect()
    }
    # append mode with availableNow emits only watermark-closed windows;
    # every emitted window must match the batch aggregate exactly
    assert len(got) > 0
    for key, val in got.items():
        assert expected[key] == val
