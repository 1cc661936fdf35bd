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


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization across MULTIPLE micro-batches
    (maxFilesPerTrigger=1 over time-ordered files): every emitted (closed)
    session must equal the batch sessionizer's output; the per-user OPEN
    tail session is the only difference (a stream never sees the end)."""
    ev_dir = str(tmp_path / "ev_sess")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "value"
    )
    # three time-ordered files -> three micro-batches; cross-batch sessions
    # exercise the carried state (continue, close, splice)
    rows = sorted(events.collect(), key=lambda r: (r["ts"], r["event_id"]))
    n = len(rows)
    for i, chunk in enumerate([rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]):
        spark.createDataFrame(chunk, events.schema).coalesce(1).write.mode(
            "append"
        ).parquet(ev_dir)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    out = incremental.sessionize_stream(stream, gap_sec=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], round(r["value_sum"], 6))
        for r in spark.sql("select * from sessions").collect()
    }

    from clip_as_service_spark.plans.driver_queries import q_events_sessionize

    batch = {}
    last_sid = {}
    for r in q_events_sessionize(spark, "/root/testdata/sf0.001").collect():
        batch[(r["user_id"], r["session_id"])] = (
            r["n_events"], round(r["value_sum"], 6),
        )
        last_sid[r["user_id"]] = max(last_sid.get(r["user_id"], 0), r["session_id"])

    expected_closed = {
        k: v for k, v in batch.items() if k[1] != last_sid[k[0]]
    }
    assert got == expected_closed
    assert len(got) > 0
