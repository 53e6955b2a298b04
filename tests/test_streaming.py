"""Streaming/batch equivalence: the same transform over the same rows
must agree between a batch run and an availableNow stream run."""

from __future__ import annotations

import pytest

import os
import shutil

from sonar_spark.streaming.windows import sessionize_stream, windowed_stats_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """FileStreamSource needs a directory; stage the events file."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def _run_stream(spark, transform, src_dir, schema, name):
    stream = (
        spark.readStream.schema(schema).parquet(src_dir)
    )
    out = transform(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def _norm(df, keys):
    return sorted(
        (tuple(r[k] for k in keys) for r in df.collect()),
    )


def test_windowed_stats_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    schema = batch.schema
    res_batch = windowed_stats_stream(batch)
    res_stream = _run_stream(
        spark, windowed_stats_stream, events_dir, schema, "ws"
    )
    keys = ["window_start", "event_type", "n_events", "sum_value"]
    assert _norm(res_batch, keys) == _norm(res_stream, keys)
    assert res_batch.count() > 10


def test_sessionize_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(f"{SF}/events.parquet")
    schema = batch.schema
    res_batch = sessionize_stream(batch)
    res_stream = _run_stream(
        spark, sessionize_stream, events_dir, schema, "sess"
    )
    keys = ["user_id", "session_start", "n_events"]
    assert _norm(res_batch, keys) == _norm(res_stream, keys)
    assert res_batch.count() > 10


def test_dedup_stream_equals_batch(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) keeps
    exactly one row per fingerprint and the kept fingerprint set
    equals the batch dedup's."""
    from pyspark.sql import functions as F

    from sonar_spark.functions.text import doc_fingerprint
    from sonar_spark.streaming.windows import dedup_stream

    base = spark.read.parquet(f"{SF}/documents.parquet")
    # plant exact duplicates (same text, later doc_id/ts)
    dups = base.where(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 900000
    )
    docs = base.unionByName(dups).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id").cast("double") % 1000),
    )
    src = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    fp = doc_fingerprint(F.col("text"))
    batch_kept = dedup_stream(spark.read.parquet(src), fp)

    # append-mode sink: dropDuplicatesWithinWatermark emits rows as
    # they are first seen
    stream = spark.readStream.schema(schema).parquet(src)
    out = dedup_stream(stream, fp)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream_kept = spark.table("dedup")

    def fps(df):
        return sorted(
            r["fp"] for r in df.select(fp.alias("fp")).distinct().collect()
        )

    assert fps(batch_kept) == fps(stream_kept)
    # one row per fingerprint on both sides
    assert batch_kept.count() == len(fps(batch_kept))
    assert stream_kept.count() == len(fps(stream_kept))
    # dedup actually removed something (corpus has exact dups)
    assert batch_kept.count() < spark.read.parquet(src).count()
