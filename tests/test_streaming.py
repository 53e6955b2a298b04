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
