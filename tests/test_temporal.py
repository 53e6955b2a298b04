"""Tempo/attack-decay/envelope operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sonar_spark.operators.temporal import attack_decay, envelope, tempo_estimate


def test_tempo_dominant_ioi(spark):
    # onsets at regular period 4 with one irregular extra
    rows = [("d1", i) for i in (0, 4, 8, 12, 16, 18)] + [
        ("d2", i) for i in (0, 7, 14)
    ]
    onsets = spark.createDataFrame(rows, "doc_id string, frame_idx long")
    got = {r["doc_id"]: r for r in tempo_estimate(onsets).collect()}
    assert got["d1"]["dominant_ioi"] == 4
    assert got["d1"]["n_onsets"] == 6
    assert abs(got["d1"]["tempo"] - 0.25) < 1e-12
    assert got["d2"]["dominant_ioi"] == 7
    assert abs(got["d2"]["onset_density"] - 3 / 14) < 1e-12


def test_tempo_tie_breaks_to_smallest(spark):
    rows = [("d", i) for i in (0, 2, 4, 9, 14)]  # IOIs: 2,2,5,5
    onsets = spark.createDataFrame(rows, "doc_id string, frame_idx long")
    got = tempo_estimate(onsets).collect()[0]
    assert got["dominant_ioi"] == 2


def test_attack_decay(spark):
    # triangle pulse: rises to peak at frame 5, falls after
    vals = [0.1, 0.1, 0.2, 0.5, 0.8, 1.0, 0.7, 0.4, 0.2, 0.1]
    feats = spark.createDataFrame(
        [("d", i, v) for i, v in enumerate(vals)],
        "doc_id string, frame_idx long, rms_energy double",
    )
    peaks = spark.createDataFrame(
        [("d", 5, 1.0)], "doc_id string, frame_idx long, rms_energy double"
    )
    r = attack_decay(feats, peaks, level=0.5).collect()[0]
    # last frame <= 0.5 before peak: frame 3 (0.5) -> attack 2
    assert r["attack_frames"] == 2
    # first frame <= 0.5 after peak: frame 7 (0.4) -> decay 2
    assert r["decay_frames"] == 2


def test_attack_decay_no_crossing_is_null(spark):
    feats = spark.createDataFrame(
        [("d", i, 1.0) for i in range(6)],
        "doc_id string, frame_idx long, rms_energy double",
    )
    peaks = spark.createDataFrame(
        [("d", 3, 1.0)], "doc_id string, frame_idx long, rms_energy double"
    )
    r = attack_decay(feats, peaks, level=0.5).collect()[0]
    assert r["attack_frames"] is None and r["decay_frames"] is None


def test_envelope_smooths(spark):
    feats = spark.createDataFrame(
        [("d", i, float(i % 2)) for i in range(10)],
        "doc_id string, frame_idx long, rms_energy double",
    )
    env = envelope(feats, smooth_k=2).collect()
    mid = [r["envelope"] for r in env if 2 <= r["frame_idx"] <= 7]
    assert all(0.3 < v < 0.7 for v in mid)
