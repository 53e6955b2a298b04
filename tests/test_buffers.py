"""Buffer primitives (buffers.go) vs scalar Go-port loops, and the
binary decode functions (decoder.go bytesToFloat64 / DecodeURL
analog)."""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import functions as F

from sonar_spark.functions.binary import bytes_to_float64
from sonar_spark.operators.buffers import (
    delay_line,
    delay_line_interpolated,
    overlap_add,
)


def _go_delay_line(xs, delay, size=64):
    """Line-for-line port of buffers.go:189-204 Process."""
    buf = [0.0] * size
    wp = 0
    out = []
    for x in xs:
        d = min(delay, size - 1)
        rp = (wp - d + size) % size
        out.append(buf[rp])
        buf[wp] = x
        wp = (wp + 1) % size
    return out


def _go_delay_interp(xs, delay, size=64):
    """Port of buffers.go:206-230 ProcessInterpolated."""
    buf = [0.0] * size
    wp = 0
    out = []
    for x in xs:
        d = min(delay, float(size - 1))
        intd = int(d)
        frac = d - intd
        rp1 = (wp - intd + size) % size
        rp2 = (wp - intd - 1 + size) % size
        out.append(buf[rp1] + frac * (buf[rp2] - buf[rp1]))
        buf[wp] = x
        wp = (wp + 1) % size
    return out


def _go_overlap_add(frames, W, H):
    """Port of buffers.go:260-291 AddFrame loop."""
    buf = [0.0] * W
    out = []
    for fr in frames:
        for i in range(W):
            buf[i] += fr[i]
        out.extend(buf[:H])
        if W - H > 0:
            buf = buf[H:] + [0.0] * H
        else:
            buf = [0.0] * W
    return out


def test_delay_line_matches_go(spark):
    rng = np.random.default_rng(7)
    xs = [float(x) for x in rng.integers(1, 20, size=40)]
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate(xs)],
        "doc_id long, pos long, v double",
    )
    got = {
        r["pos"]: (r["delayed"], r["di"])
        for r in delay_line_interpolated(
            delay_line(df, "v", 3, key="doc_id", order="pos"),
            "v", 2.5, key="doc_id", order="pos", out_col="di",
        ).collect()
    }
    want_d = _go_delay_line(xs, 3)
    want_i = _go_delay_interp(xs, 2.5)
    for i in range(len(xs)):
        assert got[i][0] == want_d[i], i
        assert abs(got[i][1] - want_i[i]) < 1e-12, i


def test_overlap_add_matches_go(spark):
    rng = np.random.default_rng(11)
    W, H = 16, 4
    xs = [float(x) for x in rng.integers(1, 9, size=37)]
    nf = (len(xs) - W) // H + 1
    frames = [
        [xs[f * H + j] * (j + 1) for j in range(W)] for f in range(nf)
    ]
    df = spark.createDataFrame(
        [(1, f, frames[f]) for f in range(nf)],
        "doc_id long, frame_idx long, window array<double>",
    )
    got = {
        r["pos"]: r["value"]
        for r in overlap_add(
            df, key="doc_id", frame_col="frame_idx",
            window_col="window", hop=H,
        ).collect()
    }
    want = _go_overlap_add(frames, W, H)
    assert len(got) == len(want) == nf * H
    for p, wv in enumerate(want):
        assert abs(got[p] - wv) < 1e-12, p


def test_bytes_to_float64_decoder_semantics():
    vals = [1.5, -2.25, 1e300, 0.0]
    raw = b"".join(struct.pack("<d", v) for v in vals)
    assert list(bytes_to_float64(raw)) == vals
    # trim to a multiple of 8 (decoder.go:851-854)
    assert list(bytes_to_float64(raw + b"\x01\x02\x03")) == vals
    # nil branches
    assert len(bytes_to_float64(b"")) == 0
    assert len(bytes_to_float64(b"\xff" * 7)) == 0
    assert len(bytes_to_float64(None)) == 0


def test_fetch_payloads_integrity_and_missing(spark, tmp_path):
    import hashlib

    from sonar_spark.functions.binary import fetch_payloads

    raw = struct.pack("<dd", 3.5, 4.5)
    p = tmp_path / "a.f64"
    p.write_bytes(raw)
    sha = hashlib.sha256(raw).hexdigest()
    rows = [
        (0, f"file://{p}", sha),                      # good
        (1, f"file://{p}", hashlib.sha256(b"x").hexdigest()),  # corrupt
        (2, f"file://{tmp_path}/missing.f64", sha),   # missing file
    ]
    df = spark.createDataFrame(
        rows, "media_id long, uri string, sha256 string"
    )
    got = {r["media_id"]: r for r in fetch_payloads(df).collect()}
    assert got[0]["ok"] and got[0]["n_samples"] == 2
    assert got[0]["mean"] == 4.0 and got[0]["first"] == 3.5
    assert not got[1]["ok"] and got[1]["mean"] is None
    assert not got[2]["ok"]
