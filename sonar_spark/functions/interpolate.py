"""Fractional-index interpolation family
(algorithms/common/interpolation.go) as pure Catalyst expressions —
linear (:46-66), Catmull-Rom cubic (:69-104), Hermite (:107-149),
Lanczos a=3 (:152-192), plus ResampleSignal (:195-215),
UpsampleSignal (:218-245, the as-written zero-stuff semantics) and
DownsampleSignal decimation (:248-265).

Every method is a closed form over at most 6 neighbours, so the whole
family stays JVM-side (no UDFs): per-point interpolation is a CASE
tree over element_at, and signal-level resampling is a transform()
over a generated index sequence.  Boundary behaviour is reproduced
branch-for-branch, including the Go's truncating int() index, the
cubic/hermite <4-point fallback to linear, the Lanczos <6-point
fallback to cubic, and upsample's trailing block staying zero when
the next anchor falls outside the buffer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _at(data: Column, i0) -> Column:
    """0-based element access over a 1-based array column."""
    if isinstance(i0, int):
        return F.element_at(data, i0 + 1)
    return F.element_at(data, (i0 + 1).cast("int"))


def _linear(data: Column, idx: Column, n: Column) -> Column:
    i = F.floor(idx)  # idx > 0 in this branch -> trunc == floor
    frac = idx - i
    return (
        F.when(n == 0, F.lit(0.0))
        .when(idx <= 0, _at(data, F.lit(0)))
        .when(idx >= (n - 1).cast("double"), F.element_at(data, n))
        .when(i >= n - 1, F.element_at(data, n))
        .otherwise(_at(data, i) + frac * (_at(data, i + 1) - _at(data, i)))
    )


def _clamped_i(idx: Column, n: Column) -> Column:
    i = F.floor(idx)
    i = F.when(i < 1, F.lit(1).cast("bigint")).otherwise(i)
    return F.when(i >= n - 2, (n - 3).cast("bigint")).otherwise(i)


def _cubic(data: Column, idx: Column, n: Column) -> Column:
    i = _clamped_i(idx, n)
    frac = idx - F.floor(idx)
    y0, y1, y2, y3 = (_at(data, i - 1), _at(data, i),
                      _at(data, i + 1), _at(data, i + 2))
    a0 = -0.5 * y0 + 1.5 * y1 - 1.5 * y2 + 0.5 * y3
    a1 = y0 - 2.5 * y1 + 2 * y2 - 0.5 * y3
    a2 = -0.5 * y0 + 0.5 * y2
    a3 = y1
    val = a0 * frac * frac * frac + a1 * frac * frac + a2 * frac + a3
    return (
        F.when(n < 4, _linear(data, idx, n))
        .when(
            idx <= 1,
            _at(data, F.floor(F.greatest(idx, F.lit(0.0)))),
        )
        .when(idx >= (n - 2).cast("double"), F.element_at(data, n))
        .otherwise(val)
    )


def _hermite(data: Column, idx: Column, n: Column) -> Column:
    i = _clamped_i(idx, n)
    t = idx - F.floor(idx)
    y0, y1, y2, y3 = (_at(data, i - 1), _at(data, i),
                      _at(data, i + 1), _at(data, i + 2))
    m0 = 0.5 * (y2 - y0)
    m1 = 0.5 * (y3 - y1)
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    val = h00 * y1 + h10 * m0 + h01 * y2 + h11 * m1
    return (
        F.when(n < 4, _linear(data, idx, n))
        .when(
            idx <= 1,
            _at(data, F.floor(F.greatest(idx, F.lit(0.0)))),
        )
        .when(idx >= (n - 2).cast("double"), F.element_at(data, n))
        .otherwise(val)
    )


def _lanczos(data: Column, idx: Column, n: Column) -> Column:
    a = 3
    i = F.floor(idx)
    terms = None
    for off in range(-a + 1, a + 1):  # j = i-2 .. i+3, ascending
        j = i + off
        x = idx - j.cast("double")
        px = math.pi * x
        w = (
            F.when(F.abs(x) < 1e-10, F.lit(1.0))
            .when(F.abs(x) >= float(a), F.lit(0.0))
            .otherwise(
                (a * F.sin(px) * F.sin(px / a)) / (px * px)
            )
        )
        t = _at(data, j) * w
        terms = t if terms is None else terms + t
    return (
        F.when(n < 6, _cubic(data, idx, n))
        .when(i < a, _at(data, F.lit(0)))
        .when(i >= n - a, F.element_at(data, n))
        .otherwise(terms)
    )


_METHODS = {
    "linear": _linear,
    "cubic": _cubic,
    "hermite": _hermite,
    "lanczos": _lanczos,
}


def interpolate_at(
    data: Column, index: Column, method: str = "linear"
) -> Column:
    """Interpolator.Interpolate at a fractional index
    (interpolation.go:30-43 dispatch)."""
    data = F.transform(data, lambda x: x.cast("double"))
    return _METHODS[method](data, index.cast("double"), F.size(data))


def resample_signal(
    data: Column,
    original_rate: int,
    target_rate: int,
    method: str = "linear",
) -> Column:
    """ResampleSignal (:195-215): new length = int(len/ratio), output
    i interpolated at source index i*ratio.  Returns an array
    column."""
    ratio = float(original_rate) / float(target_rate)
    d = F.transform(data, lambda x: x.cast("double"))
    n = F.size(d)
    nl = F.floor(n.cast("double") / ratio).cast("int")
    return F.when(nl <= 0, F.array().cast("array<double>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), nl - 1),
            lambda i: _METHODS[method](
                d, i.cast("double") * ratio, n
            ),
        )
    )


def upsample_signal(data: Column, factor: int) -> Column:
    """UpsampleSignal (:218-245) as written: zero-stuff then linear
    fill between anchors; positions whose NEXT anchor falls outside
    the buffer stay zero (the trailing block), and a genuine 0.0
    anchor survives because its fill interpolates from itself with
    frac 0."""
    d = F.transform(data, lambda x: x.cast("double"))
    n = F.size(d)
    total = n * factor

    def val(i):
        anchor = _at(d, F.floor(i / factor))
        prev = F.floor(i / factor) * factor
        nxt = prev + factor
        frac = (i - prev).cast("double") / float(factor)
        nxt_anchor = _at(d, F.floor(nxt / factor))
        fill = anchor + frac * (nxt_anchor - anchor)
        return (
            F.when(i % factor == 0, anchor)
            .when(nxt < total, fill)
            .otherwise(F.lit(0.0))
        )

    return F.transform(F.sequence(F.lit(0), total - 1), val)


def downsample_signal(data: Column, factor: int) -> Column:
    """DownsampleSignal (:248-265): plain stride-`factor` decimation
    (the Go notes the missing anti-alias filter itself)."""
    d = F.transform(data, lambda x: x.cast("double"))
    n = F.size(d)
    nl = F.floor(n / factor).cast("int")
    return F.when(nl <= 0, F.array().cast("array<double>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), nl - 1), lambda i: _at(d, i * factor)
        )
    )


def bilinear_interpolate(
    data: Column, x: Column, y: Column
) -> Column:
    """2-D bilinear interpolation over an array<array<double>> grid
    (interpolation.go:291-340): coordinates clamped to the grid,
    truncating integer corners, the exact r1/r2 lerp composition.
    data[y][x] row-major as the Go indexes it."""
    d = F.transform(
        data, lambda row: F.transform(row, lambda v: v.cast("double"))
    )
    rows = F.size(d)
    cols = F.size(F.element_at(d, 1))
    xc = F.least(
        F.greatest(x.cast("double"), F.lit(0.0)),
        (cols - 1).cast("double"),
    )
    yc = F.least(
        F.greatest(y.cast("double"), F.lit(0.0)),
        (rows - 1).cast("double"),
    )
    x1 = F.floor(xc)
    y1 = F.floor(yc)
    x2 = F.least(x1 + 1, (cols - 1).cast("bigint"))
    y2 = F.least(y1 + 1, (rows - 1).cast("bigint"))
    fx = xc - x1
    fy = yc - y1

    def at(r, c):
        return F.element_at(
            F.element_at(d, (r + 1).cast("int")), (c + 1).cast("int")
        )

    q11, q12 = at(y1, x1), at(y2, x1)
    q21, q22 = at(y1, x2), at(y2, x2)
    r1 = q11 + fx * (q21 - q11)
    r2 = q12 + fx * (q22 - q12)
    return F.when(
        (rows == 0) | (cols == 0), F.lit(0.0)
    ).otherwise(r1 + fy * (r2 - r1))
