"""Distributed reproduction of the reference's 8 percentile methods
(stats/percentiles.go:198-404) as order-statistic lookups — no
per-group arrays: one sort shuffle (row_number window) + one
aggregation; the fractional rank h is computed from the group size
and the needed order statistics are picked with max(when(rn == k)).

The reference's own labels deviate from the textbook Hyndman-Fan
numbers — see kernels._PCT_H; the arithmetic here matches the Go
code exactly, including its "linear" (claimed R-6, actually R-7
h=(n-1)q+1), "median_unbiased" h=(n+1)/3+(n-1)q/3 and
"normal_unbiased" h=n/4+0.25+q(n+0.5) forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..kernels import PERCENTILE_METHODS

__all__ = ["PERCENTILE_METHODS", "percentile_methods"]


def _h_expr(method: str, n: Column, q: float) -> Column:
    if method in ("linear", "r_default"):
        return (n - 1) * q + 1.0
    if method in ("lower", "higher", "midpoint", "weighted"):
        return n * q
    if method == "median_unbiased":
        return (n + 1) / 3.0 + (n - 1) / 3.0 * q
    if method == "normal_unbiased":
        return n / 4.0 + 0.25 + q * (n + 0.5)
    raise ValueError(method)


def _value_at(rn: Column, v: Column, k: Column) -> Column:
    """Order statistic v@k (1-based) inside an aggregation."""
    return F.max(F.when(rn == k, v))


def _method_value(method: str, rn, v, n, q: float) -> Column:
    # boundary order statistics: data[0] == min, data[n-1] == max
    h = _h_expr(method, n, q)
    fl = F.floor(h)
    first, last = F.min(v), F.max(v)
    if method == "lower":  # percentiles.go:258-273
        k = F.least(F.ceil(h), n.cast("long"))
        return F.when(F.max(h) <= 1.0, first).otherwise(_value_at(rn, v, k))
    if method == "higher":  # percentiles.go:275-290
        k = F.least(fl + 1, n.cast("long"))
        return F.when(F.max(h) < 1.0, first).otherwise(_value_at(rn, v, k))
    lo = _value_at(rn, v, fl)
    hi = _value_at(rn, v, F.ceil(h))
    if method == "midpoint":  # percentiles.go:292-311
        mid = (lo + hi) / 2.0
        return (
            F.when(F.max(h) <= 1.0, first)
            .when(F.max(h) >= F.max(n), last)
            .otherwise(mid)
        )
    # linear / weighted / r_default / median_unbiased / normal_unbiased:
    # data[lo] + frac * (data[hi] - data[lo])
    frac = F.max(h - fl)
    interp = lo + frac * (hi - lo)
    return (
        F.when(F.max(h) <= 1.0, first)
        .when(F.max(h) >= F.max(n), last)
        .otherwise(interp)
    )


def percentile_methods(
    df: DataFrame,
    value: str,
    group: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    methods: tuple[str, ...] = PERCENTILE_METHODS,
) -> DataFrame:
    """(group, method, q, value) for every method x quantile.

    Physical plan: one sort shuffle (row_number over the group), one
    hash aggregation; every order statistic is a max(when(rn == k))
    — nothing collects per-group arrays, so group cardinality is
    unbounded."""
    wo = Window.partitionBy(group).orderBy("__v")
    wp = Window.partitionBy(group)
    d = (
        df.select(group, F.col(value).cast("double").alias("__v"))
        .withColumn("__rn", F.row_number().over(wo))
        .withColumn("__n", F.count("*").over(wp).cast("double"))
    )
    rn, v, n = F.col("__rn"), F.col("__v"), F.col("__n")
    aggs = []
    for m in methods:
        for q in qs:
            aggs.append(
                _method_value(m, rn, v, n, q).alias(f"__{m}__{q}")
            )
    wide = d.groupBy(group).agg(*aggs)
    stack_args = []
    for m in methods:
        for q in qs:
            stack_args.append(f"'{m}', {q}D, `__{m}__{q}`")
    expr = (
        f"stack({len(methods) * len(qs)}, "
        + ", ".join(stack_args)
        + ") as (method, q, value)"
    )
    return wide.select(group, F.expr(expr))
