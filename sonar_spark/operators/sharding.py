"""Token-balanced output sharding — the last stage of a training-data
pipeline: split the corpus into N output shards of ~equal token
budget (so downstream loaders stream equal-sized files), assigned
deterministically by a prefix sum over a stable document order.

shard(doc) = floor(tokens_before_doc / ceil(total_tokens / N))
— contiguous in doc order, every shard's budget within one document
of the target (greedy boundary), reproducible across runs/engines.

The scale-sensitive piece is the GLOBAL prefix sum: sum() OVER
(ORDER BY doc_id) is a single-partition window on 100 TB.
global_cumsum computes the same numbers with the relational
zipWithIndex two-pass (operators/negatives.global_dense_index):
deterministic range buckets -> per-bucket sums (tiny agg) ->
cumulative offsets over the <= B-row bucket table -> broadcast join
+ within-bucket running sum (windows partitioned by bucket, fully
parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .negatives import bucket_offsets, range_buckets


def global_cumsum(
    df: DataFrame,
    *,
    col: str = "doc_id",
    val: str = "n_tok",
    buckets: int = 32,
) -> DataFrame:
    """Add cum_before = exclusive prefix sum of `val` in `col` order
    (== sum(val) OVER (ORDER BY col ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING), 0 for the first row) without a global
    single-partition sort.  `col` values must be unique."""
    b = range_buckets(df, col, buckets)
    sums = b.groupBy("__b").agg(F.sum(val).cast("long").alias("__s"))
    offsets = bucket_offsets(sums, "__s")
    win = (
        Window.partitionBy("__b")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(offsets), "__b")
        .withColumn(
            "cum_before",
            (
                F.coalesce(F.sum(val).over(win), F.lit(0))
                + F.col("__off")
            ).cast("long"),
        )
        .drop("__b", "__off")
    )


def shard_balance(
    docs: DataFrame,
    *,
    n_shards: int = 8,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
) -> DataFrame:
    """Assign each doc a shard in [0, n_shards) with ~equal token
    budgets.  Output per doc: id, n_tok, cum_before, shard, plus the
    shard's realized totals (shard_tokens, shard_docs) riding every
    row — the balance certificate."""
    cs = global_cumsum(docs, col=id_col, val=ntok_col)
    # total from the INPUT, not the cumsum subtree — re-deriving cs
    # for a single scalar would double the two-pass (plan-audited)
    tot = docs.groupBy().agg(
        F.sum(ntok_col).cast("long").alias("__tot")
    )
    # greatest(...,1): an all-empty corpus (total 0) degenerates to
    # shard 0 instead of dividing by zero
    target = F.greatest(
        F.ceil(F.col("__tot") / n_shards).cast("long"), F.lit(1)
    )
    assigned = cs.crossJoin(F.broadcast(tot)).select(
        id_col,
        F.col(ntok_col).cast("long").alias(ntok_col),
        "cum_before",
        F.least(
            F.floor(F.col("cum_before") / target).cast("int"),
            F.lit(n_shards - 1),
        ).alias("shard"),
    )
    ws = Window.partitionBy("shard")
    return assigned.select(
        id_col,
        ntok_col,
        "cum_before",
        "shard",
        F.sum(ntok_col).over(ws).cast("long").alias("shard_tokens"),
        F.count("*").over(ws).cast("long").alias("shard_docs"),
    )
