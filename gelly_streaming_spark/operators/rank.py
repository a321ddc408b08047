"""Distributed global rank (a DataFrame ``zipWithIndex``).

A global ``row_number() over (order by ...)`` in Spark is a
single-partition window — the whole input funnels through one task.
``bucketed_rank`` computes the identical dense 0-based rank with only
per-bucket parallelism:

1. split rows into order-preserving buckets (caller supplies the
   bucket expression — a low-cardinality, order-aligned prefix of the
   sort key, e.g. the timestamp for (ts, src, dst) ordering, or a
   hash bucket when the order is arbitrary-but-deterministic);
2. per-bucket ``row_number`` (distributed: one window pane per
   bucket);
3. bucket offsets = exclusive prefix sums of bucket counts — a window
   over ONLY #buckets rows (the one intentionally tiny serial step),
   broadcast-joined back.

Driver state is zero (no collect); the serial window is O(#buckets),
never O(rows). The result equals
``row_number() over (order by bucket, *order_cols) - 1`` exactly, so
a DuckDB oracle can reproduce it with a plain window function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list[str],
    idx_col: str = "idx",
) -> DataFrame:
    """Dense 0-based global rank by (bucket, *order_cols).

    ``bucket`` must be order-preserving w.r.t. the intended total
    order (or the total order is *defined* as (bucket, *order_cols),
    e.g. hash buckets for an arbitrary deterministic enumeration).
    (bucket, *order_cols) must be unique per row for a stable rank.
    """
    b = df.withColumn("_b", bucket)
    counts = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    # exclusive prefix sum over #buckets rows (tiny serial window)
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        F.col("_b").alias("_b2"),
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("_b").orderBy(*order_cols)
    # null-SAFE join: a null bucket is a legal partition (it sorts
    # first, Spark window NULLS FIRST semantics) — a plain equi-join
    # would silently drop those rows from the ranking
    return (
        b.join(F.broadcast(offs), F.col("_b").eqNullSafe(F.col("_b2")))
        .withColumn(idx_col, F.row_number().over(w_in) - 1 + F.col("_off"))
        .drop("_b", "_b2", "_off")
    )
