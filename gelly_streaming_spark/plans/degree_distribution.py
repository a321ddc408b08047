"""Fully-dynamic degree distribution (additions + deletions).

Rebuild of example/DegreeDistribution.java:42-143: each signed edge
event (src, dst, op ∈ {+,-}) becomes two (vertex, ±1) increments
(:77-86); a per-vertex running degree (:91-119) feeds a per-degree
running count (:124-143). The running degree is floored PER UPDATE —
a decrement at degree 0 is a no-op (it does not bank a negative) —
and a vertex at degree 0 leaves the distribution
(ExamplesTestData.java:36-60 goldens).

The per-update floor y_t = max(0, y_{t-1} + d_t) is not a plain sum,
but it has a closed form over prefix sums S_t (the Lindley/queueing
recursion):  y_t = max(0, S_t − min(0, min_{k<t} S_k)) — so the whole
thing stays Catalyst window functions (running sum + running min),
no per-row Python. Ties on ts order additions first (delta DESC) —
deterministic, mirrored in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _signed_events(edges: DataFrame) -> DataFrame:
    """(src, dst, op[, ts]) -> (vertex, delta, ts?) pairs."""
    delta = F.when(F.col("op") == "+", F.lit(1)).otherwise(F.lit(-1))
    cols = [F.explode(F.array("src", "dst")).alias("vertex"), delta.alias("delta")]
    if "ts" in edges.columns:
        cols.append(F.col("ts"))
    return edges.select(*cols)


def _order_cols(ev: DataFrame):
    return (
        [F.col("ts"), F.col("delta").desc()]
        if "ts" in ev.columns
        else [F.col("delta").desc()]
    )


def signed_degree_trace(edges: DataFrame) -> DataFrame:
    """Batch per-update running-degree trace in event order with the
    per-update 0-floor (matches the DEGREES_RESULT goldens)."""
    ev = _signed_events(edges)
    order = _order_cols(ev)
    w_cum = (
        Window.partitionBy("vertex")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_prev = (
        Window.partitionBy("vertex")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = F.sum("delta").over(w_cum)
    prev_min = F.least(F.lit(0), F.coalesce(F.min(s).over(w_prev), F.lit(0)))
    cols = ["vertex", F.greatest(F.lit(0), s - prev_min).alias("degree")]
    if "ts" in ev.columns:
        cols.append(F.col("ts"))
    return ev.select(*cols)


def signed_degrees(edges: DataFrame) -> DataFrame:
    """Final per-vertex degree under the per-update floor — the last
    row of the per-update trace."""
    ev = _signed_events(edges)
    order = _order_cols(ev)
    w = Window.partitionBy("vertex").orderBy(*order)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    s = F.sum("delta").over(w_cum)
    prev_min = F.least(F.lit(0), F.coalesce(F.min(s).over(w_prev), F.lit(0)))
    traced = ev.select(
        "vertex",
        F.greatest(F.lit(0), s - prev_min).alias("degree"),
        F.row_number().over(w).alias("rn"),
    )
    w_v = Window.partitionBy("vertex")
    return (
        traced.withColumn("n", F.max("rn").over(w_v))
        .filter(F.col("rn") == F.col("n"))
        .select("vertex", "degree")
    )


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Final (degree, n_vertices) distribution under the per-update
    floor; vertices at degree 0 are excluded (reference removes
    them)."""
    deg = signed_degrees(edges).filter(F.col("degree") > 0)
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))
