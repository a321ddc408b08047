"""Fully-dynamic degree distribution (additions + deletions).

Rebuild of example/DegreeDistribution.java:42-143: each signed edge
event (src, dst, op ∈ {+,-}) becomes two (vertex, ±1) increments
(:77-86); a per-vertex running degree (:91-119) feeds a per-degree
running count (:124-143). Degrees never drop below 0 and a vertex at
degree 0 leaves the distribution (ExamplesTestData.java:36-60
goldens).

Spark formulation: signed explode → per-vertex sum (final state) →
group by degree. The per-update traces the reference tests pin are
reproduced in batch via ordered cumulative windows
(``signed_degree_trace``).
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


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Final (degree, n_vertices) distribution; vertices at degree
    <= 0 are excluded (reference removes them)."""
    deg = (
        _signed_events(edges)
        .groupBy("vertex")
        .agg(F.sum("delta").alias("degree"))
        .filter(F.col("degree") > 0)
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_vertices"))


def signed_degrees(edges: DataFrame) -> DataFrame:
    """Final per-vertex signed degree (clipped at 0, vertex kept)."""
    return (
        _signed_events(edges)
        .groupBy("vertex")
        .agg(F.greatest(F.sum("delta"), F.lit(0)).alias("degree"))
    )


def signed_degree_trace(edges: DataFrame) -> DataFrame:
    """Batch per-update running-degree trace in event order
    (matches the DEGREES_RESULT goldens; degree floor at 0)."""
    ev = _signed_events(edges)
    w = (
        Window.partitionBy("vertex")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "vertex",
        F.greatest(F.sum("delta").over(w), F.lit(0)).alias("degree"),
        "ts",
    )
