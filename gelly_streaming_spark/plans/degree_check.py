"""Windowed degree aggregation (DegreeCheck).

Rebuild of library/DegreeCheck.java:41-113 + HMap (summaries/
HMap.java:10-101; NOT replicating the fork's union1 bug,
HMap.java:63-85): +1 degree to both endpoints per edge, degree maps
merged by summing.

The synopsis is a plain additive counter map, so unlike CC this is
fully expressible as a Catalyst aggregate — the merge tree IS Spark's
partial/final HashAggregate. We therefore implement it natively
(explode endpoints -> groupBy count) and keep a merge-tree variant
only for engine parity tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gelly_streaming_spark.operators.aggregation import GraphAggregation


def degree_check(edges: DataFrame, window_duration: str | None = None) -> DataFrame:
    """Catalyst-native degree aggregation: (vertex, degree) or
    (win_start, win_end, vertex, degree) when windowed. Map-side
    partial aggregation + whole-stage codegen for free."""
    ev = edges.select(F.explode(F.array("src", "dst")).alias("vertex"), "ts")
    if window_duration is None:
        return ev.groupBy("vertex").agg(F.count(F.lit(1)).alias("degree"))
    w = F.window("ts", window_duration)
    return ev.groupBy(w.alias("win"), "vertex").agg(
        F.count(F.lit(1)).alias("degree")
    ).select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "vertex",
        "degree",
    )


class DegreeCheck(GraphAggregation):
    """Merge-tree formulation (parity with the reference's plan
    shape; prefer ``degree_check`` in production plans)."""

    partial_schema = "vertex long, degree long"
    output_schema = partial_schema

    def fold(self, pdf: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([pdf["src"], pdf["dst"]])
        counts = both.value_counts()
        return pd.DataFrame(
            {"vertex": counts.index.values, "degree": counts.values}
        )

    def combine(self, pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("vertex", as_index=False)["degree"].sum()
        return g
