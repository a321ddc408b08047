"""Single-pass bipartiteness check.

Rebuild of library/BipartitenessCheck.java:39-137 + the Candidates
signed-component synopsis (summaries/Candidates.java:27-196): fold
edges into a signed union-find (parity bit per vertex); an odd cycle
anywhere (within a shard or revealed when merging shards) fails the
whole graph, matching Candidates.merge fail-fast -> (false, {}).

Output: one row per vertex ``(vertex, color)`` when bipartite —
color 0 = the part containing each component's min vertex — plus the
graph-level verdict available via ``verdict()`` (is_bipartite bool).
An empty coloring with is_bipartite=false reproduces the reference's
``(false, {})`` golden (NonBipartitnessCheckTest.java:9-10).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gelly_streaming_spark.functions.synopses import SignedDisjointSet
from gelly_streaming_spark.operators.aggregation import GraphAggregation

def _export(sd: SignedDisjointSet, sentinel=-1) -> pd.DataFrame:
    if sd.failed:
        # a single sentinel row carries the failure through the tree
        return pd.DataFrame(
            {"vertex": [sentinel], "root": [sentinel], "sign": [0],
             "failed": [True]}
        )
    rows = sd.export()
    return pd.DataFrame(
        {
            "vertex": [r[0] for r in rows],
            "root": [r[1] for r in rows],
            "sign": [int(r[2]) for r in rows],
            "failed": [False] * len(rows),
        }
    )


class BipartitenessCheck(GraphAggregation):
    """Vertex type parameterized like ConnectedComponents — 'long'
    for the reference's numeric fixtures, 'string' for transcript
    vertex labels. The failure sentinel follows the type."""

    def __init__(self, vertex_type: str = "long"):
        self.partial_schema = (
            f"vertex {vertex_type}, root {vertex_type}, sign int, failed boolean"
        )
        self.output_schema = (
            f"vertex {vertex_type}, color int, is_bipartite boolean"
        )
        self._sentinel = -1 if vertex_type == "long" else "\x00failed"

    def fold(self, pdf: pd.DataFrame) -> pd.DataFrame:
        sd = SignedDisjointSet()
        sd.union_edges(pdf["src"].values, pdf["dst"].values)
        return _export(sd, self._sentinel)

    def combine(self, pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["failed"].any():
            return _export_failed(self._sentinel)
        sd = SignedDisjointSet()
        sd.merge(
            zip(pdf["vertex"].tolist(), pdf["root"].tolist(), pdf["sign"].tolist())
        )
        return _export(sd, self._sentinel)

    def finalize(self, pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["failed"].any():
            # (false, {}) golden: no coloring rows, one verdict row
            return pd.DataFrame(
                {"vertex": [self._sentinel], "color": [-1],
                 "is_bipartite": [False]}
            )
        sd = SignedDisjointSet()
        sd.merge(
            zip(pdf["vertex"].tolist(), pdf["root"].tolist(), pdf["sign"].tolist())
        )
        col = sd.coloring()
        if col is None:
            return pd.DataFrame(
                {"vertex": [self._sentinel], "color": [-1],
                 "is_bipartite": [False]}
            )
        return pd.DataFrame(
            {
                "vertex": list(col.keys()),
                "color": [int(c) for c in col.values()],
                "is_bipartite": [True] * len(col),
            }
        )


def _export_failed(sentinel=-1) -> pd.DataFrame:
    return pd.DataFrame(
        {"vertex": [sentinel], "root": [sentinel], "sign": [0], "failed": [True]}
    )


def verdict(result: DataFrame) -> bool:
    """Graph-level is_bipartite from the coloring frame."""
    row = result.agg(F.min("is_bipartite").alias("b")).collect()[0]
    return bool(row["b"])
