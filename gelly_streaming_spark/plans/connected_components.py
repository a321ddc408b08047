"""Single-pass streaming connected components (weakly connected).

Rebuild of library/ConnectedComponents.java:44-155: per-shard
union-find fold (DisjointSet.union per edge, ConnectedComponents.java:
86-89), partials exported as (vertex, root) pairs, merge phase
re-unions every pair (DisjointSet.merge, DisjointSet.java:132-136).
Component ids are canonicalized to the component's MIN vertex id so
output is deterministic and matches a recursive-CTE MIN-label SQL
oracle. Output: (vertex, component).
"""

from __future__ import annotations

import pandas as pd

from gelly_streaming_spark.functions.synopses import DisjointSet
from gelly_streaming_spark.operators.aggregation import GraphAggregation


def _pairs_to_pdf(ds: DisjointSet) -> pd.DataFrame:
    comps = ds.components()
    return pd.DataFrame(
        {"vertex": list(comps.keys()), "component": list(comps.values())}
    )


class ConnectedComponents(GraphAggregation):
    """Merge-tree CC. Works for any vertex type; schemas below assume
    long vertex ids (use ``vertex_type='string'`` for transcript
    node labels)."""

    def __init__(self, vertex_type: str = "long"):
        self.partial_schema = f"vertex {vertex_type}, component {vertex_type}"
        self.output_schema = self.partial_schema

    def fold(self, pdf: pd.DataFrame) -> pd.DataFrame:
        ds = DisjointSet()
        ds.union_edges(pdf["src"].values, pdf["dst"].values)
        return _pairs_to_pdf(ds)

    def combine(self, pdf: pd.DataFrame) -> pd.DataFrame:
        ds = DisjointSet()
        ds.merge(zip(pdf["vertex"].tolist(), pdf["component"].tolist()))
        return _pairs_to_pdf(ds)
