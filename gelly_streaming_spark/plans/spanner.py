"""k-Spanner — single-pass spanner construction.

Rebuild of library/Spanner.java:41-118: per shard, add an edge to the
local spanner iff the bounded BFS finds no path of length <= k
(Spanner.java:72-78, AdjacencyListGraph.java:79-116); merging two
spanners re-tests each edge of the smaller against the union
(Spanner.java:93-117). The result is a valid (2k-1)-spanner of the
union graph; like the reference, the edge set depends on arrival
order, so tests assert spanner PROPERTIES (connectivity preserved,
stretch bound) rather than an exact edge list.

Partial/output rows: (src, dst) spanner edges.
"""

from __future__ import annotations

import pandas as pd

from gelly_streaming_spark.functions.synopses import AdjacencyListGraph
from gelly_streaming_spark.operators.aggregation import GraphAggregation


def _edges_pdf(g: AdjacencyListGraph) -> pd.DataFrame:
    es = g.edges()
    return pd.DataFrame(
        {"src": [a for a, _ in es], "dst": [b for _, b in es]}
    )


class Spanner(GraphAggregation):
    def __init__(self, k: int, vertex_type: str = "long"):
        self.k = k
        self.partial_schema = f"src {vertex_type}, dst {vertex_type}"
        self.output_schema = self.partial_schema

    def _build(self, srcs, dsts) -> AdjacencyListGraph:
        g = AdjacencyListGraph()
        for a, b in zip(srcs, dsts):
            if a != b:
                g.maybe_add_spanner_edge(min(a, b), max(a, b), self.k)
        return g

    def fold(self, pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic arrival order within a shard: sort by ts
        pdf = pdf.sort_values("ts", kind="stable")
        return _edges_pdf(self._build(pdf["src"].tolist(), pdf["dst"].tolist()))

    def combine(self, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="stable")
        return _edges_pdf(self._build(pdf["src"].tolist(), pdf["dst"].tolist()))
