"""Greedy weighted matching (2-approximation, single pass).

Rebuild of example/CentralizedWeightedMatching.java:41-108: a
parallelism-1 stateful pass keeps a local matching; each arriving
edge (u, v, w) collides with at most two matched edges (one per
endpoint) and replaces them iff w > 2 · Σw(collisions) — the classic
streaming 2-approx of McGregor. Emits ADD/REMOVE events per decision
(MatchingEvent semantics); ``greedy_matching`` returns the final
matching, ``greedy_matching_events`` the full event stream.

Like the reference (env.setParallelism(1),
CentralizedWeightedMatching.java:59), the algorithm is inherently
sequential — implemented as a single-group ``applyInPandas``
(vectorized transport, sequential fold inside, processing edges in
(ts, src, dst) order for determinism). Documented serial point:
excluded from scaling claims; at 100 TB you run it per key-partition
(e.g. per conv_id) where per-group sequentiality is fine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EVENT_SCHEMA = "op string, src long, dst long, val long, seq long"


def _fold_matching(pdf: pd.DataFrame, emit_events: bool) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "src", "dst"], kind="stable")
    by_vertex: dict[int, tuple[int, int, int]] = {}  # vertex -> (u, v, w)
    events = []
    seq = 0
    for u, v, w in zip(pdf["src"], pdf["dst"], pdf["val"]):
        u, v, w = int(u), int(v), int(w)
        if u == v:
            continue
        collisions = {e for e in (by_vertex.get(u), by_vertex.get(v)) if e}
        if w > 2 * sum(e[2] for e in collisions):
            for e in collisions:
                del by_vertex[e[0]]
                del by_vertex[e[1]]
                events.append(("REMOVE", e[0], e[1], e[2], seq))
                seq += 1
            edge = (u, v, w)
            by_vertex[u] = edge
            by_vertex[v] = edge
            events.append(("ADD", u, v, w, seq))
            seq += 1
    if emit_events:
        return pd.DataFrame(events, columns=["op", "src", "dst", "val", "seq"])
    final = sorted({e for e in by_vertex.values()})
    return pd.DataFrame(
        {
            "src": [e[0] for e in final],
            "dst": [e[1] for e in final],
            "val": [e[2] for e in final],
        }
    )


def greedy_matching(edges: DataFrame) -> DataFrame:
    """Final 2-approx matching: (src, dst, val)."""
    return (
        edges.select("src", "dst", "val", "ts")
        .groupBy(F.lit(0).alias("g"))
        .applyInPandas(
            lambda key, pdf: _fold_matching(pdf, emit_events=False),
            schema="src long, dst long, val long",
        )
    )


def greedy_matching_events(edges: DataFrame) -> DataFrame:
    """The ADD/REMOVE MatchingEvent stream: (op, src, dst, val, seq)."""
    return (
        edges.select("src", "dst", "val", "ts")
        .groupBy(F.lit(0).alias("g"))
        .applyInPandas(
            lambda key, pdf: _fold_matching(pdf, emit_events=True),
            schema=_EVENT_SCHEMA,
        )
    )
