"""Custom stateful streaming operators via applyInPandasWithState.

The reference's continuously-improving aggregations keep unmanaged
per-key state inside Flink flatMaps (running degree:
SimpleEdgeStream.java:397-462; running entity counts :350-388). The
Structured Streaming analog with MANAGED (checkpointed, resumable)
state is ``applyInPandasWithState`` — Arrow-batched per-key state, no
per-row Python, exactly the "flatMapGroupsWithState-style stateful
aggregation" the north_star names. Most aggregations in this repo
deliberately use plain ``groupBy().agg`` in update mode instead
(Catalyst-native state is faster and AQE-planned); this module is for
semantics the built-ins cannot express — state transitions that need
custom code per key, like the signed degree floor below.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def lindley_final(carry: int, pdfs: Iterator[pd.DataFrame]) -> int:
    """Fold a batch of ±1 deltas (column ``delta``) into a running
    floored degree: the per-update floor y_t = max(0, y_{t-1} + d_t)
    is the Lindley recursion, whose closed form over prefix sums
    (derived in plans/degree_distribution.py for the batch trace)
    gives the batch-final state directly:
        y_n = max(carry + S_n, S_n - min_k S_k)
            = S_n + max(carry, -min(cumsum))
    — one vectorized cumsum per key/batch, no per-row Python. Shared
    by the applyInPandasWithState and transformWithState twins so the
    two state APIs cannot silently diverge."""
    import numpy as np

    deltas = [p["delta"].to_numpy(dtype=np.int64) for p in pdfs]
    d = np.concatenate(deltas) if deltas else np.empty(0, np.int64)
    if d.size:
        s = np.cumsum(d)
        carry = int(s[-1] + max(carry, -s.min()))
    return carry


def signed_deltas(edges_with_op: DataFrame) -> DataFrame:
    """(src, dst, op '+'/'-') -> per-endpoint (vertex, delta ±1) rows
    (DegreeDistribution.java:77-86's DegreeTypeSeparator)."""
    return edges_with_op.select(
        F.explode(F.array("src", "dst")).alias("vertex"),
        F.when(F.col("op") == "-", F.lit(-1)).otherwise(F.lit(1)).alias("delta"),
    )


def streaming_running_degrees(edges: DataFrame, vertex_type: str = "string") -> DataFrame:
    """Per-vertex RUNNING degree over a streaming edge frame, emitted
    once per (vertex, micro-batch) — the managed-state port of the
    reference's per-update DegreeMapFunction (SimpleEdgeStream.java:
    445-462; per-record emission becomes per-batch emission under
    micro-batching, converging to the same final counts).

    State per key: a single int64 counter — O(V) total state, the
    synopsis property that makes 10^12-turn streams feasible."""
    vertices = edges.select(
        F.explode(F.array("src", "dst")).alias("vertex")
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        count = state.get[0] if state.exists else 0
        count += sum(len(p) for p in pdfs)
        state.update((count,))
        yield pd.DataFrame({"vertex": [key[0]], "degree": [count]})

    return vertices.groupBy("vertex").applyInPandasWithState(
        update,
        outputStructType=f"vertex {vertex_type}, degree long",
        stateStructType="degree long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_signed_degrees(
    edges_with_op: DataFrame, vertex_type: str = "string"
) -> DataFrame:
    """Fully-dynamic running degree with the zero floor
    (DegreeDistribution.java:91-119: a '-' at degree 0 is a no-op,
    not a banked negative) — per-key custom state transition that a
    plain windowed sum CANNOT express, which is exactly the
    applyInPandasWithState use case. Input: (src, dst, op '+'/'-');
    output per (vertex, batch): (vertex, degree)."""
    signed = signed_deltas(edges_with_op)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        degree = lindley_final(state.get[0] if state.exists else 0, pdfs)
        state.update((degree,))
        yield pd.DataFrame({"vertex": [key[0]], "degree": [degree]})

    return signed.groupBy("vertex").applyInPandasWithState(
        update,
        outputStructType=f"vertex {vertex_type}, degree long",
        stateStructType="degree long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
