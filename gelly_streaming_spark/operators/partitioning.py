"""Streaming graph partitioners + partition-quality metrics.

Rebuild of the fork's research contribution (SURVEY.md §2.9): the
edge partitioners under ``partitioner/edgepartitioners/`` and vertex
partitioners under ``vertexpartitioners/``, plus the edge-cut /
load / replication metrics of ``object/StoredState.java:65-105`` and
``partitioner/tests/CutSink.java:13-32``.

Spark disposition (SURVEY.md §2.9 mapping):

- **Stateless rules** (HashEdges ``edgepartitioners/HashEdges.java:
  78-110``, DBH ``Dbh.java:99-160``, Grid constraint sets
  ``Grid.java:100-150``) are pure Catalyst expressions — at scale
  they feed ``repartition(k, col("part"))`` / ``partitionBy`` writes
  so the assignment IS the shuffle. DBH's degree table is a first
  aggregate + an equi-join (broadcast when the vertex set is small).
- **Stateful scoring rules** (HDRF ``Hdrf.java:92-224``, Greedy
  ``Greedy.java:95-170``, least-loaded Grid/PDS selection, Fennel
  ``vertexpartitioners/Fennel.java:132-230``, LinearGreedy) depend on
  per-machine load counters updated per record — the reference runs
  them at parallelism 1 over a static shared map
  (``CustomKeySelector.java:12-33``, ``Hdrf.java:33``). The faithful
  port is a single-group sequential fold (``applyInPandas``, edges in
  (ts, src, dst) order): a documented serial analysis op for parity
  experiments, not a live stream partitioner. The scalable
  load-balancing objective they chase maps to salting + AQE
  (``operators/aggregation.with_shard``).

Hashes are the md5-derived ``hash60`` (engine-portable, see
``queries.py``) rather than JVM ``Object.hashCode`` — same uniformity,
deterministic everywhere.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

H60 = "cast(conv(substring(md5(cast({x} as string)), 1, 15), 16, 10) as bigint)"


def _h(expr: str) -> str:
    return H60.format(x=expr)


# ---------------------------------------------------------------------------
# stateless edge partitioners (Catalyst-native)
# ---------------------------------------------------------------------------


def hash_edges(edges: DataFrame, k: int) -> DataFrame:
    """HashEdges (HashEdges.java:78-110): part = hash(src) mod k."""
    return edges.withColumn(
        "part", F.expr(f"pmod({_h('src')}, {k})").cast("int")
    )


def dbh(edges: DataFrame, k: int) -> DataFrame:
    """Degree-Based Hashing (Dbh.java:99-160): hash the LOWER-degree
    endpoint (cuts high-degree hubs, replicating them instead of
    their neighbors). Degrees come from a first aggregate over the
    edge set; ties break to the smaller vertex id (deterministic).

    Plan shape: agg + two equi-joins on vertex — the degree side is
    tiny relative to edges (O(V) vs O(E)) so Catalyst broadcasts it;
    at 100 TB with billions of vertices it becomes a shuffle join on
    the join key both sides already share."""
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ds = deg.select(F.col("vertex").alias("src"), F.col("deg").alias("deg_src"))
    dd_ = deg.select(F.col("vertex").alias("dst"), F.col("deg").alias("deg_dst"))
    j = edges.join(F.broadcast(ds), "src").join(F.broadcast(dd_), "dst")
    chosen = (
        F.when(F.col("deg_src") < F.col("deg_dst"), F.col("src"))
        .when(F.col("deg_dst") < F.col("deg_src"), F.col("dst"))
        .otherwise(F.least("src", "dst"))
    )
    return j.withColumn("chosen", chosen).withColumn(
        "part", F.expr(f"pmod({_h('chosen')}, {k})").cast("int")
    ).select(*edges.columns, "part")


def grid_constraint_sets(k: int) -> list[list[int]]:
    """Grid constraint sets (Grid.java:100-150): machines arranged in
    an r×c grid (r*c = k); vertex v's set = its row ∪ column. Any two
    sets intersect, bounding replication at r + c − 1."""
    r = int(math.sqrt(k))
    while k % r:
        r -= 1
    c = k // r
    grid = [[i * c + j for j in range(c)] for i in range(r)]
    sets = []
    for m in range(k):
        i, j = divmod(m, c)
        row = set(grid[i])
        col = {grid[x][j] for x in range(r)}
        sets.append(sorted(row | col))
    return sets


def pds_generator(p: int) -> list[int] | None:
    """Perfect difference set for k = p²+p+1 (object/PdsGenerator.
    java:10-88): a set D of p+1 residues whose pairwise differences
    cover Z_k — PDS constraint sets intersect in EXACTLY one machine.
    Backtracking search (small p only, like the reference)."""
    k = p * p + p + 1
    target = p + 1

    def extend(ds: list[int], used: set[int]) -> list[int] | None:
        if len(ds) == target:
            return ds
        start = ds[-1] + 1 if ds else 0
        for c in range(start, k):
            diffs = set()
            ok = True
            for d in ds:
                a, b = (c - d) % k, (d - c) % k
                if a in used or b in used or a in diffs or b in diffs:
                    ok = False
                    break
                diffs.add(a)
                diffs.add(b)
            if ok:
                res = extend(ds + [c], used | diffs)
                if res:
                    return res
        return None

    return extend([0], set())


# ---------------------------------------------------------------------------
# stateful scoring partitioners (sequential parity ops)
# ---------------------------------------------------------------------------


def _sequential_edge_partition(edges: DataFrame, k: int, score_fn) -> DataFrame:
    """Shared harness: fold edges in (ts, src, dst) order through a
    stateful scorer — the reference's parallelism-1 shared-state model
    (StoredState.java:14-130). ``score_fn(u, v, p, replicas, degrees,
    loads) -> float``; the argmax machine wins (ties -> lowest id)."""
    cols = edges.columns

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "src", "dst"], kind="stable")
        replicas: dict = {}
        degrees: dict = {}
        loads = [0] * k
        parts = []
        for u, v in zip(pdf["src"], pdf["dst"]):
            degrees[u] = degrees.get(u, 0) + 1
            degrees[v] = degrees.get(v, 0) + 1
            best, best_score = 0, -math.inf
            for p in range(k):
                s = score_fn(u, v, p, replicas, degrees, loads)
                if s > best_score:
                    best, best_score = p, s
            replicas.setdefault(u, set()).add(best)
            replicas.setdefault(v, set()).add(best)
            loads[best] += 1
            parts.append(best)
        out = pdf.copy()
        out["part"] = pd.array(parts, dtype="int32")
        return out

    # preserve input column types (vertex ids may be strings — the
    # transcript graph's labels — or longs)
    dtypes = dict(edges.dtypes)
    schema = ", ".join(f"{c} {dtypes[c]}" for c in cols) + ", part int"
    return edges.groupBy(F.lit(0).alias("g")).applyInPandas(
        lambda key, pdf: fold(key, pdf.drop(columns=["g"], errors="ignore")),
        schema=schema,
    )


def hdrf(edges: DataFrame, k: int, lam: float = 1.0, eps: float = 1e-9) -> DataFrame:
    """HDRF (Hdrf.java:92-224): replica affinity weighted by
    normalized degree (the HIGHER-degree endpoint is the one worth
    replicating) plus λ-weighted load balance."""

    def score(u, v, p, replicas, degrees, loads):
        du, dv = degrees[u], degrees[v]
        tu = du / (du + dv)
        tv = 1.0 - tu
        g = 0.0
        if p in replicas.get(u, ()):
            g += 1.0 + (1.0 - tu)
        if p in replicas.get(v, ()):
            g += 1.0 + (1.0 - tv)
        maxl, minl = max(loads), min(loads)
        bal = (maxl - loads[p]) / (eps + maxl - minl)
        return g + lam * bal

    return _sequential_edge_partition(edges, k, score)


def greedy_partition(edges: DataFrame, k: int, lam: float = 1.0) -> DataFrame:
    """Greedy (Greedy.java:95-170): 0/1 replica affinity + balance."""

    def score(u, v, p, replicas, degrees, loads):
        g = (p in replicas.get(u, ())) + (p in replicas.get(v, ()))
        maxl = max(loads)
        return g + lam * (maxl - loads[p]) / (maxl + 1.0)

    return _sequential_edge_partition(edges, k, score)


def grid_partition(edges: DataFrame, k: int) -> DataFrame:
    """Grid (Grid.java:100-150): least-loaded machine in the
    intersection of the endpoints' grid constraint sets."""
    sets = grid_constraint_sets(k)

    def vid(u) -> int:
        # stable vertex->index hash (works for string labels too;
        # python hash() is process-salted, so crc32 instead)
        import zlib

        try:
            return int(u) % k
        except (TypeError, ValueError):
            return zlib.crc32(str(u).encode()) % k

    def score(u, v, p, replicas, degrees, loads):
        su = set(sets[vid(u)])
        sv = set(sets[vid(v)])
        if p not in (su & sv or su | sv):
            return -math.inf
        return -loads[p]

    return _sequential_edge_partition(edges, k, score)


def fennel_vertices(
    adjacency: DataFrame,
    k: int,
    gamma: float = 1.5,
    alpha: float | None = None,
) -> DataFrame:
    """Fennel streaming vertex partitioner (vertexpartitioners/
    Fennel.java:132-230): assign v to argmax |N(v) ∩ P_i| −
    α·γ·load_i^(γ−1). Input: (vertex, neighbors array). Sequential
    parity op (the reference is parallelism-1 too)."""

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n_vertices = len(pdf)
        n_edges = max(1, int(pdf["neighbors"].map(len).sum()) // 2)
        a = alpha if alpha is not None else (
            math.sqrt(k) * n_edges / (n_vertices ** gamma)
        )
        assign: dict[int, int] = {}
        loads = [0] * k
        parts = []
        pdf = pdf.sort_values("vertex", kind="stable")
        for v, nbrs in zip(pdf["vertex"], pdf["neighbors"]):
            best, best_score = 0, -math.inf
            for p in range(k):
                inter = sum(1 for n in nbrs if assign.get(int(n)) == p)
                s = inter - a * gamma * (loads[p] ** (gamma - 1))
                if s > best_score:
                    best, best_score = p, s
            assign[int(v)] = best
            loads[best] += 1
            parts.append(best)
        return pd.DataFrame(
            {"vertex": pdf["vertex"].values, "part": pd.array(parts, dtype="int32")}
        )

    return adjacency.groupBy(F.lit(0).alias("g")).applyInPandas(
        lambda key, pdf: fold(key, pdf), schema="vertex long, part int"
    )


def linear_greedy_vertices(adjacency: DataFrame, k: int, capacity: int) -> DataFrame:
    """LinearGreedy (vertexpartitioners/LinearGreedy.java:139-214):
    argmax |N(v) ∩ P_i| · (1 − load_i/capacity)."""

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        assign: dict[int, int] = {}
        loads = [0] * k
        parts = []
        pdf = pdf.sort_values("vertex", kind="stable")
        for v, nbrs in zip(pdf["vertex"], pdf["neighbors"]):
            best, best_key = 0, (-math.inf, -math.inf)
            for p in range(k):
                if loads[p] >= capacity:  # hard capacity c
                    continue
                inter = sum(1 for n in nbrs if assign.get(int(n)) == p)
                # least-loaded tie-break (no-affinity cold start)
                key = (inter * (1.0 - loads[p] / capacity), -loads[p])
                if key > best_key:
                    best, best_key = p, key
            assign[int(v)] = best
            loads[best] += 1
            parts.append(best)
        return pd.DataFrame(
            {"vertex": pdf["vertex"].values, "part": pd.array(parts, dtype="int32")}
        )

    return adjacency.groupBy(F.lit(0).alias("g")).applyInPandas(
        lambda key, pdf: fold(key, pdf), schema="vertex long, part int"
    )


# ---------------------------------------------------------------------------
# partition-quality metrics (CutSink / StoredState analog)
# ---------------------------------------------------------------------------


def partition_metrics(assignment: DataFrame) -> DataFrame:
    """Single-row quality summary of an edge partition assignment
    (edges + ``part``): per-machine load spread, replication factor,
    vertex cut — the metrics StoredState.java:65-105 and CutSink
    track. All Catalyst aggregates; doubles are single divisions."""
    loads = assignment.groupBy("part").agg(F.count(F.lit(1)).alias("load"))
    load_row = loads.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.max("load").alias("max_load"),
        F.min("load").alias("min_load"),
        F.sum("load").alias("total_edges"),
    )
    vp = (
        assignment.select(
            F.explode(F.array("src", "dst")).alias("vertex"), "part"
        )
        .distinct()
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_parts_v"))
    )
    rep_row = vp.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("n_parts_v").alias("total_replicas"),
        F.sum(F.col("n_parts_v") - 1).alias("vertex_cut"),
    )
    return (
        load_row.crossJoin(rep_row)
        .withColumn(
            "replication_factor",
            F.col("total_replicas").cast("double")
            / F.col("n_vertices").cast("double"),
        )
        .withColumn(
            "balance",
            F.col("max_load").cast("double")
            * F.col("n_parts").cast("double")
            / F.col("total_edges").cast("double"),
        )
    )
