"""Triangle counting pipelines.

Three rebuilds from the reference:

1. ``window_triangles`` — windowed EXACT count
   (example/WindowTriangles.java:48-139): slice(w, ALL) →
   per-(vertex, window) candidate generation (GenerateCandidateEdges,
   WindowTriangles.java:82-115: the pane's lowest vertex emits each
   higher-ID neighbor pair once as a candidate, plus the real edges)
   → per-(pair, window) match candidates against real edges
   (CountTriangles, :118-139) → per-window sum (:60-65).

2. ``exact_triangle_count`` — global + per-vertex local counts
   (example/ExactTriangleCount.java:41-156). The reference streams
   neighborhood snapshots through a hand-rolled symmetric hash join;
   the Spark-first formulation is the classic A⋈A⋈A triangle join on
   canonicalized distinct edges — fully Catalyst-planned (broadcast /
   sort-merge picked by AQE), no Python in the plan.

3. ``estimate_triangles`` — seeded sampling ESTIMATE
   (example/BroadcastTriangleCount.java:62-174 /
   IncidenceSamplingTriangleCount.java:61-242): S independent
   reservoir samplers each keep one uniform edge + a random third
   vertex and watch for the two closing edges;
   estimate = (Σβ / S) · |E| · (|V| − 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. Windowed exact triangles
# ---------------------------------------------------------------------------

_CAND_SCHEMA = (
    "win_start timestamp, win_end timestamp, "
    "a long, b long, is_candidate boolean"
)


def _gen_candidates(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """GenerateCandidateEdges (WindowTriangles.java:82-115): within a
    (window, vertex) pane over the UNDIRECTED slice, the vertex emits
    (a, b, candidate=True) for every pair of strictly-higher-ID
    neighbors, and (v, u, candidate=False) for each real edge to a
    higher neighbor — so each triangle {a<b<c} yields exactly one
    candidate (from a) and each edge is emitted once (from its lower
    endpoint)."""
    win_start, win_end, v = key[0], key[1], int(key[2])
    nbrs = np.unique(pdf["dst"].values)
    hi = nbrs[nbrs > v]
    rows_a, rows_b, flags = [], [], []
    # real edges v->u (u > v)
    for u in hi.tolist():
        rows_a.append(v)
        rows_b.append(int(u))
        flags.append(False)
    # candidate pairs among higher neighbors
    if len(hi) >= 2:
        ia, ib = np.triu_indices(len(hi), k=1)
        rows_a.extend(hi[ia].tolist())
        rows_b.extend(hi[ib].tolist())
        flags.extend([True] * len(ia))
    out = pd.DataFrame({"a": rows_a, "b": rows_b, "is_candidate": flags})
    out.insert(0, "win_start", win_start)
    out.insert(1, "win_end", win_end)
    return out


def window_triangles(edges: DataFrame, window_duration: str) -> DataFrame:
    """Exact per-window triangle count. Returns
    (win_start, win_end, n_triangles) — the reference emits
    (count, window-max-ts); win_end - 1ms corresponds to its second
    field (ExamplesTestData.java:33-34)."""
    und = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(F.col("dst").alias("src"), F.col("src").alias("dst")),
            )
        ).alias("e"),
        "ts",
    ).select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"), "ts")
    w = F.window("ts", window_duration)
    und = und.withColumn("win_start", w["start"]).withColumn("win_end", w["end"])
    panes = und.groupBy("win_start", "win_end", "src").applyInPandas(
        _gen_candidates, schema=_CAND_SCHEMA
    )
    per_pair = panes.groupBy("win_start", "win_end", "a", "b").agg(
        F.sum(F.when(F.col("is_candidate"), 1).otherwise(0)).alias("n_cand"),
        F.max(F.when(~F.col("is_candidate"), 1).otherwise(0)).alias("has_edge"),
    )
    return (
        per_pair.groupBy("win_start", "win_end")
        .agg(F.sum(F.col("n_cand") * F.col("has_edge")).alias("n_triangles"))
        .select("win_start", "win_end", "n_triangles")
    )


# ---------------------------------------------------------------------------
# 2. Exact global / local triangle count (batch, Catalyst-native)
# ---------------------------------------------------------------------------


def _canonical_distinct(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def triangle_list(edges: DataFrame) -> DataFrame:
    """All triangles (a < b < c) via the classic 3-way self-join on
    canonical edges. Catalyst orders/broadcasts the joins; each
    triangle appears exactly once."""
    e = _canonical_distinct(edges)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    return (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )


def exact_triangle_count(edges: DataFrame) -> DataFrame:
    """Per-vertex local triangle counts plus the -1-keyed global count
    (output contract of ExactTriangleCount.java:123-142). Returns
    (vertex, n_triangles)."""
    tris = triangle_list(edges)
    local = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    glob = tris.agg(F.count(F.lit(1)).alias("n_triangles")).select(
        F.lit(-1).cast("long").alias("vertex"), "n_triangles"
    )
    return local.unionByName(glob)


# ---------------------------------------------------------------------------
# 3. Sampled triangle estimate (seeded)
# ---------------------------------------------------------------------------


def estimate_triangles(
    edges: DataFrame, num_samplers: int = 1000, seed: int = 0xDEADBEEF
) -> DataFrame:
    """Streaming-style estimator (BroadcastTriangleCount.java:62-174):
    every sampler sees the full edge stream in ts order (the
    reference broadcasts edges to all sampler subtasks); sampler i
    reservoir-samples one edge (P=1/n on the n-th edge), picks a
    random third vertex, and sets beta=1 iff BOTH closing edges
    arrive afterwards. estimate = mean(beta) * |E| * (|V| - 2)
    (TriangleSummer, :138-174). Deterministic under ``seed``.

    Samplers are data-parallel: the sampler-id table is distributed
    and the (small) edge list is broadcast to each sampler partition
    — the same replication topology as the reference's
    ``edges.broadcast()``. Returns (n_edges, n_vertices, estimate).
    """
    spark = edges.sparkSession
    pdf = edges.select("src", "dst", "ts").orderBy("ts", "src", "dst").toPandas()
    src = pdf["src"].to_numpy()
    dst = pdf["dst"].to_numpy()
    verts = np.unique(np.concatenate([src, dst]))
    n_edges, n_verts = len(src), len(verts)
    bsrc = spark.sparkContext.broadcast(src)
    bdst = spark.sparkContext.broadcast(dst)
    bverts = spark.sparkContext.broadcast(verts)

    def run_samplers(pdf_iter):
        for chunk in pdf_iter:
            betas = []
            for sid in chunk["sampler_id"].tolist():
                rng = np.random.default_rng((seed, sid))
                s = bsrc.value
                d = bdst.value
                vs = bverts.value
                sample_e = -1
                third = -1
                seen1 = seen2 = False
                for i in range(len(s)):
                    if rng.random() < 1.0 / (i + 1):
                        sample_e = i
                        # third vertex from V \ {src, trg} (rejection
                        # sampling, as the reference does) — sampling
                        # from all of V would bias the estimate low by
                        # (|V|-2)/|V| since an endpoint third can
                        # never close the wedge
                        a0, b0 = int(s[i]), int(d[i])
                        while True:
                            third = int(vs[rng.integers(0, len(vs))])
                            if third != a0 and third != b0:
                                break
                        seen1 = seen2 = False
                        continue
                    if sample_e >= 0:
                        a, b = int(s[sample_e]), int(d[sample_e])
                        u, v = int(s[i]), int(d[i])
                        if {u, v} == {a, third}:
                            seen1 = True
                        elif {u, v} == {b, third}:
                            seen2 = True
                betas.append(1 if (seen1 and seen2) else 0)
            yield pd.DataFrame({"beta": betas})

    samplers = spark.range(num_samplers).select(
        F.col("id").alias("sampler_id")
    )
    betas = samplers.mapInPandas(run_samplers, schema="beta int")
    return betas.agg(
        F.lit(n_edges).alias("n_edges"),
        F.lit(n_verts).alias("n_vertices"),
        (F.avg("beta") * n_edges * (n_verts - 2)).alias("estimate"),
    )
