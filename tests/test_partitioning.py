"""Partitioner-family tests (SURVEY.md §2.9).

Property-based in the reference's spirit: the fork's 17k-LoC
partitioner benchmark mains measure load balance / replication /
edge-cut per partitioner — we pin those properties directly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gelly_streaming_spark.operators import partitioning as pt


@pytest.fixture(scope="module")
def star_edges(spark):
    # hub 0 connected to 1..40 (plus a few leaf-leaf edges)
    rows = [(0, i) for i in range(1, 41)] + [(1, 2), (3, 4)]
    pdf = pd.DataFrame(rows, columns=["src", "dst"])
    pdf["val"] = 1
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        range(len(pdf)), unit="s"
    )
    return spark.createDataFrame(
        pdf, schema="src long, dst long, val long, ts timestamp"
    )


def test_hash_edges_assignment(star_edges):
    out = pt.hash_edges(star_edges, 8)
    parts = [r["part"] for r in out.collect()]
    assert all(0 <= p < 8 for p in parts)
    # deterministic: same src -> same part
    hub_parts = {
        r["part"] for r in out.filter(F.col("src") == 0).collect()
    }
    assert len(hub_parts) == 1


def test_dbh_hashes_lower_degree_endpoint(star_edges):
    out = pt.dbh(star_edges, 8)
    # hub (degree 40) edges must be hashed by the leaf -> spread over
    # many parts; the hub gets replicated, leaves do not
    hub_edges = out.filter((F.col("src") == 0) | (F.col("dst") == 0))
    n_parts_hub = hub_edges.select("part").distinct().count()
    assert n_parts_hub > 4  # spread across machines
    m = pt.partition_metrics(out).collect()[0]
    assert m["n_parts"] <= 8 and m["total_edges"] == 42


def test_hdrf_balances_load(star_edges):
    out = pt.hdrf(star_edges, 4, lam=2.0)
    loads = {
        r["part"]: r["load"]
        for r in out.groupBy("part").agg(F.count(F.lit(1)).alias("load")).collect()
    }
    assert sum(loads.values()) == 42
    assert max(loads.values()) - min(loads.values()) <= 4  # λ=2 keeps it tight


def test_greedy_partition_assigns_all(star_edges):
    out = pt.greedy_partition(star_edges, 4)
    assert out.count() == 42
    assert out.filter((F.col("part") < 0) | (F.col("part") >= 4)).count() == 0


def test_grid_constraint_sets_intersect():
    sets = pt.grid_constraint_sets(9)
    for i in range(9):
        for j in range(9):
            assert set(sets[i]) & set(sets[j]), (i, j)


def test_pds_generator():
    # p=2 -> k=7, difference set of size 3 covering Z_7 \ {0}
    ds = pt.pds_generator(2)
    assert ds is not None and len(ds) == 3
    diffs = {(a - b) % 7 for a in ds for b in ds if a != b}
    assert diffs == set(range(1, 7))


def test_grid_partition_respects_sets(star_edges):
    out = pt.grid_partition(star_edges, 4)
    sets = pt.grid_constraint_sets(4)
    for r in out.collect():
        su = set(sets[r["src"] % 4])
        sv = set(sets[r["dst"] % 4])
        allowed = (su & sv) or (su | sv)
        assert r["part"] in allowed


def test_fennel_vertices(spark):
    # ring of 12 vertices: fennel should produce contiguous-ish balanced parts
    adj = spark.createDataFrame(
        [(i, [(i - 1) % 12, (i + 1) % 12]) for i in range(12)],
        schema="vertex long, neighbors array<long>",
    )
    out = pt.fennel_vertices(adj, 3)
    loads = {
        r["part"]: r["n"]
        for r in out.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(loads.values()) == 12
    assert max(loads.values()) <= 8  # no total collapse onto one part


def test_linear_greedy_vertices(spark):
    adj = spark.createDataFrame(
        [(i, [(i + 1) % 10]) for i in range(10)],
        schema="vertex long, neighbors array<long>",
    )
    out = pt.linear_greedy_vertices(adj, 2, capacity=6)
    loads = [r["n"] for r in out.groupBy("part").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert sum(loads) == 10 and max(loads) <= 6


def test_partition_metrics_known_values(spark):
    pdf = pd.DataFrame(
        {"src": [1, 1, 2], "dst": [2, 3, 3], "part": [0, 1, 0]}
    )
    df = spark.createDataFrame(pdf, schema="src long, dst long, part int")
    m = pt.partition_metrics(df).collect()[0]
    assert m["n_parts"] == 2 and m["total_edges"] == 3
    # replicas: v1 {0,1}, v2 {0}, v3 {0,1} -> 5 replicas / 3 vertices
    assert m["total_replicas"] == 5 and m["vertex_cut"] == 2
    assert abs(m["replication_factor"] - 5 / 3) < 1e-12
