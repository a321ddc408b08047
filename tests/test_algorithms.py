"""Layer-3 algorithm golden tests on the merge-tree engine
(model: ConnectedComponentsTest, BipartitenessCheckTest,
NonBipartitnessCheckTest)."""

from collections import defaultdict

import pytest

from gelly_streaming_spark import fixtures
from gelly_streaming_spark.edges import EdgeStream
from gelly_streaming_spark.plans import (
    BipartitenessCheck,
    ConnectedComponents,
    DegreeCheck,
    Spanner,
)
from gelly_streaming_spark.plans.bipartiteness import verdict


def make_edges(spark, graph):
    return EdgeStream(
        spark.createDataFrame(
            fixtures.edges_pdf(graph),
            schema="src long, dst long, val long, ts timestamp",
        )
    )


def component_sets(df):
    groups = defaultdict(set)
    for r in df.collect():
        groups[r["component"]].add(r["vertex"])
    return sorted(tuple(sorted(g)) for g in groups.values())


@pytest.mark.parametrize("num_shards,salt", [(1, 1), (4, 1), (4, 2)])
def test_connected_components_golden(spark, num_shards, salt):
    """CC_GRAPH -> {1,2,3,5},{6,7},{8,9} at several shard/salt
    configs (order-insensitive set compare,
    ConnectedComponentsTest.java:20-87)."""
    es = make_edges(spark, fixtures.CC_GRAPH)
    out = es.aggregate(ConnectedComponents(), num_shards=num_shards, salt=salt)
    assert component_sets(out) == [(1, 2, 3, 5), (6, 7), (8, 9)]


def test_cc_component_is_min_vertex(spark):
    es = make_edges(spark, fixtures.CC_GRAPH)
    out = es.aggregate(ConnectedComponents(), num_shards=4)
    comp = {r["vertex"]: r["component"] for r in out.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 1, 6: 6, 7: 6, 8: 8, 9: 8}


def test_bipartite_positive(spark):
    es = make_edges(spark, fixtures.BIPARTITE_GRAPH)
    out = es.aggregate(BipartitenessCheck(), num_shards=3).cache()
    assert verdict(out) is True
    col = {r["vertex"]: r["color"] for r in out.collect()}
    parts = (
        {v for v, c in col.items() if c == 0},
        {v for v, c in col.items() if c == 1},
    )
    assert parts == fixtures.BIPARTITE_PARTS


def test_bipartite_negative(spark):
    es = make_edges(spark, fixtures.NON_BIPARTITE_GRAPH)
    out = es.aggregate(BipartitenessCheck(), num_shards=3).cache()
    assert verdict(out) is False
    # (false, {}) golden: no real coloring rows
    assert [r["vertex"] for r in out.collect()] == [-1]


def test_degree_check_merge_tree_matches_native(spark, sample_edges):
    es = EdgeStream(sample_edges)
    tree = {
        (r["vertex"], r["degree"])
        for r in es.aggregate(DegreeCheck(), num_shards=4).collect()
    }
    native = {(r["vertex"], r["degree"]) for r in es.get_degrees().collect()}
    assert tree == native == {(1, 3), (2, 2), (3, 4), (4, 2), (5, 3)}


def test_spanner_properties(spark, sample_edges):
    """Spanner output preserves connectivity within the stretch bound
    on the sample graph (edge set is arrival-order dependent, like
    the reference — assert properties, not an exact edge list)."""
    from gelly_streaming_spark.functions.synopses import AdjacencyListGraph

    k = 2
    es = EdgeStream(sample_edges)
    out = es.aggregate(Spanner(k=k), num_shards=2)
    spanner = AdjacencyListGraph()
    for r in out.collect():
        spanner.add_edge(r["src"], r["dst"])
    # every original edge (u,v) must have dist_spanner(u,v) <= k^2:
    # each rejected edge had a path <= k at rejection time, and one
    # merge level may replace each path edge by another <= k path
    # (same compounding as the reference's Spanner.merge,
    # Spanner.java:93-117)
    for s, d, _ in fixtures.SAMPLE_GRAPH:
        assert spanner.bounded_bfs(min(s, d), max(s, d), k * k), (s, d)
    # and the spanner uses no edges outside the original graph
    orig = {(min(s, d), max(s, d)) for s, d, _ in fixtures.SAMPLE_GRAPH}
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got <= orig


def test_scalable_cc_quotient_resolution(spark):
    """connected_components (sharded fold + distributed quotient
    resolution) must link chains that span many shards — the case the
    funnel-free combine has to get right."""
    from gelly_streaming_spark.plans.connected_components import (
        connected_components,
    )

    # path graph 0-1-2-...-63 (one long chain) + isolated pair
    edges = [(i, i + 1) for i in range(63)] + [(100, 101)]
    df = spark.createDataFrame(
        [(a, b, 1, i) for i, (a, b) in enumerate(edges)],
        schema="src long, dst long, val long, sec long",
    ).selectExpr("src", "dst", "val", "timestamp_seconds(sec) as ts")
    out = {
        r["vertex"]: r["component"]
        for r in connected_components(df, num_shards=16).collect()
    }
    assert all(out[v] == 0 for v in range(64))
    assert out[100] == 100 and out[101] == 100
