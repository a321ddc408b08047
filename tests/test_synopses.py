"""Layer-1 unit tests for the pure-python synopses
(model: util/DisjointSetTest.java, util/AdjacencyListGraphTest.java)."""

from collections import defaultdict

from gelly_streaming_spark import fixtures
from gelly_streaming_spark.functions.synopses import (
    AdjacencyListGraph,
    DisjointSet,
    SignedDisjointSet,
)


def components_of(ds: DisjointSet):
    groups = defaultdict(set)
    for v, c in ds.components().items():
        groups[c].add(v)
    return sorted(tuple(sorted(g)) for g in groups.values())


def test_disjoint_set_union_find():
    ds = DisjointSet()
    for a, b, *_ in fixtures.CC_GRAPH:
        ds.union(a, b)
    assert components_of(ds) == [(1, 2, 3, 5), (6, 7), (8, 9)]


def test_disjoint_set_merge():
    d1, d2 = DisjointSet(), DisjointSet()
    for a, b in [(1, 2), (1, 3), (2, 3)]:
        d1.union(a, b)
    for a, b in [(1, 5), (6, 7), (8, 9)]:
        d2.union(a, b)
    m = DisjointSet()
    m.merge(d1.components().items())
    m.merge(d2.components().items())
    assert components_of(m) == [(1, 2, 3, 5), (6, 7), (8, 9)]


def test_signed_bipartite_positive():
    sd = SignedDisjointSet()
    for a, b in fixtures.BIPARTITE_GRAPH:
        sd.union(a, b, 1)
    col = sd.coloring()
    parts = (
        {v for v, c in col.items() if c == 0},
        {v for v, c in col.items() if c == 1},
    )
    assert parts == fixtures.BIPARTITE_PARTS


def test_signed_bipartite_negative():
    sd = SignedDisjointSet()
    for a, b in fixtures.NON_BIPARTITE_GRAPH:
        sd.union(a, b, 1)
    assert sd.failed and sd.coloring() is None


def test_signed_merge_detects_cross_shard_odd_cycle():
    sa, sb = SignedDisjointSet(), SignedDisjointSet()
    sa.union(1, 2, 1)
    sa.union(2, 3, 1)
    sb.union(3, 1, 1)
    sm = SignedDisjointSet()
    sm.merge(sa.export())
    sm.merge(sb.export())
    assert sm.failed


def test_adjacency_bounded_bfs_spanner():
    g = AdjacencyListGraph()
    assert g.maybe_add_spanner_edge(1, 2, 2)
    assert g.maybe_add_spanner_edge(2, 3, 2)
    assert not g.maybe_add_spanner_edge(1, 3, 2)  # dist 2 <= k
    assert g.bounded_bfs(1, 3, 2)
    assert not g.bounded_bfs(1, 3, 1)
