"""Layer-2 operator golden tests over the 7-edge sample graph
(model: TestMapEdges/TestFilter*/TestReverse/TestUndirected/
TestDistinct/TestUnion/TestGetDegrees/TestNumberOfEntities)."""

from pyspark.sql import functions as F

from gelly_streaming_spark import fixtures
from gelly_streaming_spark.edges import EdgeStream, edges_from_transcripts, fixture_edges_from_transcripts

SAMPLE = {(s, d, v) for s, d, v in fixtures.SAMPLE_GRAPH}


def rows(df, cols=("src", "dst", "val")):
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def test_creation(sample_edges):
    es = EdgeStream(sample_edges)
    assert rows(es.df) == SAMPLE


def test_map_edges(sample_edges):
    es = EdgeStream(sample_edges).map_edges(F.col("val") * 10)
    assert rows(es.df) == {(s, d, v * 10) for s, d, v in fixtures.SAMPLE_GRAPH}


def test_filter_edges(sample_edges):
    es = EdgeStream(sample_edges).filter_edges(F.col("val") > 20)
    assert rows(es.df) == {t for t in SAMPLE if t[2] > 20}


def test_filter_vertices(sample_edges):
    es = EdgeStream(sample_edges).filter_vertices(lambda c: c > 1)
    assert rows(es.df) == {t for t in SAMPLE if t[0] > 1 and t[1] > 1}


def test_reverse(sample_edges):
    es = EdgeStream(sample_edges).reverse()
    assert rows(es.df) == {(d, s, v) for s, d, v in fixtures.SAMPLE_GRAPH}


def test_undirected(sample_edges):
    es = EdgeStream(sample_edges).undirected()
    expect = SAMPLE | {(d, s, v) for s, d, v in fixtures.SAMPLE_GRAPH}
    assert rows(es.df) == expect


def test_canonical(sample_edges):
    es = EdgeStream(sample_edges).canonical()
    assert rows(es.df) == {(min(s, d), max(s, d), v) for s, d, v in fixtures.SAMPLE_GRAPH}


def test_distinct_on_doubled_input(sample_edges):
    doubled = EdgeStream(sample_edges.unionByName(sample_edges))
    assert doubled.df.count() == 14
    es = doubled.distinct()
    assert rows(es.df, ("src", "dst")) == {(s, d) for s, d, _ in fixtures.SAMPLE_GRAPH}
    assert es.df.count() == 7


def test_union_of_split_graphs(spark, sample_edges):
    pdf = fixtures.edges_pdf(fixtures.SAMPLE_GRAPH)
    a = spark.createDataFrame(pdf.iloc[:4], schema="src long, dst long, val long, ts timestamp")
    b = spark.createDataFrame(pdf.iloc[4:], schema="src long, dst long, val long, ts timestamp")
    es = EdgeStream(a).union(EdgeStream(b))
    assert rows(es.df) == SAMPLE


def test_get_vertices(sample_edges):
    vs = EdgeStream(sample_edges).get_vertices()
    assert {r["vertex_id"] for r in vs.collect()} == {1, 2, 3, 4, 5}


def test_degrees(sample_edges):
    es = EdgeStream(sample_edges)
    deg = {r["vertex"]: r["degree"] for r in es.get_degrees().collect()}
    # degrees of the 7-edge sample graph (both endpoints)
    assert deg == {1: 3, 2: 2, 3: 4, 4: 2, 5: 3}
    out = {r["vertex"]: r["degree"] for r in es.get_out_degrees().collect()}
    assert out == {1: 2, 2: 1, 3: 2, 4: 1, 5: 1}
    ind = {r["vertex"]: r["degree"] for r in es.get_in_degrees().collect()}
    assert ind == {2: 1, 3: 2, 4: 1, 5: 2, 1: 1}


def test_degree_trace(sample_edges):
    """Per-update running degree trace (TestGetDegrees.java:69-121)."""
    es = EdgeStream(sample_edges)
    trace = es.degree_trace("out").filter(F.col("vertex") == 1)
    got = sorted(r["degree"] for r in trace.collect())
    assert got == [1, 2]  # vertex 1 emits out-degree 1 then 2


def test_number_of_entities(sample_edges):
    es = EdgeStream(sample_edges)
    assert es.number_of_vertices().collect()[0]["n_vertices"] == 5
    assert es.number_of_edges().collect()[0]["n_edges"] == 7


def test_build_neighborhood(sample_edges):
    nb = EdgeStream(sample_edges).build_neighborhood(directed=True)
    final = {
        r["src"]: r["neighborhood"]
        for r in nb.orderBy("src", "ts").collect()
    }
    assert final[1] == [2, 3]
    assert final[3] == [4, 5]


def test_transcript_adapter(spark):
    pdf = fixtures.make_transcripts(n_convs=5, turns_per_conv=10)
    tdf = spark.createDataFrame(pdf)
    es = edges_from_transcripts(tdf)
    n_expected = int((pdf["tool"] != "none").sum())
    assert es.df.count() == n_expected
    row = es.df.first()
    assert "#" in row["src"] and "#" in row["dst"] and row["val"] == 1


def test_fixture_transcript_roundtrip(spark):
    """B-fixture graphs encoded as transcripts must decode to the
    exact edge table (FIXTURES.md transcript encoding)."""
    tdf = spark.createDataFrame(
        fixtures.graph_as_transcripts("cc", fixtures.CC_GRAPH)
    )
    es = fixture_edges_from_transcripts(tdf)
    assert rows(es.df, ("src", "dst")) == {(s, d) for s, d in fixtures.CC_GRAPH}
