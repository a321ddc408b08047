"""Graph-slice golden tests (model: TestSlice.java:81-229 —
slice × {fold,reduce,apply} × {OUT,IN,ALL}). The reference's test
windows contain the whole 7-edge sample graph; we use a 1-day window
over the fixture's 7-second span for the same effect, plus a genuine
multi-window case."""

import pandas as pd
from pyspark.sql import functions as F

from gelly_streaming_spark import fixtures
from gelly_streaming_spark.edges import EdgeStream

WIN = "1 day"


def by_vertex(df):
    return {r["vertex"]: r["value"] for r in df.collect()}


def test_slice_out_sum(sample_edges):
    got = by_vertex(EdgeStream(sample_edges).slice(WIN, "out").reduce_on_edges(F.sum("val")))
    assert got == {1: 25, 2: 23, 3: 69, 4: 45, 5: 51}


def test_slice_in_sum(sample_edges):
    got = by_vertex(EdgeStream(sample_edges).slice(WIN, "in").reduce_on_edges(F.sum("val")))
    assert got == {2: 12, 3: 36, 4: 34, 5: 80, 1: 51}


def test_slice_all_sum(sample_edges):
    got = by_vertex(EdgeStream(sample_edges).slice(WIN, "all").reduce_on_edges(F.sum("val")))
    assert got == {1: 76, 2: 35, 3: 105, 4: 79, 5: 131}


def test_slice_fold_min(sample_edges):
    got = by_vertex(EdgeStream(sample_edges).slice(WIN, "out").fold_neighbors(F.min("val")))
    assert got == {1: 12, 2: 23, 3: 34, 4: 45, 5: 51}


def test_slice_apply_on_neighbors(sample_edges):
    """applyOnNeighbors: UDF sees the full neighbor set, may emit
    0..n rows — here: emit (vertex, max neighbor id) for panes with
    >= 2 neighbors."""

    def biggest(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vertex": [], "value": []})
        return pd.DataFrame({"vertex": [key[1]], "value": [pdf["dst"].max()]})

    out = (
        EdgeStream(sample_edges)
        .slice(WIN, "out")
        .apply_on_neighbors(biggest, "vertex long, value long")
    )
    assert by_vertex(out) == {1: 3, 3: 5}


def test_slice_multi_window(spark):
    """Edges 2 s apart with 3-second tumbling windows — per-pane sums
    split by event time."""
    pdf = fixtures.edges_pdf([(1, 2, 10), (1, 3, 20), (1, 4, 40)])
    pdf["ts"] = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-01 00:00:04"], utc=True
    )
    df = spark.createDataFrame(pdf, schema="src long, dst long, val long, ts timestamp")
    out = EdgeStream(df).slice("3 seconds", "out").reduce_on_edges(F.sum("val"))
    got = {(r["win"]["start"].second, r["vertex"]): r["value"] for r in out.collect()}
    assert got == {(0, 1): 30, (3, 1): 40}
