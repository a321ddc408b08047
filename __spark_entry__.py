"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (streaming-CC semantics in
batch form: the merge-tree connected components over the events-derived
edge stream, SURVEY.md §2.6-2.7) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the training-data ops (dedup / similarity / text / multimodal);
implementations live in ``gelly_streaming_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gelly_streaming_spark.queries import QUERIES, q_connected_components


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: merge-tree streaming
    connected components (union-find partials + log-depth combine)
    over the events-derived edge stream. Returns (vertex, component)."""
    return q_connected_components(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data pipeline ops). Each callable takes (spark, sf_dir)
    and returns a DataFrame with stable, oracle-matching column names."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins for every hash-checkable query.
    Keys absent here (spanner, matching, partition_hdrf) are
    arrival-order-dependent / sequential parity ops -> rows-only
    check; each has a hash-checked scale twin or invariant query
    (spanner_components, matching_dominant, partition_hdrf_scalable)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
