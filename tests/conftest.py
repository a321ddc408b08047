from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from gelly_streaming_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("gelly-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sample_edges(spark):
    """B1 operator sample graph (GraphStreamTestUtils.java:56-67)."""
    from gelly_streaming_spark import fixtures

    return spark.createDataFrame(
        fixtures.edges_pdf(fixtures.SAMPLE_GRAPH),
        schema="src long, dst long, val long, ts timestamp",
    )
