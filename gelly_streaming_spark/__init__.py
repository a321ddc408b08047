"""gelly_streaming_spark — a PySpark-native streaming-graph analytics engine.

A from-scratch rebuild (NOT a port) of the capabilities of the
Zainab-Abbas/gelly-streaming reference (a Flink 1.2 graph-streaming
library, see /root/reference): single-pass graph algorithms over
timestamped edge streams, expressed as DataFrame / Structured
Streaming pipelines so Catalyst + Tungsten pick the physical plan.

Layout
------
- ``session``     : SparkSession factory tuned for local[32] testing.
- ``fixtures``    : deterministic synthetic transcript tables + the
                    reference's golden-test graphs (FIXTURES.md).
- ``edges``       : the EdgeStream wrapper + transcript→edge adapter.
- ``operators``   : stateless edge ops, degrees, slice/windowed aggs,
                    the merge-tree aggregation engine.
- ``plans``       : library algorithms (connected components,
                    bipartiteness, spanner, triangles, matching, …).
- ``streaming``   : watermarked streaming pipelines, sessionization,
                    exactly-once foreachBatch sink, checkpoint resume.
- ``functions``   : synopses (union-find et al.), text analysis,
                    similarity / dedup primitives.
- ``sources``     : edge-stream readers (parquet / csv / text / rate).
"""

__version__ = "0.1.0"
