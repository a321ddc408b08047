"""Streaming latency/throughput metrics.

The reference measures with counting sinks and runtime log hooks
(partitioner/tests/TimestampingSink.java:10-40, Hdrf.java:42-51);
Structured Streaming's native equivalent is a StreamingQueryListener
over per-batch progress events — rows/sec, batch durations, and
per-query totals, collectable as a DataFrame for the lineage/metrics
table (north_rule).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Records every micro-batch's progress: rows, processed-rows/sec,
    batch duration. Attach with ``spark.streams.addListener``."""

    def __init__(self):
        self.progress: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        self.progress.append(
            {
                "query_id": p.get("id"),
                "batch_id": p.get("batchId"),
                "num_input_rows": p.get("numInputRows", 0),
                "processed_rows_per_second": p.get("processedRowsPerSecond", 0.0),
                "duration_ms": (p.get("durationMs") or {}).get("triggerExecution", 0),
            }
        )

    def onQueryTerminated(self, event):
        pass

    def totals(self) -> dict:
        rows = sum(p["num_input_rows"] for p in self.progress)
        ms = sum(p["duration_ms"] for p in self.progress)
        return {
            "batches": len(self.progress),
            "rows": rows,
            "wall_ms": ms,
            "rows_per_sec": round(rows / (ms / 1000.0), 1) if ms else 0.0,
        }

    def as_dataframe(self, spark: SparkSession):
        if not self.progress:
            return spark.createDataFrame(
                [],
                schema="query_id string, batch_id long, num_input_rows long, "
                "processed_rows_per_second double, duration_ms long",
            )
        return spark.createDataFrame(self.progress)
