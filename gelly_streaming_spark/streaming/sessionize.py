"""Conversation sessionization (north_rule).

Not in the reference (it has only tumbling windows,
SimpleEdgeStream.java:119-151); required by BASELINE.json: session
windows with gap timeout over the transcript stream, keyed by
conv_id, watermarked on ts.

Streaming: the built-in ``session_window(ts, gap)`` — state-backed,
merge-on-overlap, closed by the watermark. Batch golden: the same
``session_window`` expression (Spark supports it in batch), plus a
window/lag formulation (``sessionize_batch_lag``) as an independent
cross-check and the DuckDB-oracle-friendly shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    transcripts: DataFrame,
    gap: str = "5 minutes",
    watermark: str | None = "1 minute",
) -> DataFrame:
    """Per (conv_id, session) aggregates: turn count, distinct tools,
    session span. Works on batch and streaming frames (streaming
    needs the watermark for append mode)."""
    df = transcripts
    if df.isStreaming and watermark:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("sess"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count_distinct("tool").alias("n_tools"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_turns",
            "n_tools",
            "first_turn",
            "last_turn",
        )
    )


def sessionize_batch_lag(transcripts: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Batch-only independent formulation: lag(ts) + cumulative sum of
    gap breaks — returns (conv_id, session_id, sess_start, n_turns).
    Used to cross-check ``sessionize`` and as the SQL-oracle shape
    (plain window functions, no session_window needed in DuckDB)."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gapped = transcripts.withColumn(
        "new_sess",
        (
            F.coalesce(
                F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w),
                F.lit(gap_seconds + 1),
            )
            > gap_seconds
        ).cast("int"),
    )
    sess = gapped.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("conv_id", "session_id").agg(
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.count(F.lit(1)).alias("n_turns"),
    )
