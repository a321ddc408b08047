"""Out-of-order turn reconciliation (north_rule).

A stateful stream-stream join on (conv_id, turn_idx) reconciles two
transcript feeds that may deliver the same turns out of order (e.g.
the live stream vs the reference/replayed stream): each side is
watermarked, joined within a time bound, and per-turn TEXT EQUALITY
is checked under the stable (conv_id, turn_idx) ordering — the
input_hint's per-row invariant. Unmatched or mismatching turns are
emitted for inspection.

Works identically on batch frames (full outer join) for goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_turns(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "1 minute",
    join_window: str = "2 minutes",
    how: str | None = None,
) -> DataFrame:
    """Join two transcript feeds on (conv_id, turn_idx); emit one row
    per turn with ``text_equal`` and a ``status`` in
    {match, mismatch, missing_left, missing_right} — unmatched turns
    ARE emitted (missing data is exactly what reconciliation must
    surface). Streaming frames get watermarks + a symmetric time-bound
    so Spark can expire join state.

    ``how`` defaults to full_outer for batch; streaming defaults to
    inner (pass left_outer/full_outer explicitly — Spark supports
    watermarked stream-stream outer joins, with missing-side rows
    emitted once the watermark closes the bound).

    Output: (conv_id, turn_idx, text_equal, status, l_text, r_text,
    l_ts, r_ts)
    """
    streaming = left.isStreaming or right.isStreaming
    if how is None:
        how = "inner" if streaming else "full_outer"
    l = left.select(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("text").alias("l_text"),
        F.col("ts").alias("l_ts"),
    )
    r = right.select(
        F.col("conv_id").alias("r_conv_id"),
        F.col("turn_idx").alias("r_turn_idx"),
        F.col("text").alias("r_text"),
        F.col("ts").alias("r_ts"),
    )
    if streaming:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
        cond = (
            (F.col("conv_id") == F.col("r_conv_id"))
            & (F.col("turn_idx") == F.col("r_turn_idx"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {join_window}"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {join_window}"))
        )
    else:
        cond = (F.col("conv_id") == F.col("r_conv_id")) & (
            F.col("turn_idx") == F.col("r_turn_idx")
        )
    joined = l.join(r, cond, how)
    has_l = F.col("l_text").isNotNull()
    has_r = F.col("r_text").isNotNull()
    status = (
        F.when(~has_l, F.lit("missing_left"))
        .when(~has_r, F.lit("missing_right"))
        .when(F.col("l_text") == F.col("r_text"), F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return joined.select(
        F.coalesce("conv_id", "r_conv_id").alias("conv_id"),
        F.coalesce("turn_idx", "r_turn_idx").alias("turn_idx"),
        (has_l & has_r & (F.col("l_text") == F.col("r_text"))).alias(
            "text_equal"
        ),
        status.alias("status"),
        "l_text",
        "r_text",
        "l_ts",
        "r_ts",
    )


def reconcile_summary(reconciled: DataFrame) -> DataFrame:
    """(n_turns, n_equal, n_mismatch, n_missing) rollup — missing
    turns counted separately so silent data loss can't report clean."""
    return reconciled.agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("text_equal").cast("long")).alias("n_equal"),
        F.sum((F.col("status") == "mismatch").cast("long")).alias("n_mismatch"),
        F.sum(F.col("status").startswith("missing").cast("long")).alias(
            "n_missing"
        ),
    )
