"""Ordered-sequence analytics over keyed event streams.

Transcript turns and interaction events are SEQUENCES per conversation
/ user; the graph operators elsewhere treat them as edge sets. This
module adds the sequence-aware view: consecutive-pair (bigram)
transition edges per key, i.e. the empirical Markov chain over labels
— "after `view`, users `click` 38% of the time". The reference has no
sequence operators (its streams are unordered edge events); this is a
first-class training-data op per the build brief (transcript tool-flow
mining: (prev_tool -> tool) transition edges per conversation).

Plan shape (scale-audited): one shuffle for the per-key window
(partitioned by the sequence key — the SAME hash partitioning every
sessionization query already uses, so at 100 TB this co-locates with
session state), `lag` inside the window (no self-join), then one
partial-aggregated groupBy on the (src, dst) label pair whose
cardinality is |labels|² — synopsis-sized, broadcastable. The
transition probability is ONE double division of two exact BIGINTs
(cross-engine bit-identical; the oracle-determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_edges(
    df: DataFrame,
    key: str,
    label: str,
    order_by: list[str],
) -> DataFrame:
    """Per-key consecutive-pair transition edges with counts and
    empirical probabilities.

    ``order_by`` must be a TOTAL order within each key (e.g.
    ``["ts", "event_id"]``) — ties would make the bigram set
    nondeterministic across engines.

    Returns (src_label, dst_label, n_transitions, prob) where ``prob``
    = n_transitions / (all transitions leaving src_label).
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    pairs = (
        df.select(
            F.lag(F.col(label)).over(w).alias("src_label"),
            F.col(label).alias("dst_label"),
        )
        .filter(F.col("src_label").isNotNull())
        .groupBy("src_label", "dst_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    # src totals as a window sum over the ALREADY-AGGREGATED pairs
    # (|labels|² rows): a groupBy+join formulation re-derives the
    # whole scan→window→agg subtree for the totals side (Spark does
    # not reuse the duplicated subtree — the same pitfall PLANS.md
    # documents for iterative plans), doubling the 100 TB scan. The
    # window costs one synopsis-sized exchange instead.
    wt = Window.partitionBy("src_label")
    return pairs.select(
        "src_label",
        "dst_label",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wt).cast("double")
        ).alias("prob"),
    )
