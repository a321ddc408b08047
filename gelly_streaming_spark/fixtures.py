"""Deterministic test fixtures (see /root/repo/FIXTURES.md).

Two kinds:

A. The canonical transcript table — the engine's one true input shape
   (BASELINE.json input_hint): ``(conv_id string, turn_idx int,
   role string, text string, tool string, ts timestamp)``. Seeded,
   parameterized, skewed (a few hot conversations), with a bounded
   out-of-order fraction to exercise watermarks.

B. The reference repo's literal golden-test graphs, both as raw edge
   tables and re-encoded as transcript rows so every golden output is
   reachable from shape (A). Sources cited per fixture (reference
   file:line under /root/reference).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

ROLES = ["user", "assistant", "system"]
TOOLS = ["bash", "read", "write", "grep", "edit", "none"]

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def make_transcripts(
    n_convs: int = 50,
    turns_per_conv: int = 40,
    hot_conv_fraction: float = 0.05,
    hot_multiplier: int = 10,
    out_of_order_fraction: float = 0.1,
    max_disorder_s: int = 20,
    session_gap_s: int = 300,
    seed: int = 42,
) -> pd.DataFrame:
    """Deterministic synthetic transcript table (pandas).

    - ``turn_idx`` is 0-based contiguous per conv_id (stable total
      order within a conversation).
    - ``text`` is ``t-{conv_id}-{turn_idx}`` so per-turn text equality
      is checkable (input_hint invariant).
    - A ``hot_conv_fraction`` of conversations get ``hot_multiplier``x
      the turns (key skew for salting tests).
    - ``ts`` mostly ascends per conversation; an
      ``out_of_order_fraction`` of turns are shifted earlier by up to
      ``max_disorder_s`` seconds (bounded, <= watermark delay).
    - Occasional gaps > ``session_gap_s`` split conversations into
      multiple sessions (for session_window tests).
    """
    rng = np.random.default_rng(seed)
    n_hot = max(0, int(round(n_convs * hot_conv_fraction)))
    rows: dict[str, list] = {c: [] for c in TRANSCRIPT_COLUMNS}
    for ci in range(n_convs):
        conv_id = f"c{ci:05d}"
        n_turns = turns_per_conv * (hot_multiplier if ci < n_hot else 1)
        # base inter-turn gaps: 1-30 s, with ~5% long gaps that break sessions
        gaps = rng.integers(1, 31, size=n_turns).astype("int64")
        long_mask = rng.random(n_turns) < 0.05
        gaps[long_mask] += session_gap_s + rng.integers(60, 600, size=int(long_mask.sum()))
        base = np.cumsum(gaps) + int(rng.integers(0, 3600))
        disorder = (rng.random(n_turns) < out_of_order_fraction) * rng.integers(
            1, max_disorder_s + 1, size=n_turns
        )
        ts_s = base - disorder
        roles = rng.choice(ROLES, size=n_turns, p=[0.45, 0.45, 0.10])
        tools = rng.choice(TOOLS, size=n_turns, p=[0.2, 0.2, 0.15, 0.15, 0.1, 0.2])
        for ti in range(n_turns):
            rows["conv_id"].append(conv_id)
            rows["turn_idx"].append(ti)
            rows["role"].append(str(roles[ti]))
            rows["text"].append(f"t-{conv_id}-{ti}")
            rows["tool"].append(str(tools[ti]))
            rows["ts"].append(EPOCH + timedelta(seconds=int(ts_s[ti])))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def make_transcripts_spark(
    spark,
    n_convs: int = 100000,
    turns_per_conv: int = 40,
    hot_conv_fraction: float = 0.05,
    hot_multiplier: int = 10,
    out_of_order_fraction: float = 0.1,
    max_disorder_s: int = 20,
    session_gap_s: int = 300,
    seed: int = 42,
):
    """Vectorized Spark-native transcript generator — same schema and
    statistical shape as ``make_transcripts`` but generated entirely
    from Catalyst expressions (hash-based determinism, no Python
    loop), so 10^7-row inputs for scaling runs materialize in seconds.
    The per-conversation cumulative timestamp needs one window (one
    shuffle on conv_id)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    n_hot = max(0, int(round(n_convs * hot_conv_fraction)))
    convs = spark.range(n_convs).select(
        F.col("id").alias("ci"),
        F.when(F.col("id") < n_hot, turns_per_conv * hot_multiplier)
        .otherwise(turns_per_conv)
        .alias("n_turns"),
    )
    t = convs.select(
        "ci",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    def h(*cols, salt: str):
        return F.abs(F.xxhash64(F.lit(f"{seed}-{salt}"), *cols))

    gap = (h("ci", "turn_idx", salt="gap") % 30 + 1).cast("long")
    long_gap = F.when(
        h("ci", "turn_idx", salt="lg") % 20 == 0,
        F.lit(session_gap_s).cast("long")
        + (h("ci", "turn_idx", salt="lg2") % 540 + 60).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    t = t.withColumn("gap", gap + long_gap)
    w = W.partitionBy("ci").orderBy("turn_idx").rowsBetween(
        W.unboundedPreceding, 0
    )
    base = F.sum("gap").over(w) + (h("ci", salt="base") % 3600).cast("long")
    disorder = F.when(
        h("ci", "turn_idx", salt="ooo") % 1000
        < int(out_of_order_fraction * 1000),
        (h("ci", "turn_idx", salt="d") % max_disorder_s + 1).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    roles = F.array(*[F.lit(r) for r in ROLES])
    tools = F.array(*[F.lit(x) for x in TOOLS])
    return t.select(
        F.format_string("c%05d", F.col("ci")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        roles[(h("ci", "turn_idx", salt="r") % len(ROLES)).cast("int")].alias(
            "role"
        ),
        F.format_string("t-c%05d-%d", F.col("ci"), F.col("turn_idx")).alias(
            "text"
        ),
        tools[(h("ci", "turn_idx", salt="t") % len(TOOLS)).cast("int")].alias(
            "tool"
        ),
        F.timestamp_seconds(
            F.lit(int(EPOCH.timestamp())) + base - disorder
        ).alias("ts"),
    )


# ---------------------------------------------------------------------------
# B. Reference golden-test graphs (edge lists as (src, dst, val) or with ts)
# ---------------------------------------------------------------------------

# B1: operator sample graph — GraphStreamTestUtils.java:56-67
SAMPLE_GRAPH = [
    (1, 2, 12),
    (1, 3, 13),
    (2, 3, 23),
    (3, 4, 34),
    (3, 5, 35),
    (4, 5, 45),
    (5, 1, 51),
]

# B2: connected-components graph — example/test/ConnectedComponentsTest.java:29-38
CC_GRAPH = [(1, 2), (1, 3), (2, 3), (1, 5), (6, 7), (8, 9)]
CC_COMPONENTS = [{1, 2, 3, 5}, {6, 7}, {8, 9}]

# B3: bipartite graph (positive) — BipartitenessCheckTest.java:26-36
BIPARTITE_GRAPH = [(1, 2), (1, 3), (1, 4), (4, 5), (4, 7), (4, 9)]
BIPARTITE_PARTS = ({1, 5, 7, 9}, {2, 3, 4})

# B4: non-bipartite graph (odd cycle) — NonBipartitnessCheckTest.java:15-25
NON_BIPARTITE_GRAPH = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 7), (4, 1)]

# B5: windowed-triangles graph, (src, dst, ts_ms) — util/ExamplesTestData.java:21-34
TRIANGLE_WINDOW_GRAPH = [
    (1, 2, 100), (1, 3, 150), (3, 2, 200), (2, 4, 250), (3, 4, 300),
    (3, 5, 350), (4, 5, 400), (4, 6, 450), (6, 5, 500), (5, 7, 550),
    (6, 7, 600), (8, 6, 650), (7, 8, 700), (7, 9, 750), (8, 9, 800),
    (10, 8, 850), (9, 10, 900), (9, 11, 950), (10, 11, 1000),
]
# golden with 400ms tumbling windows: (count, window max ts) — ExamplesTestData.java:33-34
TRIANGLE_WINDOW_GOLDEN = [(2, 399), (2, 1199), (3, 799)]

# B6: signed degree stream — ExamplesTestData.java:36-60
SIGNED_DEGREE_STREAM = [
    (1, 2, "+"), (2, 3, "+"), (1, 4, "+"), (2, 3, "-"), (3, 4, "+"), (1, 2, "-"),
]
SIGNED_DEGREE_STREAM_ZERO = SIGNED_DEGREE_STREAM + [(2, 3, "-")]

# B7: exact-triangle-count graph — example/ExactTriangleCount.java:206-221
EXACT_TRIANGLE_GRAPH = [
    (1, 2), (2, 3), (4, 5), (3, 5), (3, 4), (6, 7), (7, 8), (10, 11),
    (11, 12), (10, 12), (12, 13), (13, 14), (12, 14), (6, 8), (1, 3),
]


def edges_pdf(edges: list[tuple], with_val: bool | None = None) -> pd.DataFrame:
    """Edge list → pandas frame ``(src, dst, val, ts)``.

    ts is synthesized as EPOCH + row_idx seconds unless the fixture
    carries its own timestamps (3-tuples where the 3rd element is a
    millisecond ts, as in B5, are passed via ``ms_ts=True`` helpers).
    """
    if with_val is None:
        with_val = len(edges[0]) == 3
    rows = []
    for i, e in enumerate(edges):
        src, dst = e[0], e[1]
        val = int(e[2]) if with_val else 1
        rows.append((int(src), int(dst), val, EPOCH + timedelta(seconds=i)))
    return pd.DataFrame(rows, columns=["src", "dst", "val", "ts"])


def timestamped_edges_pdf(edges: list[tuple[int, int, int]]) -> pd.DataFrame:
    """B5-style (src, dst, ts_ms) list → ``(src, dst, val, ts)``."""
    rows = [
        (int(s), int(d), 1, EPOCH + timedelta(milliseconds=int(ms)))
        for s, d, ms in edges
    ]
    return pd.DataFrame(rows, columns=["src", "dst", "val", "ts"])


def graph_as_transcripts(name: str, edges: list[tuple]) -> pd.DataFrame:
    """Encode a B-fixture graph as transcript rows (FIXTURES.md).

    vertex ids become role/tool labels within one synthetic
    conversation: role=f"v{src}", tool=f"v{dst}",
    text=f"t-fix-{name}-{i}", ts=EPOCH+i seconds (B5 keeps its own ms
    timestamps). The edges_from_transcripts adapter must reproduce the
    edge table exactly.
    """
    rows: dict[str, list] = {c: [] for c in TRANSCRIPT_COLUMNS}
    conv = f"fix-{name}"
    for i, e in enumerate(edges):
        src, dst = e[0], e[1]
        if name == "triwin":  # B5 carries ms timestamps
            ts = EPOCH + timedelta(milliseconds=int(e[2]))
        else:
            ts = EPOCH + timedelta(seconds=i)
        rows["conv_id"].append(conv)
        rows["turn_idx"].append(i)
        rows["role"].append(f"v{src}")
        rows["text"].append(f"t-{conv}-{i}")
        rows["tool"].append(f"v{dst}")
        rows["ts"].append(ts)
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df
