"""The flagship streaming pipeline (north_rule):

streaming connected components + session-window degree aggregation
over the transcript edge stream, checkpointed, exactly-once,
resumable mid-stream.

Streaming CC: Structured Streaming has no grouped-map applyInPandas
on streaming frames and no feedback loops, so the merge-tree runs
inside ``foreachBatch`` — exactly the reference's incremental
non-blocking merger (GraphAggregation.java:80-117): each micro-batch
folds its edges into partials, the previous global state (persisted
as (vertex, component) parquet, itself a union-find synopsis export)
enters the combine phase as one more partial, and the running merged
state is emitted per epoch. Epoch-keyed state + output writes make
replay after crash idempotent (exactly-once effective); resuming from
the checkpoint picks up both the source offsets and the last
committed state epoch.

State size is O(V), not O(E) — the whole point of the synopsis — so
the per-batch state read stays small even at 10^12 turns (vertices =
conversations x roles/tools << turns).

Port note (Spark 4 stateful API): ``transformWithStateInPandas``
exposes multiple typed state variables + timers per key on streaming
frames, which would let the windowed grouped-map slice
(operators/slice.apply_on_neighbors) and this CC state run as managed
per-key state INSIDE the streaming query instead of foreachBatch.
The foreachBatch formulation is kept because (a) it is the shape the
reference's incremental merger actually has, and (b) epoch-keyed
parquet state gives replay-idempotent exactly-once with inspectable
lineage; a transformWithState port changes only this module, not the
algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gelly_streaming_spark.operators.aggregation import sharded_fold
from gelly_streaming_spark.streaming.state import committed_epochs
from gelly_streaming_spark.plans.connected_components import (
    ConnectedComponents,
    resolve_partials,
)


class StreamingConnectedComponents:
    """Incremental CC over a streaming edge frame via foreachBatch.

    - ``state_path``: parquet directory of the running (vertex,
      component) global synopsis, written per epoch
      (``.../epoch=<id>``) for idempotent replay.
    - ``output_path``: per-epoch emission of the running components.
    """

    def __init__(
        self,
        state_path: str,
        vertex_type: str = "string",
        num_shards: int = 32,
        salt: int = 1,
        shard_on=None,
    ):
        self.state_path = state_path
        self.algo = ConnectedComponents(vertex_type=vertex_type)
        self.vertex_type = vertex_type
        self.num_shards = num_shards
        self.salt = salt
        # shard_on: connectivity-local sharding key (conv-prefix for
        # transcript vertex labels) — keeps each conversation in one
        # shard so the quotient resolution has almost nothing to link
        self.shard_on = shard_on

    # -- state helpers -------------------------------------------------------

    def _committed_epochs(self, spark: SparkSession) -> list[int]:
        """Only epochs whose write completed count: Spark drops a
        _SUCCESS marker at job commit — a crash mid-write leaves the
        directory without it (just _temporary/ or partial part files)
        and that epoch must be invisible to readers, or resume would
        read partial state and break exactly-once. Discovery goes
        through the Hadoop FileSystem API (streaming/state.py) so
        state may live on file:/, hdfs:/, s3a:/ — not just the
        driver's local disk. state_path and checkpointLocation must
        be created/destroyed together (a fresh checkpoint restarts
        epoch ids at 0)."""
        return committed_epochs(spark, f"{self.state_path}/state")

    def read_state(self, spark: SparkSession, upto_epoch: int | None = None) -> DataFrame | None:
        epochs = self._committed_epochs(spark)
        if upto_epoch is not None:
            epochs = [e for e in epochs if e < upto_epoch]
        if not epochs:
            return None
        return spark.read.parquet(f"{self.state_path}/state/epoch={epochs[-1]}")

    # -- the per-batch merge --------------------------------------------------

    def process_batch(self, edges: DataFrame, epoch_id: int) -> None:
        spark = edges.sparkSession
        batch_partials = sharded_fold(
            edges, self.algo, num_shards=self.num_shards, salt=self.salt,
            shard_on=self.shard_on,
        )
        prev = self.read_state(spark, upto_epoch=epoch_id)
        if prev is not None:
            # previous global state rows are valid partials: the
            # distributed quotient resolution re-links them with this
            # batch's shard folds — no O(V) funnel anywhere
            batch_partials = batch_partials.unionByName(prev)
        merged = resolve_partials(batch_partials)
        # epoch-keyed overwrite => replay-idempotent (exactly-once)
        merged.write.mode("overwrite").parquet(
            f"{self.state_path}/state/epoch={epoch_id}"
        )

    def __call__(self, edges: DataFrame, epoch_id: int) -> None:
        self.process_batch(edges, epoch_id)

    def current_components(self, spark: SparkSession) -> DataFrame | None:
        return self.read_state(spark)


def run_streaming_cc(
    transcript_stream: DataFrame,
    state_path: str,
    checkpoint_path: str,
    watermark: str = "1 minute",
    num_shards: int = 32,
    salt: int = 1,
):
    """Wire the transcript stream through the adapter into the
    incremental CC. Returns (StreamingQuery, StreamingConnectedComponents).
    """
    from gelly_streaming_spark.edges import edges_from_transcripts

    edges = edges_from_transcripts(transcript_stream, watermark=watermark).df
    cc = StreamingConnectedComponents(
        state_path, vertex_type="string", num_shards=num_shards, salt=salt,
        shard_on=F.substring_index("src", "#", 1),
    )
    q = (
        edges.writeStream.foreachBatch(cc)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .start()
    )
    return q, cc


def run_streaming_session_degrees(
    transcript_stream: DataFrame,
    sink,
    checkpoint_path: str,
    gap: str = "5 minutes",
    watermark: str = "1 minute",
):
    """Session-window degree aggregation (north_star's second leg):
    per (conv_id#role / conv_id#tool vertex, session window) edge
    counts, append-mode through the exactly-once sink. All
    Catalyst-native — the stateful session aggregation runs JVM-side.
    """
    from gelly_streaming_spark.edges import edges_from_transcripts

    edges = edges_from_transcripts(transcript_stream).df.withWatermark(
        "ts", watermark
    )
    vertices = edges.select(
        F.explode(F.array("src", "dst")).alias("vertex"), "ts"
    )
    agg = (
        vertices.groupBy(F.session_window("ts", gap).alias("sess"), "vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "vertex",
            "degree",
        )
    )
    q = (
        agg.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
    return q
