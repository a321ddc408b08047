"""One-off profiler for the streaming leg's per-batch floor.

Runs the scaling job's streaming pipeline on the cached 14.5M-turn
input at one parallelism level and attributes wall-clock:

  --mode both   the shipped shape (CC + session degrees concurrently)
  --mode cc     CC only, with per-epoch phase timing (state read,
                batch fold, resolve, state write) forced by eager
                localCheckpoints — slightly slower than the fused
                plan, but attributes S to phases
  --mode sd     session-degree query only

Usage: python tools/profile_streaming.py --mode cc --cpus 32 \
           --input /tmp/gss_scaling/transcripts --files-per-trigger 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

TSCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["both", "cc", "sd"], required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--input", default="/tmp/gss_scaling/transcripts")
    ap.add_argument("--files-per-trigger", type=int, default=16)
    ap.add_argument("--rocksdb", action="store_true",
                    help="use the RocksDB state store (the auto-selected "
                    "store at the BASELINE.md gate volumes)")
    ap.add_argument("--conf", action="append", default=[],
                    metavar="K=V", help="extra Spark conf (repeatable) — "
                    "the A/B lever for state/session-window tuning")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from gelly_streaming_spark.session import get_spark
    from gelly_streaming_spark.streaming.pipeline import (
        StreamingConnectedComponents,
        run_streaming_cc,
        run_streaming_session_degrees,
    )
    from gelly_streaming_spark.streaming.sink import IdempotentUpsertSink
    from gelly_streaming_spark.edges import edges_from_transcripts
    from gelly_streaming_spark.operators.aggregation import sharded_fold
    from gelly_streaming_spark.plans.connected_components import resolve_partials

    # Same partition-pinning contract as tools/scale_job.py: state and
    # shuffle partitioning is a property of the QUERY, held fixed
    # across core counts so profiles at different cpus are comparable.
    parts = int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", args.cpus)
    )
    spark = get_spark(f"profile_{args.mode}", cpus=args.cpus,
                      shuffle_partitions=parts,
                      rocksdb_state=args.rocksdb,
                      extra_conf=dict(c.split("=", 1) for c in args.conf))
    tmp = tempfile.mkdtemp(prefix=f"gss_prof_{args.mode}_")

    def stream():
        return (
            spark.readStream.schema(TSCHEMA)
            .option("maxFilesPerTrigger", args.files_per_trigger)
            .parquet(f"{args.input}/f*")
        )

    phases: list[dict] = []

    t0 = time.perf_counter()
    if args.mode in ("both", "sd"):
        sink = IdempotentUpsertSink(f"{tmp}/sess_out",
                                    keys=["sess_start", "vertex"])
        q_sd = run_streaming_session_degrees(stream(), sink, f"{tmp}/sd_ckpt")
    if args.mode == "both":
        q_cc, cc = run_streaming_cc(stream(), f"{tmp}/cc_state",
                                    f"{tmp}/cc_ckpt", num_shards=parts)
    elif args.mode == "cc":
        cc = StreamingConnectedComponents(
            f"{tmp}/cc_state", vertex_type="string",
            num_shards=parts, salt=1,
            shard_on=F.substring_index("src", "#", 1),
        )

        def timed_batch(edges, epoch_id):
            sp = edges.sparkSession
            rec = {"epoch": int(epoch_id)}
            t = time.perf_counter()
            bp = sharded_fold(
                edges, cc.algo, num_shards=cc.num_shards, salt=cc.salt,
                shard_on=cc.shard_on,
            ).localCheckpoint(eager=True)
            rec["fold_s"] = round(time.perf_counter() - t, 2)
            rec["batch_partials"] = bp.count()
            t = time.perf_counter()
            prev = cc.read_state(sp, upto_epoch=epoch_id)
            if prev is not None:
                prev = prev.localCheckpoint(eager=True)
                rec["prev_rows"] = prev.count()
                bp = bp.unionByName(prev)
            rec["read_s"] = round(time.perf_counter() - t, 2)
            t = time.perf_counter()
            merged = resolve_partials(bp).localCheckpoint(eager=True)
            rec["resolve_s"] = round(time.perf_counter() - t, 2)
            rec["state_rows"] = merged.count()
            t = time.perf_counter()
            merged.write.mode("overwrite").parquet(
                f"{cc.state_path}/state/epoch={epoch_id}"
            )
            rec["write_s"] = round(time.perf_counter() - t, 2)
            phases.append(rec)
            print(json.dumps(rec), flush=True)

        edges = edges_from_transcripts(stream(), watermark="1 minute").df
        q_cc = (
            edges.writeStream.foreachBatch(timed_batch)
            .option("checkpointLocation", f"{tmp}/cc_ckpt")
            .outputMode("update")
            .start()
        )

    if args.mode in ("both", "cc"):
        q_cc.processAllAvailable()
        q_cc.stop()
    if args.mode in ("both", "sd"):
        q_sd.processAllAvailable()
        for p in q_sd.recentProgress:
            print(json.dumps({
                "trigger": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": [
                    {k: so.get(k) for k in (
                        "operatorName", "numRowsTotal", "numRowsUpdated",
                        "allUpdatesTimeMs", "commitTimeMs",
                        "timeTakenToListFiles",
                    ) if k in so}
                    for so in p.get("stateOperators", [])
                ],
            }), flush=True)
        q_sd.stop()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "mode": args.mode, "cpus": args.cpus,
        "files_per_trigger": args.files_per_trigger,
        "wall_sec": round(wall, 2), "phases": phases,
    }), flush=True)
    # ~5 GB of state/checkpoint per 58M-turn profile run: leaked dirs
    # filled /tmp past 80% and the resulting write throttling polluted
    # every subsequent "clean-window" measurement on this box
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
