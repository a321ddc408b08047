"""N-vs-4N scaling evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (≥0.8 throughput scaling
efficiency from N to 4N executors, identical exactly-once output
rows) can't use a real cluster in this sandbox; per the driver
instruction it is evidenced by running the SAME job on the SAME input
at two parallelism levels (local[N] vs local[4N], fresh JVM each) and
reporting throughput at both plus the efficiency.

Two legs (see tools/scale_job.py):
- ``streaming``: the flagship streaming CC + session-degree job.
- ``corpus``: the compute-bound document pipeline, which isolates CPU
  scaling from micro-batch scheduling latency (at sandbox data sizes
  a micro-batch carries ~10^5 rows ≈ milliseconds of per-core work,
  so the streaming leg's wall clock is mostly fixed per-batch
  latency; at the 10^12-turn design point the same plan is
  shuffle/compute-bound like the corpus leg).

Usage: python tools/scaling_bench.py [N] (default N=8 → compares
local[8] vs local[32]). Writes JSON results to stdout; paste the
table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/gss_scaling"


def gen_inputs() -> tuple[str, str]:
    """Deterministic shared inputs (generated once, reused by both
    parallelism levels — 'same input').

    Streaming volume is env-tunable via SPARK_GRAFT_STREAM_CONVS
    (default 250k convs ≈ 14.5M turns; 1M ≈ 58M, 4M ≈ 232M — the
    amortization-curve volumes in BASELINE.md). Non-default volumes
    are cached as transcripts_<turns>m with their own done markers;
    generator/seed/chunking are identical across volumes, so a
    regenerated input reproduces the recorded output checksums."""
    from gelly_streaming_spark.session import get_spark

    convs_n = int(os.environ.get("SPARK_GRAFT_STREAM_CONVS", "250000"))
    # avg 58 turns/conv (5% hot convs at 10x of 40)
    suffix = "" if convs_n == 250000 else f"_{round(convs_n * 58 / 1e6)}m"
    tdir = f"{WORK}/transcripts{suffix}"
    # corpus size is env-tunable: 400 reps = 2M docs (the r1/r2
    # evidence size); 800 = 4M (halves the fixed-cost fraction of the
    # 8-core leg, making the efficiency estimate less noise-exposed)
    reps_n = int(os.environ.get("SPARK_GRAFT_CORPUS_REPS", "400"))
    cdir = f"{WORK}/corpus" if reps_n == 400 else f"{WORK}/corpus_{reps_n}"
    t_done = f"{WORK}/_T_DONE{suffix}"
    c_done = f"{WORK}/_C_DONE" if reps_n == 400 else f"{WORK}/_C_DONE_{reps_n}"
    if os.path.exists(t_done) and os.path.exists(c_done):
        return tdir, cdir
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark("scale_gen", cpus=32, shuffle_partitions=32)
    from pyspark.sql import functions as F  # noqa: F401

    from gelly_streaming_spark.fixtures import make_transcripts_spark

    if not os.path.exists(t_done):
        shutil.rmtree(tdir, ignore_errors=True)
        # ~14.5M turns (10^12-scale design point, sandbox evidence):
        # big enough that per-batch compute dominates batch latency
        n_chunks = 4
        big = make_transcripts_spark(
            spark, n_convs=convs_n, turns_per_conv=40, seed=11
        ).withColumn("chunk", F.pmod(F.xxhash64("conv_id"), F.lit(n_chunks)))
        staged = f"{WORK}/_staged"
        big.write.mode("overwrite").partitionBy("chunk").parquet(staged)
        # 64 uniform files per chunk (repartition, not coalesce): the
        # r1-r3 coalesce(8) layout staged 8 single-row-group files per
        # chunk, skewed up to 2.8x the mean — a 16-file micro-batch's
        # map stage (scan+explode+local merge+shuffle write) then ran
        # as <=16 unsplittable tasks with a long straggler, idling
        # half the cores at local[32] and capping the measured N->4N
        # streaming efficiency at ~0.45 regardless of batch volume. A
        # production stream has arrival-rate-many splits; 64/chunk
        # restores that while keeping BATCH ROW-SETS identical (the
        # chunk assignment is unchanged), so the watermark schedule
        # and output checksums reproduce. Pair files_per_trigger=128
        # to keep the same 2-batch split (f0+f1 | f2+f3).
        for i in range(n_chunks):
            spark.read.parquet(f"{staged}/chunk={i}").repartition(
                64
            ).write.mode("overwrite").parquet(f"{tdir}/f{i}")
        shutil.rmtree(staged, ignore_errors=True)
        with open(t_done, "w") as f:
            f.write("ok")
    # corpus: sf0.1 documents replicated reps_n x with distinct
    # doc_ids — 2M+ docs so per-row md5 compute (~1000+ core-seconds)
    # dwarfs the ~1 s of fixed per-stage latency
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(reps_n).select(F.col("id").alias("rep"))
    corpus = docs.crossJoin(reps).select(
        (F.col("doc_id") * reps_n + F.col("rep")).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    if not os.path.exists(c_done):
        shutil.rmtree(cdir, ignore_errors=True)
        corpus.repartition(64).write.mode("overwrite").parquet(cdir)
        with open(c_done, "w") as f:
            f.write("ok")
    spark.stop()
    return tdir, cdir


def run(mode: str, cpus: int, inp: str) -> dict:
    env = dict(os.environ)
    # the 4M-doc corpus caches ~6 GB; at 8g it spills mid-leg and the
    # 8-core leg (longer resident time) pays disproportionately
    big_corpus = mode == "corpus" and "corpus_" in inp
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g" if big_corpus else "8g")
    cmd = [sys.executable, "tools/scale_job.py", "--mode", mode,
           "--cpus", str(cpus), "--input", inp]
    fpt = os.environ.get("SPARK_GRAFT_FILES_PER_TRIGGER")
    if fpt and mode == "streaming":
        cmd += ["--files-per-trigger", fpt]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1800, env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"{mode}@{cpus} failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    modes = sys.argv[2:] or ["corpus", "streaming"]
    tdir, cdir = gen_inputs()
    results = {}
    for mode in modes:
        inp = cdir if mode == "corpus" else tdir
        lo = run(mode, n, inp)
        hi = run(mode, 4 * n, inp)
        eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4.0
        results[mode] = {
            "N": lo,
            "4N": hi,
            "scaling_efficiency": round(eff, 3),
            "identical_output": lo["output_checksum"] == hi["output_checksum"],
        }
        print(json.dumps({mode: results[mode]}))
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
