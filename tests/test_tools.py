"""Unit tests for the scale-evidence tooling (no SparkSession)."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import scale_job  # noqa: E402


def _write(path, n):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"x": list(range(n))}), path)


def test_estimate_turns_per_batch(tmp_path):
    root = str(tmp_path)
    # 4 source files of 10/20/30/40 rows; trigger takes 2 files/batch
    for i, n in enumerate([10, 20, 30, 40]):
        _write(f"{root}/f{i}/part-0000.parquet", n)
    # 100 rows / ceil(4/2)=2 batches
    assert scale_job.estimate_turns_per_batch(root, 2) == 50
    # one batch swallows everything
    assert scale_job.estimate_turns_per_batch(root, 8) == 100
    # empty input dir -> 0 (no crash)
    assert scale_job.estimate_turns_per_batch(f"{root}/nothing", 2) == 0


def test_store_auto_selection_rule():
    """The measured-crossover rule (BASELINE.md round-3 second pass):
    HDFS store below ~7M turns/batch, RocksDB at or above — the auto
    choice scale_job makes when SPARK_GRAFT_ROCKSDB is unset."""
    x = scale_job.ROCKSDB_CROSSOVER_TURNS_PER_BATCH
    assert x == 7_000_000
    # bench-sized batches (362k) stay on the heap store
    assert not (362_000 >= x)
    # the measured 232M-turn run (116M/batch) requires RocksDB
    assert 116_000_000 >= x
    # the 14.5M-turn pair at files=16 (7.25M/batch) picks RocksDB
    # (measured faster: 36.6 s vs 60.4 s at 32 cores)
    assert 7_250_000 >= x


def _noop(_):
    return 0


def test_hw_ceiling_probe_lane_time():
    """The Spark-free hardware-ceiling probe's timing harness: fixed
    work per lane, warm pool, best-of-2 — a no-op fn times near zero
    and never negative, at any lane count."""
    import hw_ceiling_probe

    t1 = hw_ceiling_probe.lane_time(_noop, 1)
    t2 = hw_ceiling_probe.lane_time(_noop, 2)
    assert 0 <= t1 < 5 and 0 <= t2 < 5


def test_auto_partitions_volume_rule():
    """BASELINE.md r4 measured rule: ~0.5M session rows per state
    partition, cpus-independent (both legs of a pair must share one
    physical plan), clamped to [16, 256]."""
    # 116M-turn batches (232M/2): ~50M sessions -> ~100 partitions
    assert 90 <= scale_job.auto_partitions(116_000_000) <= 110
    # 29M-turn batches (58M/2): ~12.5M sessions -> ~25 (96 measured
    # to regress this volume; 32 measured to fit)
    assert 20 <= scale_job.auto_partitions(29_000_000) <= 32
    # tiny batches clamp to the floor, huge ones to the cap
    assert scale_job.auto_partitions(0) == 16
    assert scale_job.auto_partitions(10**12) == 256


def test_default_files_per_trigger(tmp_path):
    """Half the staged part-files -> 2 micro-batches at any layout."""
    root = str(tmp_path)
    for i in range(4):
        for j in range(3):
            _write(f"{root}/f{i}/part-{j:04d}.parquet", 5)
    # 12 files -> 6/trigger -> 2 batches
    assert scale_job.default_files_per_trigger(root) == 6
    # odd count rounds up (first batch larger, still 2 batches)
    _write(f"{root}/f0/part-0003.parquet", 5)
    assert scale_job.default_files_per_trigger(root) == 7
    # non-staged layout falls back to a recursive count (ADVICE r4:
    # used to silently yield 1 -> hundreds of floor-bound batches)
    import os

    os.makedirs(f"{root}/other/nested", exist_ok=True)
    _write(f"{root}/other/a.parquet", 5)
    _write(f"{root}/other/nested/b.parquet", 5)
    assert scale_job.default_files_per_trigger(f"{root}/other") == 1
    _write(f"{root}/other/c.parquet", 5)
    _write(f"{root}/other/d.parquet", 5)
    assert scale_job.default_files_per_trigger(f"{root}/other") == 2
    # zero parquet files anywhere is a LOUD error, not a silent 1
    os.makedirs(f"{root}/none", exist_ok=True)
    import pytest

    with pytest.raises(FileNotFoundError, match="no parquet files"):
        scale_job.default_files_per_trigger(f"{root}/none")
