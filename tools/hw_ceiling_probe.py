"""Hardware N-vs-4N scaling ceiling probe (Spark-free).

The north-rule gate is >=0.8 throughput scaling efficiency from N to
4N EXECUTORS. The sandbox evidences it with local[N] vs local[4N] on
ONE box — but lanes on one box share resources that cluster NODES do
not: the memory controller, the turbo-frequency budget, one disk, one
NIC. This probe measures, with fixed identical work per lane and NO
Spark, how far the box itself can scale from N to 4N lanes:

- ``alu``: a pure-compute md5 chain (no memory traffic beyond L1).
  Per-lane slowdown at 4N lanes = the turbo/power budget: every core
  clocks lower when all are busy. A cluster's nodes run at the same
  all-core clock at BOTH sizes, so this penalty does not exist there.
- ``membw``: a streaming sum over a 64 MB buffer (~2 GB of memory
  traffic per lane, far past L3). Per-lane slowdown at 4N lanes = the
  shared memory controller saturating. A 4N-node cluster has 4x the
  controllers; this penalty is also single-box-only.

For each form the probe reports the maximum achievable N->4N speedup
``(4N x t_N / t_4N)`` and the corresponding maximum measurable
efficiency ``speedup / 4``. Any job whose work mix sits between the
two forms cannot measure above the matching ceiling ON THIS BOX even
if its code scales perfectly — compare BASELINE.md, where the
streaming leg's measured speedup is ~90% of the membw ceiling.

Usage: python tools/hw_ceiling_probe.py [N] (default 8; compares N vs
4N lanes). Prints one JSON line. Run alone — any co-tenant load
invalidates both the probe and whatever it is meant to calibrate.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _alu_work(_):
    x = b"seed"
    for _ in range(3_000_000):
        x = hashlib.md5(x).digest()
    return x[0]


def _membw_work(_):
    import numpy as np

    a = np.empty(64_000_000, dtype=np.uint8)
    a[:] = 1
    s = 0
    for _ in range(30):
        s += int(a.sum())
    return s


def lane_time(fn, lanes: int) -> float:
    """Wall for ``lanes`` processes each doing identical fixed work
    (warm pool, best of 2 timed reps — co-tenant noise only slows)."""
    with mp.Pool(lanes) as pool:
        pool.map(fn, range(lanes))  # warm: fork, import, allocate
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pool.map(fn, range(lanes))
            best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out: dict = {"N": n, "4N": 4 * n}
    for name, fn in (("alu", _alu_work), ("membw", _membw_work)):
        t_lo = lane_time(fn, n)
        t_hi = lane_time(fn, 4 * n)
        # fixed work per lane: throughput(c) = c / per-lane-time(c)
        max_speedup = 4 * n * t_lo / (n * t_hi)
        out[name] = {
            "per_lane_sec_N": round(t_lo, 3),
            "per_lane_sec_4N": round(t_hi, 3),
            "max_speedup": round(max_speedup, 2),
            "max_efficiency": round(max_speedup / 4, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
