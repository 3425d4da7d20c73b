"""Hardware scaling ceiling of this VM, independent of Spark.

Runs the SAME vectorized kernel the signature stage uses (NumPy
splitmix-style hashing over large arrays — DRAM-bandwidth-shaped) in
P independent OS processes and reports per-process throughput at each
P.  On a single socket, per-core throughput drops as cores activate
(turbo bins + shared DRAM), which caps ANY job's measurable N→4N
efficiency below 1.0 — this script measures that cap so pipeline
efficiency can be read against the hardware's own ceiling.

Usage: python BENCH/hw_ceiling.py [p_low] [p_high] [seconds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def kernel_loop(seconds: float, out_q: mp.Queue) -> None:
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2**62, size=2_000_000, dtype=np.int64)
    iters = 0
    t0 = time.perf_counter()
    x = data.copy()
    while time.perf_counter() - t0 < seconds:
        # splitmix64-style mix — the minhash kernel's inner shape
        x = (x ^ (x >> np.int64(30))) * np.int64(-4658895280553007687)
        x = (x ^ (x >> np.int64(27))) * np.int64(-7723592293110705685)
        x = x ^ (x >> np.int64(31))
        iters += 1
    out_q.put(iters)


def run_at(p: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=kernel_loop, args=(seconds, q)) for _ in range(p)
    ]
    for pr in procs:
        pr.start()
    total = sum(q.get() for _ in procs)
    for pr in procs:
        pr.join()
    return total / p / seconds  # iterations per process-second


def main() -> None:
    p_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    p_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    # interleave and take best-of-2 per level, same protocol as
    # run_scaling.py
    lows, highs = [], []
    for _ in range(2):
        lows.append(run_at(p_low, seconds))
        highs.append(run_at(p_high, seconds))
    lo, hi = max(lows), max(highs)
    print(
        json.dumps(
            {
                "p_low": p_low,
                "p_high": p_high,
                "per_core_iters_low": round(lo, 1),
                "per_core_iters_high": round(hi, 1),
                "per_core_retention": round(hi / lo, 4),
                "max_measurable_efficiency": round(hi / lo, 4),
                "note": (
                    "per-process throughput of the same vectorized hash "
                    "kernel at p_low vs p_high active cores; the ratio is "
                    "the ceiling ANY perfectly-parallel job can show on "
                    "this VM between those core counts"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
