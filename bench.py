"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all headline queries.  Each query
is fully materialized through Spark's noop sink (no driver collect
cost).  Extra context fields (files/sec for the dedup pipeline, row
counts) ride along — the driver reads the required keys, humans read
the rest.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfclean_spark import caching, queries as Q  # noqa: E402
from selfclean_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # the dedup engine (flagship)
    "minhash_verified_pairs",
    "minhash_components",
    "simhash_near_pairs",
    "exact_components",
    "ngram_jaccard_pairs",
    # reference-core product surfaces (r3 — each timed STANDALONE,
    # including its own edge-pipeline build; see cache note below)
    "near_dup_ranking",
    "lang_mismatch_ranking",
    "auto_cut_flags",
    # training-data release checks (r3)
    "decontamination_pairs",
    "ngram_contamination",
    "substring_containment_pairs",
    "pii_scrub",
    "gopher_quality_flags",
    "source_mixture_weights",
    "packing_stats",
    "duplicated_ngram_spans",
    "holdout_split_counts",
    # data-selection release checks (r5)
    "ccnet_perplexity_flags",
    "dsir_importance_weights",
    "boilerplate_segment_scrub",
    "stratified_sample",
    "char_entropy_stats",
    "vocab_topk_tokens",
    "source_overlap_pairs",
    "repo_fork_pairs",
    "bpe_merge_pairs",
    "export_shard_plan",
    "dedup_method_agreement",
    "unimax_epoch_plan",
    "dedup_cluster_histogram",
    "source_novelty_report",
    "label_centroid_outliers",
    "kmeans_clusters",
    "dedup_graph_triangles",
    "secrets_scan",
    "source_term_relevance",
    "distinct_token_kmv",
    "source_kl_divergence",
    "media_byte_features",
    # code-payload release checks (r5): sub-file clones + audits
    "winnow_fingerprints",
    "winnow_clone_pairs",
    "block_clone_pairs",
    "license_scan",
    "generated_code_flags",
    "import_cooccurrence_pairs",
    # temporal joins (r5)
    "events_asof_join",
    "events_range_join",
    # text analysis
    "doc_stats",
    "quality_by_source",
    "repetition_stats",
    # similarity search + semantic dedup
    "cosine_topk",
    "lsh_topk_ann",
    "semdedup_keep",
    # generic OLAP
    "tpch_q1",
    "tpch_q4",
    "tpch_q18",
    "tpch_q5",
    "tpch_q6",
    "events_hourly",
]


# Bench protocol version, recorded in the output JSON so round-over-round
# comparisons know what they're comparing (VERDICT r3 what's-wrong #3):
#   warm-session-v0  — r1/r2: queries shared the session cache (later
#                      queries could warm-start off earlier ones)
#   cache-isolated-v1 — r3 onwards: caching.clear() + clearCache() after
#                      every repeat; each query rebuilds from the scans.
# r3's numbers are the comparison base for this protocol (BASELINE.md).
PROTOCOL = "cache-isolated-v1"


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def bw_canary(p: int = 0, seconds: float = 2.5) -> float:
    """Multi-core DRAM-throughput canary (Spark-independent).

    The single-threaded latency canary below cannot see a noisy
    neighbor eating memory bandwidth: that kind of pollution leaves a
    1-thread filter+agg untouched while uniformly slowing every
    32-thread query (observed r5: canary 0.58 s clean, all queries
    1.3-2.3x slow; and the inverse window minutes earlier).  This
    probe runs the SAME splitmix64 NumPy kernel as BENCH/hw_ceiling.py
    in one OS process per core and returns aggregate kernel
    iterations/sec — sustained multi-core throughput, the resource the
    parallel queries actually contend for.  Compare across BENCH_r{N}
    files the same way as canary_sec (it is machine drift, never code
    drift: this function must never be edited).
    """
    import multiprocessing as mp

    import numpy as np

    def _loop(sec: float, out_q) -> None:
        rng = np.random.default_rng(1)
        x = rng.integers(0, 2**62, size=2_000_000, dtype=np.int64)

        def _mix(x, deadline):
            iters = 0
            while time.perf_counter() < deadline:
                x = (x ^ (x >> np.int64(30))) * np.int64(-4658895280553007687)
                x = (x ^ (x >> np.int64(27))) * np.int64(-7723592293110705685)
                x = x ^ (x >> np.int64(31))
                iters += 1
            return x, iters

        # untimed warm-up: fault the array in, let the core ramp to its
        # sustained frequency, and absorb process-spawn skew so every
        # process's timed window sees all P peers active
        x, _ = _mix(x, time.perf_counter() + 1.0)
        _, iters = _mix(x, time.perf_counter() + sec)
        out_q.put(iters)

    p = p or (os.cpu_count() or 8)
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_loop, args=(seconds, q)) for _ in range(p)]
    for pr in procs:
        pr.start()
    total = sum(q.get() for _ in procs)
    for pr in procs:
        pr.join()
    return round(total / seconds, 1)


def canary(spark, sf_dir: str):
    """Never-changing VM-drift canary: a fixed filter+aggregate over
    lineitem that is NOT part of the query surface and must never be
    edited — its wall isolates machine/protocol drift from code drift
    when comparing BENCH_r{N} files."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_quantity") < 24)
        .groupBy("l_returnflag")
        .agg(
            F.sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")  # single-JVM local mode
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        "selfclean-spark-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    fns = {
        name: getattr(Q, name)
        for name in HEADLINE
    }
    # best-of-REPEATS per query: this shared VM shows sporadic 1.4-3x
    # interference windows (BENCH/BASELINE.md), so a single timing can
    # randomly double; the min of two back-to-back runs is the honest
    # steady-state number.  All raw walls are reported alongside.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    all_walls: dict[str, list[float]] = {}
    total = 0.0
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # One UNTIMED warm-up materialization before the timed canary
    # walls: the canary runs as the session's first heavy jobs, so
    # without this its first wall absorbs one-time JVM/codegen/
    # parquet-footer warm-up that no query wall includes — at low
    # repeat counts min(canary_walls) could then read high and
    # mislabel a clean round as a polluted window (ADVICE r4 #4).
    # Query timing is untouched; canary walls now measure only
    # machine drift, which is the canary's whole job.
    materialize(canary(spark, sf_dir))
    spark.catalog.clearCache()
    canary_walls = []
    for _ in range(repeats):
        t0 = time.time()
        materialize(canary(spark, sf_dir))
        canary_walls.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    bw_before = bw_canary()
    for name, fn in fns.items():
        walls = []
        for _ in range(repeats):
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
            # queries are timed STANDALONE: drop the session-scoped
            # result memos AND every intra-query persist, so each
            # repeat rebuilds from the parquet scans and a leaked cache
            # never charges memory (or grants warm-start) to the NEXT
            # query.  Library users get the opposite default — the
            # session cache makes e.g. dedup_stats_by_source after
            # minhash_components nearly free (selfclean_spark.caching).
            caching.clear()
            spark.catalog.clearCache()
        all_walls[name] = walls
        timings[name] = min(walls)
        total += timings[name]

    bw_after = bw_canary()
    dedup_secs = timings["minhash_verified_pairs"] + timings["minhash_components"]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
                "docs": n_docs,
                "dedup_files_per_sec": round(n_docs / dedup_secs, 1) if dedup_secs else None,
                "repeats": repeats,
                "protocol": PROTOCOL,
                "canary_sec": min(canary_walls),
                "canary_walls": canary_walls,
                "canary_warmup": True,
                "bw_canary_iters_per_sec": [bw_before, bw_after],
                "all_walls": all_walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
