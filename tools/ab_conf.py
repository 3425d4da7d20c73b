"""A/B harness for session-level config variants (guide §1): runs a
query subset under each variant in a FRESH SparkSession (stop +
rebuild), min-of-N walls per query.  Not part of the driver contract.

Usage: python tools/ab_conf.py <variant> [queries] [repeats]
Variants are defined in VARIANTS below; "base" = current session.py
defaults (plus the bench's shuffle.partitions=2*cpus override).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfclean_spark import caching, queries as Q  # noqa: E402
from selfclean_spark.session import get_spark  # noqa: E402

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    # honor advisory size instead of defaultParallelism when coalescing
    "coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    "coalesce16": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    },
    "coalesce4": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    },
}

DEFAULT_QS = (
    "minhash_verified_pairs,minhash_components,ngram_jaccard_pairs,"
    "near_dup_ranking,dedup_method_agreement,winnow_clone_pairs,"
    "boilerplate_segment_scrub,dsir_importance_weights,tpch_q18"
)


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    names = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_QS).split(",")
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conf = {"spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))}
    conf.update(VARIANTS[variant])
    spark = get_spark(f"ab-{variant}", master=f"local[{cpus}]", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    total = 0.0
    for name in names:
        fn = getattr(Q, name)
        walls = []
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            caching.clear()
            spark.catalog.clearCache()
        out[name] = walls
        total += min(walls)
    print(json.dumps({"variant": variant, "total_min": round(total, 3), "walls": out}))
    spark.stop()


if __name__ == "__main__":
    main()
