"""Profiling sidecar for the frozen ``bench.py`` (guide §1: measure
first).  Same data dir / core-count / cache-isolation contract, but:

* per-query it also records the number of Spark jobs, stages and tasks
  (via ``statusTracker`` + per-query job groups) — the fixed-overhead
  decomposition that the wall alone hides at small SF;
* ``--queries a,b,c`` runs a subset (fast A/B iteration on one query);
* ``--repeats N`` overrides the repeat count (default 2, like bench).

Output: one JSON line per query on stdout —
    {"query": ..., "walls": [...], "n_jobs": N, "n_stages": N,
     "n_tasks": N}
plus a final total line.  Not part of the driver contract; numbers
quoted in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from selfclean_spark import caching, queries as Q  # noqa: E402
from selfclean_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402  (frozen list; read-only import)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma-separated subset")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "selfclean-spark-bench-extra",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    names = [n for n in args.queries.split(",") if n] or HEADLINE
    total = 0.0
    for name in names:
        fn = getattr(Q, name)
        walls = []
        group = None
        for rep in range(args.repeats):
            group = f"bx_{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
            caching.clear()
            spark.catalog.clearCache()
        # stats for the LAST repeat (steady state)
        st = sc.statusTracker()
        job_ids = st.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
        total += min(walls)
        print(
            json.dumps(
                {
                    "query": name,
                    "walls": walls,
                    "min": min(walls),
                    "n_jobs": len(job_ids),
                    "n_stages": n_stages,
                    "n_tasks": n_tasks,
                }
            ),
            flush=True,
        )
    print(json.dumps({"total_min": round(total, 3), "n": len(names)}))


if __name__ == "__main__":
    main()
