"""One-off profiling: run one query standalone, dump per-job walls
from the app status store (guide §1 measure-first sidecar; not part of
the driver contract)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selfclean_spark import caching, queries as Q  # noqa: E402
from selfclean_spark.session import get_spark  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "minhash_verified_pairs"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    "profile-edges",
    master=f"local[{cpus}]",
    extra_conf={"spark.sql.shuffle.partitions": str(max(int(cpus) * 2, 8))},
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

fn = getattr(Q, name)
for rep in range(reps):
    group = f"p_{rep}"
    sc.setJobGroup(group, name)
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    sc.setJobGroup(None, None)
    print(f"rep {rep}: wall {wall:.3f}s")
    if rep == reps - 1:
        store = sc._jsc.sc().statusStore()
        jobs = store.jobsList(None)
        for i in range(jobs.size()):
            j = jobs.apply(i)
            if j.jobGroup().isDefined() and j.jobGroup().get() == group:
                sub = j.submissionTime().get().getTime()
                comp = (
                    j.completionTime().get().getTime()
                    if j.completionTime().isDefined()
                    else sub
                )
                sids = j.stageIds()
                names = []
                for k in range(sids.size()):
                    sid = sids.apply(k)
                    try:
                        sd = store.lastStageAttempt(sid)
                        if sd.numCompleteTasks() > 0:
                            names.append(
                                f"{sd.name().split(' at ')[0]}x{sd.numTasks()}"
                            )
                    except Exception:
                        pass
                print(
                    f"  job {j.jobId()}: {comp - sub:5d} ms tasks={j.numCompletedTasks()}"
                    f" stages={names}"
                )
    caching.clear()
    spark.catalog.clearCache()
spark.stop()
