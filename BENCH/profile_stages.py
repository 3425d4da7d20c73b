"""Per-phase wall profile of the candidates + verify stages at a fixed
corpus size — the feedback loop for the scaling-efficiency work (the
signature stage already scales ~0.9; candidates/verify are where the
N→4N deficit lives, and this script shows WHERE inside them the wall
goes at a given core count).

Usage: python BENCH/profile_stages.py [n_rows] [cpus]

Reuses the run_scaling corpus + a signatures checkpoint under scratch
(built once per corpus size, shared across cpu levels — profiling the
downstream stages does not need to re-pay the signature pass).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_scaling import ensure_corpus, scratch_dir  # noqa: E402

from selfclean_spark.catalog import ParquetCatalog  # noqa: E402
from selfclean_spark.config import PipelineConfig  # noqa: E402
from selfclean_spark.plans.pipeline import DedupPipeline  # noqa: E402
from selfclean_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    corpus = ensure_corpus(n_rows)
    scratch = scratch_dir()
    spark = get_spark(
        f"profile-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.local.dir": os.path.join(scratch, f"prof_local_{cpus}"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    code_files = spark.read.parquet(corpus)

    # shared signatures checkpoint: build once per corpus size at
    # local[32]-equivalent cost, reuse across profiled cpu levels
    sig_root = os.path.join(scratch, f"prof_ckpt_{n_rows}")
    catalog = ParquetCatalog(spark, sig_root)
    pipe = DedupPipeline(spark, catalog, PipelineConfig())

    # wipe everything downstream of signatures so those stages rerun
    cfg_hash = pipe.config.config_hash()
    for stage in ["candidates", "verified_edges", "components"]:
        if catalog.exists(stage, cfg_hash):
            shutil.rmtree(os.path.join(sig_root, stage), ignore_errors=True)
    manifest = catalog._load_manifest()
    for stage in ["candidates", "verified_edges", "components"]:
        manifest["stages"].pop(stage, None)
    catalog._save_manifest(manifest)

    t0 = time.time()
    pipe.run(code_files, issue_types=set())
    total = time.time() - t0
    manifest = catalog._load_manifest()
    out = {"n_rows": n_rows, "cpus": cpus, "wall_after_sig": round(total, 2)}
    for m in manifest["metrics"]:
        if m["stage"] in ("candidates", "verified_edges", "components"):
            out.setdefault("stages", {})[m["stage"]] = {
                "rows_out": m["rows_out"],
                "phase_secs": m["extra"].get("phase_secs"),
            }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
