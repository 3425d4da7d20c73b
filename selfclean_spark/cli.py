"""spark-submit entry point.

Reference analog: the ``SelfClean().run_on_image_folder(path)`` CLI-ish
entry (selfclean/cleaner/selfclean.py:127-173).  Cluster usage:

    spark-submit --py-files selfclean_spark.zip \\
        -m selfclean_spark.cli \\
        --source table:lake.raw.code_files \\
        --checkpoint-root s3://bucket/ckpt/run1 \\
        --jaccard-threshold 0.8 --output-json run1_summary.json

Local sandbox usage:

    python -m selfclean_spark.cli --source /path/code_files_parquet \\
        --checkpoint-root /tmp/ckpt --master 'local[8]'

The session is created only if the caller didn't (spark-submit sets
master/conf; the builder passes them through).
"""

from __future__ import annotations

import argparse
import json
import sys

from selfclean_spark.catalog import ParquetCatalog
from selfclean_spark.config import PipelineConfig, SignatureConfig
from selfclean_spark.plans.pipeline import DedupPipeline
from selfclean_spark.session import get_spark
from selfclean_spark.sources.code_files import read_code_files


def build_parser() -> argparse.ArgumentParser:
    # CLI defaults derive from the library dataclass defaults so a bare
    # CLI run and a bare facade/pipeline run share the same config hash
    # (hard-coded values here once drifted from SignatureConfig)
    sig, pipe = SignatureConfig(), PipelineConfig()
    p = argparse.ArgumentParser(prog="selfclean-spark")
    p.add_argument("--source", required=True, help="parquet path or table:<fqn>")
    p.add_argument("--checkpoint-root", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--shingle-mode", choices=["char", "token"], default=sig.shingle_mode)
    p.add_argument("--shingle-k", type=int, default=sig.shingle_k)
    p.add_argument("--shingle-w", type=int, default=sig.shingle_w)
    p.add_argument("--num-perm", type=int, default=sig.num_perm)
    p.add_argument("--bands", type=int, default=sig.lsh_bands)
    p.add_argument("--rows-per-band", type=int, default=sig.lsh_rows)
    p.add_argument("--jaccard-threshold", type=float, default=pipe.jaccard_threshold)
    p.add_argument("--band-bucket-cap", type=int, default=pipe.band_bucket_cap)
    p.add_argument("--seed", type=int, default=sig.seed)
    p.add_argument("--auto-cleaning", action="store_true")
    p.add_argument("--no-substring", action="store_true")
    p.add_argument("--force", action="store_true", help="ignore checkpoints")
    p.add_argument("--issues", default="near_duplicates,off_topic_samples,label_errors")
    p.add_argument("--output-json", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = PipelineConfig(
        signature=SignatureConfig(
            shingle_mode=args.shingle_mode,
            shingle_k=args.shingle_k,
            shingle_w=args.shingle_w,
            num_perm=args.num_perm,
            lsh_bands=args.bands,
            lsh_rows=args.rows_per_band,
            seed=args.seed,
        ),
        jaccard_threshold=args.jaccard_threshold,
        band_bucket_cap=args.band_bucket_cap,
        check_substring=not args.no_substring,
        auto_cleaning=args.auto_cleaning,
    )
    spark = get_spark("selfclean-spark", master=args.master)
    code_files = read_code_files(spark, args.source)
    pipe = DedupPipeline(spark, ParquetCatalog(spark, args.checkpoint_root), cfg)
    manager = pipe.run(
        code_files, force=args.force, issue_types=set(args.issues.split(","))
    )
    summary = {
        "config_hash": cfg.config_hash(),
        "issues": manager.keys(),
        "verified_edges": manager["verified_edges"].count(),
        "components": manager["components"]
        .select("component_id").distinct().count(),
        "stage_metrics": pipe.catalog.all_metrics(),
    }
    out = json.dumps(summary, default=str)
    if args.output_json:
        with open(args.output_json, "w") as f:
            f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
