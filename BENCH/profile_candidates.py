"""Sub-plan wall breakdown of the candidates stage at a fixed core
count — times each physical piece separately (noop writes, so no sink
cost) to locate the non-scaling component.

Usage: python BENCH/profile_candidates.py [n_rows] [cpus]
Requires the profile_stages.py signatures checkpoint to exist.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from run_scaling import scratch_dir  # noqa: E402

from selfclean_spark.catalog import ParquetCatalog  # noqa: E402
from selfclean_spark.config import PipelineConfig  # noqa: E402
from selfclean_spark.operators import candidates as cand_ops  # noqa: E402
from selfclean_spark.operators import signatures as sig_ops  # noqa: E402
from selfclean_spark.session import get_spark  # noqa: E402


def timed(label: str, fn) -> None:
    t = time.time()
    out = fn()
    print(f"{label:45s} {time.time() - t:7.2f} s   {out}")


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    scratch = scratch_dir()
    spark = get_spark(
        f"profcand-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.local.dir": os.path.join(scratch, f"prof_local_{cpus}"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig()
    catalog = ParquetCatalog(spark, os.path.join(scratch, f"prof_ckpt_{n_rows}"))
    signatures = catalog.read("signatures")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return ""

    timed("scan sig (id only) count", lambda: signatures.select("id").count())
    timed(
        "scan sig + decode minhash",
        lambda: noop(signatures.select("id", "minhash")),
    )
    bands = sig_ops.band_hashes(signatures, cfg.signature)
    timed("bands (scan+hash, no shuffle)", lambda: noop(bands))
    timed(
        "bands -> bucket sizes agg",
        lambda: bands.groupBy("band_hash").count().count(),
    )
    raw, _, band_cache = cand_ops.band_pair_stream(bands, cfg.band_bucket_cap)
    timed("raw pair stream (full expand)", lambda: noop(raw))
    # drop the band cache between timed sections so the aggregated-pairs
    # measurement rebuilds from the scan, not from a warm persist
    band_cache.unpersist(blocking=True)
    pairs, _ = cand_ops.candidate_pairs(bands, cfg.band_bucket_cap)
    timed("pairs aggregated", lambda: noop(pairs))
    exact = cand_ops.exact_duplicate_pairs(signatures, pair_cap=cfg.band_bucket_cap)
    timed("exact sha pairs", lambda: noop(exact))
    fused = (
        raw.select("id_a", "id_b", F.lit(False).alias("is_exact"))
        .unionByName(exact.select("id_a", "id_b", F.lit(True).alias("is_exact")))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.when(~F.col("is_exact"), 1).otherwise(0)).alias("bands_hit"),
            F.max("is_exact").alias("is_exact"),
        )
        .filter(F.col("is_exact") | (F.col("bands_hit") >= cfg.min_bands_hit))
    )
    timed("fused full candidates (noop)", lambda: noop(fused))
    timed(
        "fused full candidates (parquet)",
        lambda: noop2(fused, os.path.join(scratch, "prof_cand_out")),
    )
    spark.stop()


def noop2(df, path):
    df.write.mode("overwrite").parquet(path)
    return ""


if __name__ == "__main__":
    main()
