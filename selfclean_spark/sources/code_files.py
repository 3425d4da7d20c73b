"""Source readers for the ``code_files`` relation.

Reference analog: the image-folder / dataset scans
(selfclean/cleaner/selfclean.py:127-173, 175-217).  At design scale the
source is an Iceberg table (BASELINE.json input_hint); the sandbox has
no Iceberg jar, so the reader dispatches:

* ``table:`` prefix → ``spark.read.table`` (Iceberg/HMS catalogs —
  partition pruning + metadata-only planning come from the connector)
* path → ``spark.read.parquet``

Column pruning note: callers must ``select`` only what they need;
every stage in this engine does, so the scan that feeds the signature
stage reads exactly (repo, path, commit, lang, content) and later
stages never re-read ``content`` (checked in tests via the optimized
plan's ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

EXPECTED_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_code_files(spark: SparkSession, source: str) -> DataFrame:
    if source.startswith("table:"):
        df = spark.read.table(source[len("table:"):])
    else:
        df = spark.read.parquet(source)
    missing = [c for c in EXPECTED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"code_files source missing columns: {missing}")
    return df.select(*EXPECTED_COLUMNS)
