"""JSONL (newline-delimited JSON) corpus source — the interchange
format most published text corpora ship in (one JSON document per
line, e.g. ``{"id": ..., "text": ..., "meta": {...}}``).

Reference analog: the dataset scan (selfclean/cleaner/selfclean.py:
175-217) — "wrap whatever the user already has" — re-expressed for the
corpus formats an LLM-data pipeline actually ingests.

Scale notes:

* The schema is DECLARED, never inferred: ``spark.read.json`` without
  a schema runs a full extra pass over the data to sample types — at
  100 TB that is a second corpus scan before the first real job.
* Corrupt lines are quarantined, not fatal: PERMISSIVE mode routes
  unparseable lines into ``_corrupt_record``; :func:`read_documents_
  jsonl` splits them off so the pipeline sees clean rows and the
  caller gets an auditable reject relation (count it, sample it, store
  it — silent drops hide ingest bugs).
* gzip-compressed shards (``*.jsonl.gz``) work through the same reader
  (Spark's codec inference); note gzip shards are NOT splittable — one
  task per shard — so shard size, not file count, is the parallelism
  knob at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("_corrupt_record", StringType(), True),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL documents corpus → (clean rows, rejected lines).

    Clean rows carry (doc_id, text, lang, source) with ``n_chars``
    derived; rejects carry the raw offending line in ``line``."""
    raw = (
        spark.read.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # a row is corrupt if the parser populated _corrupt_record OR a
    # required field is missing (null doc_id/text on a parsed line)
    bad = F.col("_corrupt_record").isNotNull() | F.col(
        "doc_id"
    ).isNull() | F.col("text").isNull()
    clean = (
        raw.filter(~bad)
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    rejects = raw.filter(bad).select(
        F.coalesce(
            F.col("_corrupt_record"),
            F.to_json(F.struct("doc_id", "text", "lang", "source")),
        ).alias("line")
    )
    return clean, rejects
