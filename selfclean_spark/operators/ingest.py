"""Stage 0 — scan + identity + invariant columns.

Reference analog: the folder/dataset scan that assigns each sample its
integer row index (selfclean/cleaner/selfclean.py:127-173, 175-217);
sample identity there is the positional index 0..N-1.  At 10^12-file
scale a positional index is partition-dependent, so identity is the
content-independent key ``id = xxhash64(repo, path, commit)`` — stable
across runs and parallelism levels (SURVEY.md §7.4: never
``monotonically_increasing_id``).

``content_sha = sha2(content, 256)`` is the per-row invariant
(BASELINE.json input_hint) asserted against the source at every later
materialization.

64-bit id collisions: negligible at test scale; at 10^12 rows the
birthday bound (~3·10^10 pairs per 2^64) recommends the 128-bit variant
``concat(xxhash64(r,p,c), xxhash64(r,p,c, lit(1)))`` — kept behind
``wide_id`` for design completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_identity(code_files: DataFrame, wide_id: bool = False) -> DataFrame:
    """Add ``id`` and ``content_sha`` to the raw source relation."""
    df = code_files.withColumn(
        "id", F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"))
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    if wide_id:
        df = df.withColumn(
            "id_hi",
            F.xxhash64(F.col("repo"), F.col("path"), F.col("commit"), F.lit(1)),
        )
    return df


def metadata_of(ingested: DataFrame) -> DataFrame:
    """The (id → repo/path/lang) dimension used by result joins — the
    analog of IssueManager's positional path/label lookup
    (selfclean/cleaner/issue_manager.py:53-61), carried by join."""
    return ingested.select("id", "repo", "path", "commit", "lang", "content_sha")


def assert_sha_invariant(stage_df: DataFrame, source: DataFrame) -> int:
    """North-rule invariant: every materialized stage row's content_sha
    must equal the source's for the same id.  Returns the number of
    violations (0 = pass); callers raise on nonzero.

    Implemented as an inner join + inequality count so it runs
    distributed; at scale this is a cheap sort-merge on the id key.
    """
    src = source.select("id", F.col("content_sha").alias("src_sha"))
    joined = stage_df.select("id", "content_sha").join(src, "id", "inner")
    return joined.filter(F.col("content_sha") != F.col("src_sha")).count()
