"""Scalable global ranking (replaces single-partition windows).

``row_number() OVER (ORDER BY …)`` with no PARTITION BY collapses the
whole relation into one task — fine at test scale, a bottleneck at
10^12.  The classic two-pass pattern used here:

1. range-partition by the sort key + sort within partitions
   (this is exactly what a global ``orderBy`` does physically);
2. one small action collects per-partition row counts → cumulative
   offsets (driver-side, #partitions entries);
3. within-partition ``row_number`` (parallel window) + broadcast-joined
   offset = the global rank.

The sorted frame is persisted between the two passes so both read the
same partitioning (repartitionByRange samples its bounds; persisting
pins them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based dense global ``rank_col`` ordered by
    ``order_cols`` without a single-partition window.

    The returned DataFrame is range-partitioned and sorted by the key
    (so a downstream ``orderBy(rank)`` is a no-shuffle sort).  The
    persist (MEMORY_AND_DISK, needed to pin the sampled range bounds
    between the two passes) is registered with
    ``selfclean_spark.caching`` so ``unpersist_all()`` releases it —
    rankings-heavy long sessions don't accumulate orphan block-manager
    entries waiting on LRU.
    """
    from selfclean_spark import caching

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_parts = max(1, min(num_partitions, 2000))
    sorted_df = caching.register_persist(
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sorted_df.groupBy("_pid").count().collect()
    offsets = {}
    running = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = running
        running += row["count"]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        sorted_df.withColumn("_local", F.row_number().over(w))
        .join(offsets_df, "_pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("_pid", "_local", "_offset")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    cumsum_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add an INCLUSIVE global running sum of ``value_col`` ordered by
    ``order_cols`` — two-pass like ``with_global_rank`` (range-partition
    + per-partition SUM offsets collected driver-side, #partitions
    rows), never a single-partition window.  This is the kernel behind
    deterministic token-budget sharding: at 10^12 rows a ``sum() OVER
    (ORDER BY …)`` with no PARTITION BY would serialize the whole
    corpus through one task.

    Pass 2 is an Arrow ``mapInPandas`` running sum over the
    already-sorted partitions, NOT a ``Window.partitionBy(_pid)``: the
    window's required clustering would force Spark to insert a SECOND
    full-corpus Exchange (hashpartitioning on ``_pid``) right after the
    range shuffle — per-partition sequential accumulation is the one
    place imperative per-partition code beats the declarative plan, and
    the vectorized pandas ``cumsum`` keeps it Arrow-batched.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from selfclean_spark import caching

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_parts = max(1, min(num_partitions, 2000))
    sorted_df = caching.register_persist(
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sums = sorted_df.groupBy("_pid").agg(
        F.sum(value_col).cast("long").alias("_s")
    ).collect()
    offsets = {}
    running = 0
    for row in sorted(sums, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = running
        running += row["_s"]
    offsets_b = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        sorted_df.schema.fields + [StructField(cumsum_col, LongType(), False)]
    )

    def _cumsum(batches):
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = int(offsets_b.value[int(pdf["_pid"].iloc[0])])
            cs = pdf[value_col].astype("int64").cumsum() + run
            run = int(cs.iloc[-1])
            pdf = pdf.copy()
            pdf[cumsum_col] = cs.astype("int64")
            yield pdf

    return sorted_df.mapInPandas(_cumsum, out_schema).drop("_pid")
