"""Salted-key shuffles for skewed joins and holistic aggregations
(north rule: "salted-key shuffle to break repo/lang skew").

What does NOT need salting in Spark — and why the pipeline doesn't use
it there: *algebraic* aggregates (count/sum/min/max) partial-aggregate
map-side before the shuffle, so a hot key ships one partial row per
input partition no matter how many rows it has; LSH band buckets are
handled by ``band_bucket_cap`` (a hot bucket means near-identical
content whose home is the sha fast path); and AQE's skew-join
splitting (on in ``session.py``) covers sort-merge joins at runtime.

What DOES need it:

* :func:`salted_join` — an equi-join where one key dominates the big
  side and the small side can't broadcast (e.g. joining per-repo
  metadata onto a trillion-row edge table where one monorepo owns 30%
  of the rows) when AQE is unavailable or the skew is inside a single
  partition-split unit.  The big side gets a uniform salt, the small
  side is replicated across all salts, and the join key becomes
  (key, salt) — the hot key now spreads over ``n_salts`` tasks.
* :func:`salted_collect_list` — holistic aggregation (list gathering)
  where map-side combine cannot compress the hot key: two-phase
  collect with per-salt partial lists flattened in the merge.

The salt must not depend on row values (adversarial distributions) and
must be deterministic per run for reproducibility:
``spark_partition_id() % n_salts`` — free (no data scan), uniform over
the scan, stable for a fixed plan+input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small.

    Output equals ``big.join(small, on, how)`` for row-preserving join
    types (inner/left); the hot key's rows land in ``n_salts`` tasks
    instead of one.  Cost: the small side shuffles ``n_salts``× — keep
    it the dimension side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = big.withColumn(
        "_salt", F.spark_partition_id() % F.lit(n_salts)
    )
    replicated_small = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return salted_big.join(
        replicated_small, [*on, "_salt"], how
    ).drop("_salt")


def salted_collect_list(
    df: DataFrame,
    keys: list[str],
    col: str,
    n_salts: int = 32,
    sort_output: bool = True,
) -> DataFrame:
    """Skew-proof ``groupBy(keys).agg(collect_list(col))`` — the
    holistic aggregate where a hot key would otherwise gather ALL its
    values in one reduce task.  Phase 1 collects per (keys, salt);
    phase 2 flattens the ≤ ``n_salts`` partial lists per key.

    ``sort_output`` sorts the merged list so the result is
    deterministic (collect_list order is not guaranteed under
    parallelism); disable for scale when order is irrelevant.
    """
    merged = (
        df.withColumn("_salt", F.spark_partition_id() % F.lit(n_salts))
        .groupBy(*keys, "_salt")
        .agg(F.collect_list(col).alias("_partial"))
        .groupBy(*keys)
        .agg(F.flatten(F.collect_list("_partial")).alias(col + "s"))
    )
    if sort_output:
        merged = merged.withColumn(col + "s", F.array_sort(col + "s"))
    return merged
