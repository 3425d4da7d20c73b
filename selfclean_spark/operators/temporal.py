"""Temporal join operators: as-of join and bounded range join.

Spark has no native ASOF JOIN (DuckDB/Pandas do) and naive range joins
degenerate to inequality nested loops.  Both operators here are
re-expressed as equi-shuffle plans that scale:

* :func:`asof_join` — the union + ordered-window + ``last(ignorenulls)``
  rewrite: ONE shuffle on the join key, no inequality join at all.
  Each left row picks up the most recent strictly-prior right row in
  the same key partition.  This is the classic log-structured as-of
  pattern (every point-in-time feature join in a training pipeline).
* :func:`range_join` — bucketize timestamps at the radius Δ, explode
  one side into its 3 adjacent buckets, equi-join on (key, bucket),
  then filter the exact |Δt| predicate.  Candidate fan-out is bounded
  by bucket occupancy (3× one side), never by the O(N²) time-range
  cross product; each true pair is produced exactly once (the exploded
  side emits 3 DISTINCT bucket keys, the probe side holds one).

Both are deterministic under ties: orderings always extend to a unique
id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    right_cols: list[str],
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``key`` with ``right.ts`` strictly earlier (ties between right rows
    at the same ts break on the larger ``id_col`` — deterministic).

    Returned columns: every left column, plus ``prior_<c>`` for each
    ``c`` in ``right_cols`` (NULL when no prior right row exists).

    Plan shape: one Exchange (hashpartitioning on ``key``) + one sort —
    the union never joins; 100-TB safe as long as single-key event
    history fits a partition's sort spill (Spark external-sorts it).
    """
    # tag: left rows sort BEFORE right rows at an equal timestamp, so a
    # same-instant right row is invisible — strict "<" semantics
    lt = left.select(
        F.col(key), F.col(ts), F.lit(0).alias("_tag"), F.col(id_col),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    rt = right.select(
        F.col(key), F.col(ts), F.lit(1).alias("_tag"), F.col(id_col),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
    )
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # last right-row attribute among all STRICTLY PRECEDING rows in the
    # (ts, tag, id) order: right rows at an equal ts carry tag 1 > 0 so
    # they sort after the left row and fall outside the frame
    enriched = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"prior_{c}")
            for c in right_cols
        ],
    ).filter(F.col("_tag") == 0)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    return enriched.select(
        *out_cols, *[F.col(f"prior_{c}") for c in right_cols]
    )


def range_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    delta: float,
) -> DataFrame:
    """All (a, b) pairs sharing ``key`` with |a.ts - b.ts| <= ``delta``
    and ``a.id < b.id`` (self-join safe, each pair emitted once).

    Returns (key, id_a, id_b, ts_a, ts_b, dt) with dt = b.ts - a.ts.

    Plan shape: b explodes into its 3 adjacent Δ-buckets (bounded 3×),
    equi-join on (key, bucket), exact |Δt| filter after — the classic
    bucketed range join.  Bucket occupancy is the scale knob: hot
    (key, bucket) cells are a data property (same story as LSH band
    caps); at Δ chosen ≪ key activity period the join stays linear."""
    bucket_a = F.floor(F.col(ts) / delta).alias("_bk")
    aa = a.select(
        F.col(key), F.col(id_col).alias("id_a"), F.col(ts).alias("ts_a"),
        bucket_a,
    )
    bb = b.select(
        F.col(key), F.col(id_col).alias("id_b"), F.col(ts).alias("ts_b"),
        F.explode(
            F.array(
                F.floor(F.col(ts) / delta) - 1,
                F.floor(F.col(ts) / delta),
                F.floor(F.col(ts) / delta) + 1,
            )
        ).alias("_bk"),
    )
    return (
        aa.join(bb, [key, "_bk"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ts_b") - F.col("ts_a")) <= delta)
        )
        .select(
            key,
            "id_a",
            "id_b",
            "ts_a",
            "ts_b",
            (F.col("ts_b") - F.col("ts_a")).alias("dt"),
        )
    )
    # no dedupe needed: the 3 exploded bucket keys are distinct, and the
    # probe row holds exactly one of them — each true pair joins once
