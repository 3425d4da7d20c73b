"""Stream-stream interval join — the unbounded twin of
``queries.events_range_join`` / ``events_asof_join``'s time-bounded
pairing (batch answers exist; this re-expresses the join for unbounded
input, the same contract as :mod:`streaming.windows`).

Semantics: each left event pairs with every right event of the same
key whose timestamp lies in ``[left.ts - delta, left.ts]`` (the
"recent context" join: purchases in the hour before each click).

State bounding: BOTH inputs carry event-time watermarks and the join
condition is an explicit time range, so Spark's stream-stream join can
evict buffered right rows once the watermark passes ``ts + delta`` and
left rows once it passes ``ts`` — state tracks the interval width ×
arrival rate, never history.  Inner-join matches emit as soon as both
sides arrive (append mode), and a checkpointed query resumes its
buffered state across restarts, so pairs whose two sides land in
different micro-batches (or different ``availableNow`` drains) are
still found — parity-tested against the batch join in
tests/test_streaming_windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    delta_seconds: int = 3600,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """(id_l, id_r, k, lag_secs) for right events in the ``delta``
    window before each left event, same key."""
    lw = left.select(
        F.col(key).alias("k"),
        F.col(ts).alias("l_ts"),
        F.col(id_col).alias("id_l"),
    ).withWatermark("l_ts", watermark_delay)
    rw = right.select(
        F.col(key).alias("rk"),
        F.col(ts).alias("r_ts"),
        F.col(id_col).alias("id_r"),
    ).withWatermark("r_ts", watermark_delay)
    joined = lw.join(
        rw,
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {delta_seconds} SECONDS"))
        & (F.col("r_ts") <= F.col("l_ts")),
        "inner",
    )
    return joined.select(
        "k",
        "id_l",
        "id_r",
        (
            F.col("l_ts").cast("long") - F.col("r_ts").cast("long")
        ).alias("lag_secs"),
    )


def run_interval_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delta_seconds: int = 3600,
    watermark_delay: str = "2 hours",
) -> None:
    """Drain currently-visible files of both sides through the interval
    join, appending matches to ``out_dir``.  Re-running after new files
    land resumes from the checkpoint with the buffered join state
    restored — cross-drain pairs are found exactly once."""
    lschema = spark.read.parquet(left_dir).schema
    rschema = spark.read.parquet(right_dir).schema
    lstream = spark.readStream.schema(lschema).parquet(left_dir)
    rstream = spark.readStream.schema(rschema).parquet(right_dir)
    joined = interval_join_stream(
        lstream, rstream, delta_seconds=delta_seconds,
        watermark_delay=watermark_delay,
    )
    (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
