"""Watermark-bounded streaming exact deduplication.

The incremental MinHash path (:mod:`selfclean_spark.streaming.incremental`)
answers NEAR-duplicates across the whole corpus history via a persisted
band index.  This module answers the other streaming-dedup question —
exact retransmissions/replays in flight — with Spark's native
``dropDuplicatesWithinWatermark``: a duplicate key arriving within the
event-time lateness bound of its first occurrence is dropped, and the
runtime evicts a key's state once the watermark passes it.

The distinction matters at 100 TB: an unbounded ``dropDuplicates`` on a
stream keeps EVERY key ever seen in state (state grows with history —
a scale killer); the within-watermark variant keeps only the keys whose
eviction time hasn't passed, so state size tracks the ingest rate ×
lateness bound, not the corpus.  Exactness across all history is the
batch/incremental engine's job; in-flight replay suppression is this
operator's.

Parity contract (tests/test_streaming_windows.py): when every replay
arrives within the bound, stream output == batch
``dropDuplicates(keys)`` over the union of the input files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """First occurrence of each key survives; replays arriving within
    ``watermark_delay`` (event time) of the watermark are dropped with
    bounded state."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    schema=None,
    watermark_delay: str = "2 hours",
) -> None:
    """Drain currently-visible event files through the watermarked
    dedup, appending surviving rows to ``out_dir`` (exactly-once via
    the checkpoint, idempotent under replay like the other drains)."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    deduped = dedup_stream(
        stream, keys or ["event_id"], watermark_delay=watermark_delay
    )
    (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
