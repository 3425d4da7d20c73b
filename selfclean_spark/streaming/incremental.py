"""Incremental signature ingestion via Structured Streaming.

``readStream`` over a parquet directory of ``code_files`` →
``foreachBatch`` running the identical batch signature stage →
signature table laid out as one partition directory per micro-batch.

Delivery semantics: the stream checkpoint makes each source file
processed in exactly one *committed* micro-batch, but ``foreachBatch``
itself is at-least-once — a crash between the sink write and the
checkpoint commit replays the batch.  Writing every batch to its own
``batch=<id>`` partition directory with ``overwrite`` mode makes the
replay idempotent: the re-run replaces the partial directory instead
of appending duplicate rows (the deterministic signature kernel
guarantees the replacement is byte-identical).  Read the table back
through :func:`read_signatures`, which drops the layout column.

Batch/stream parity is structural: ``foreachBatch`` calls the same
``compute_signatures`` used by the batch pipeline — one code path, two
trigger modes (the Spark-idiomatic way to keep incremental and
backfill results identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from selfclean_spark.config import SignatureConfig
from selfclean_spark.operators.ingest import with_identity
from selfclean_spark.operators.signatures import compute_signatures


def read_signatures(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the incrementally-built signature table (drops the
    ``batch`` partition-layout column)."""
    return spark.read.parquet(out_dir).drop("batch")


def write_signature_batch(
    batch_df: DataFrame, batch_id: int, out_dir: str, cfg: SignatureConfig
) -> None:
    """Sign one micro-batch and write it to its ``batch=<id>``
    directory — idempotent sink: a replayed batch REPLACES the
    directory (blind append would duplicate rows on batch retry), and
    the deterministic kernel makes the replacement byte-identical."""
    ingested = with_identity(batch_df)
    sigs = compute_signatures(ingested, cfg)
    sigs.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")


def incremental_signatures(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: SignatureConfig | None = None,
    schema=None,
    available_now: bool = True,
):
    """Start (and by default drain) the incremental signature stream.

    Returns the StreamingQuery; with ``available_now`` the call blocks
    until all currently-visible files are signed, then stops — the
    testable single-drain mode (production uses a continuous trigger).
    """
    cfg = cfg or SignatureConfig()
    if schema is None:
        schema = spark.read.parquet(source_dir).schema

    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sign_batch(batch_df, batch_id: int) -> None:
        write_signature_batch(batch_df, batch_id, out_dir, cfg)

    writer = stream.writeStream.foreachBatch(sign_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()
