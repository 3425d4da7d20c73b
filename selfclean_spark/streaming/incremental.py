"""Incremental signature ingestion via Structured Streaming.

``readStream`` over a parquet directory of ``code_files`` →
``foreachBatch`` running the identical batch signature stage →
append-only signature table.  Exactly-once per file comes from the
stream checkpoint; the signature kernel is deterministic, so replays
are idempotent at the row level too.

Batch/stream parity is structural: ``foreachBatch`` calls the same
``compute_signatures`` used by the batch pipeline — one code path, two
trigger modes (the Spark-idiomatic way to keep incremental and
backfill results identical).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from selfclean_spark.config import SignatureConfig
from selfclean_spark.operators.ingest import with_identity
from selfclean_spark.operators.signatures import compute_signatures


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
        ingested = with_identity(batch_df)
        sigs = compute_signatures(ingested, cfg)
        sigs.write.mode("append").parquet(out_dir)

    writer = stream.writeStream.foreachBatch(sign_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()
