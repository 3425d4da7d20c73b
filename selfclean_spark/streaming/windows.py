"""Watermarked windowed aggregation + custom stateful sessionization.

Two Structured Streaming operators the batch engine already answers
(``queries.events_hourly`` / ``queries.events_sessions``), re-expressed
for unbounded input:

* :func:`windowed_event_counts` — tumbling event-time windows with a
  watermark: late events inside the lateness bound are merged into
  their window; a window is emitted (append mode) only once the
  watermark passes its end, i.e. exactly once, complete.
* :func:`sessionize_stream` — per-user session statistics via
  ``applyInPandasWithState``: the 30-minute-gap sessionization carries
  (last event time, open-session length, totals) as typed state across
  micro-batches, so a session spanning two batches is ONE session.

Both reuse the batch engine's semantics and are parity-tested against
the batch queries (tests/test_streaming_windows.py): stream(drops) ==
batch(union of drops) on the emitted keys.

Scale notes: windowed counts shuffle only (window, event_type) partial
aggregates (map-side combined); sessionization shuffles events once on
user_id, and its state row is O(1) per user.  Watermarks bound state:
closed windows / idle users are evicted by the runtime, so state size
tracks active keys, not history.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_GAP_SECONDS = 1800  # 30-min inactivity gap (events_sessions twin)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("max_session_events", LongType(), False),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_t", LongType(), False),
        StructField("n_sessions", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("max_closed", LongType(), False),
        StructField("cur_in_session", LongType(), False),
    ]
)

def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming (ts, event_type, value) → per-window counts + mean.

    Append-mode semantics: a (window, event_type) row is final — it is
    emitted exactly once, after the event-time watermark (max seen ts
    minus ``watermark_delay``) passes the window end, with every late
    event inside the bound already merged.
    """
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


def _session_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """One user's new events (any order within the batch) + carried
    state → updated (n_sessions, n_events, max_session_events).

    Exact w.r.t. the batch sessionizer whenever batches arrive in
    event-time order per user (the file-drop ingest pattern); within a
    batch, order is restored by sorting — the gap test runs on the
    sorted sequence seeded with the carried ``last_t``.

    Cross-batch late data — an event whose ``t`` precedes the carried
    ``last_t`` — cannot be merged into an already-summarized session
    and is DROPPED LOUDLY (counted + warning-logged), never silently
    folded in: a negative gap would corrupt the session stats.  Sources
    that need late-event merging belong on the watermarked
    :func:`windowed_event_counts` path instead.
    """
    if state.hasTimedOut:
        # idle-eviction path (bounded state): the user went quiet for
        # idle_timeout_ms of processing time — drop the state row.  A
        # later event from this user starts a FRESH session history,
        # exactly like a first-seen user.
        state.remove()
        yield from ()
        return

    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values(["t", "event_id"], kind="mergesort")
    ts = rows["t"].to_numpy()

    if state.exists:
        last_t, n_sessions, n_events, max_closed, cur = state.get
    else:
        last_t, n_sessions, n_events, max_closed, cur = (
            None, 0, 0, 0, 0,
        )

    if last_t is not None and len(ts) and ts[0] < last_t:
        late = ts < last_t
        logging.getLogger(__name__).warning(
            "sessionize: dropping %d cross-batch late event(s) for user %s "
            "(t < carried last_t=%d)", int(late.sum()), key[0], last_t,
        )
        ts = ts[~late]

    for t in ts:
        new_session = last_t is None or (t - last_t) > SESSION_GAP_SECONDS
        if new_session:
            if cur:
                max_closed = max(max_closed, cur)
            n_sessions += 1
            cur = 0
        cur += 1
        n_events += 1
        last_t = int(t)

    state.update((int(last_t), int(n_sessions), int(n_events),
                  int(max_closed), int(cur)))
    if idle_timeout_ms is not None:
        state.setTimeoutDuration(idle_timeout_ms)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
            "max_session_events": [max(max_closed, cur)],
        }
    )


def sessionize_stream(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming (user_id, event_id, ts) → running per-user session
    stats, one updated row per user per batch (update mode).

    The 30-minute-gap rule of ``queries.events_sessions`` with state =
    one O(1) row per user carried across micro-batches — the open
    session's length and last event time survive the batch boundary,
    so a session split across drops still counts once.

    ``idle_timeout_ms`` bounds TOTAL state on unbounded user
    populations: a user idle for that much processing time has their
    state row evicted (ProcessingTimeTimeout), so state size tracks
    recently-active users, not every user ever seen — the trade is
    that a returning long-idle user restarts session history from
    scratch (tested in test_streaming_windows).  None (default) keeps
    exact lifetime semantics.
    """
    prepared = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").cast("long").alias("t"),
    )

    def update(key, batches, state):
        return _session_update(key, batches, state, idle_timeout_ms)

    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


# -- drain helpers (availableNow file-drop ingest, same pattern as
#    incremental.incremental_signatures) -----------------------------------

def run_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> None:
    """Drain currently-visible event files through the watermarked
    windowed aggregation, appending closed windows to ``out_dir``."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    counts = windowed_event_counts(stream, window_duration, watermark_delay)
    (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_sessionize(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
) -> None:
    """Drain currently-visible event files through the stateful
    sessionizer; each batch's updated user rows land in a
    ``batch=<id>`` directory (idempotent under replay — same pattern
    as incremental.write_signature_batch).

    Always runs WITHOUT idle eviction: processing-time timeouts need a
    continuously-running query to fire on (an availableNow drain would
    spin extra timeout-only micro-batches after the data is consumed);
    pass ``idle_timeout_ms`` to :func:`sessionize_stream` under a
    processing-time trigger instead — see
    tests/test_streaming_windows.py::test_sessionization_idle_timeout_evicts_state."""
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    sessions = sessionize_stream(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    (
        sessions.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_latest_sessions(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest per-user row across the batch directories (update-mode
    compaction)."""
    raw = spark.read.parquet(out_dir)
    w_latest = raw.groupBy("user_id").agg(F.max("batch").alias("batch"))
    return raw.join(w_latest, ["user_id", "batch"]).drop("batch")
