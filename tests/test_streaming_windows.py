"""Watermark + stateful-streaming parity tests.

Drive both operators with two file drops (two micro-batches) and
compare against the batch engine on the union of the drops:

* windowed counts — every emitted (window, event_type) row must equal
  the full-corpus batch aggregate for that key, INCLUDING a planted
  late event that arrives in drop 2 but belongs to a drop-1 window
  (inside the watermark bound → merged before emission).
* sessionization — the stateful per-user stats after both drops must
  equal ``queries.events_sessions`` on the union, including a session
  that SPANS the two drops (open state carried across the batch
  boundary).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from selfclean_spark.streaming.windows import (
    read_latest_sessions,
    run_sessionize,
    run_windowed_counts,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ev(uid, eid, minutes, etype="click", value=1.0):
    return (uid, eid, T0 + dt.timedelta(minutes=minutes), etype, value)


SCHEMA = "user_id long, event_id long, ts timestamp, event_type string, value double"

# drop 1: hours 0-3.  drop 2: hours 4-6 plus one LATE event at minute
# 95 (hour-1 window) — 3.5 h behind drop-2 max but within no watermark?
# watermark delay is 2 h: wm after drop 2 = 06:30 - 2 h = 04:30, so the
# hour-1 window [01:00, 02:00) is emitted AFTER the late event merged
# (it emits at the END of drop-2's batch, watermark having advanced to
# 02:00 after drop 1... emission uses the PREVIOUS batch's watermark,
# so hour-0/1/2 windows close during drop 2 and include the late row).
DROP1 = [
    _ev(1, 1, 5), _ev(1, 2, 20),            # u1 session A (hour 0)
    _ev(1, 3, 95),                           # u1 session B (hour 1)
    _ev(2, 4, 10), _ev(2, 5, 130, "view"),   # u2 sessions (hours 0, 2)
    _ev(1, 6, 185),                          # u1 session C start (hour 3)
]
DROP2 = [
    _ev(1, 7, 195),            # u1: 10 min after event 6 → SAME session C
    _ev(1, 8, 250),            # u1 session D (hour 4)
    _ev(2, 9, 260, "view"),    # u2 session (hour 4)
    # LATE event: belongs to the hour-1 window (watermark merge test).
    # It is user 3's only event, so it does not violate the
    # sessionizer's per-user in-order-across-batches contract
    # (retro-inserting into closed session state is the watermarked
    # window operator's territory, not O(1)-state sessionization).
    _ev(3, 10, 95, "click"),
    _ev(1, 11, 390),           # u1 (hour 6) — advances the watermark
]


def _write_drop(spark, rows, src):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_windowed_counts_emit_once_complete_with_late_data(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_drop(spark, DROP1, src)
    run_windowed_counts(spark, src, out, ckpt, watermark_delay="2 hours")
    _write_drop(spark, DROP2, src)
    run_windowed_counts(spark, src, out, ckpt, watermark_delay="2 hours")

    emitted = spark.read.parquet(out)
    # batch truth over the UNION of drops
    full = spark.createDataFrame(DROP1 + DROP2, SCHEMA)
    truth = {
        (r.window_start, r.event_type): (r.n_events, r.avg_value)
        for r in (
            full.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.avg("value"), 6).alias("avg_value"),
            )
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "avg_value")
            .collect()
        )
    }
    rows = emitted.collect()
    assert rows, "watermark never closed any window"
    for r in rows:
        assert truth[(r.window_start, r.event_type)] == (r.n_events, r.avg_value)
    # the late event's window (hour 1) must be among the emitted rows,
    # already including the late row (count 2: event 3 + late event 10)
    hour1 = [r for r in rows if r.window_start == T0 + dt.timedelta(hours=1)]
    assert sum(r.n_events for r in hour1) == 2
    # exactly-once: no (window, event_type) emitted twice
    keys = [(r.window_start, r.event_type) for r in rows]
    assert len(keys) == len(set(keys))


def test_stateful_sessionization_spans_batches(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    _write_drop(spark, DROP1, src)
    run_sessionize(spark, src, out, ckpt)
    _write_drop(spark, DROP2, src)
    run_sessionize(spark, src, out, ckpt)

    got = {
        r.user_id: (r.n_sessions, r.n_events, r.max_session_events)
        for r in read_latest_sessions(spark, out).collect()
    }
    # batch truth: the events_sessions logic on the union
    from selfclean_spark import queries as Q

    full_dir = str(tmp_path / "full")
    spark.createDataFrame(DROP1 + DROP2, SCHEMA).write.parquet(
        f"{full_dir}/events.parquet"
    )
    want = {
        r.user_id: (r.n_sessions, r.n_events, r.max_session_events)
        for r in Q.events_sessions(spark, full_dir).collect()
    }
    assert got == want
    # the cross-drop session (events 6+7, 10-min gap over the batch
    # boundary) must be ONE session: u1 has sessions A,B,C(6,7),D,(390)
    assert got[1][0] == 5


def test_sessionization_idle_timeout_evicts_state(spark, tmp_path):
    """Bounded state under unbounded users (VERDICT r2 #8 stretch):
    with idle_timeout_ms, a user idle past the timeout has their state
    row evicted — proven behaviorally: a returning evicted user
    restarts session history (n_sessions back to 1) where retained
    state would have counted a second session.

    One CONTINUOUS query (processing-time trigger): timeouts fire on
    running-query batch boundaries, which an availableNow drain does
    not provide (it would spin timeout-only batches after the data)."""
    import time

    from selfclean_spark.streaming.windows import sessionize_stream

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    # both initial drops visible at start: the first batch folds user
    # 0's 5-min-gap second event into ONE session (state retention
    # while active), everyone else has a single event
    _write_drop(spark, [(u, u, T0, "click", 1.0) for u in range(200)], src)
    _write_drop(
        spark, [(0, 1000, T0 + dt.timedelta(minutes=5), "click", 1.0)], src
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    sessions = sessionize_stream(stream, idle_timeout_ms=4000)

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    def user7_rows():
        try:
            return [
                (r.n_sessions, r.n_events, r.max_session_events)
                for r in spark.read.parquet(out)
                .filter("user_id = 7").orderBy("batch").collect()
            ]
        except Exception:  # sink dir not created yet
            return []

    def wait_for(pred, timeout_s=90):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if pred():
                return
            time.sleep(0.5)
        raise AssertionError("condition not reached before timeout")

    # a ProcessingTimeTimeout query never goes idle (timeouts are
    # checked every trigger), so synchronize on SINK CONTENT, not on
    # processAllAvailable
    q = (
        sessions.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        wait_for(lambda: len(user7_rows()) >= 1)
        time.sleep(8)  # everyone idles past the 4 s timeout → evicted
        # user 7 returns 400 min (event time) later: with retained
        # state this would be session #2 (n_sessions=2, n_events=2);
        # after eviction it must look first-seen
        _write_drop(
            spark, [(7, 2000, T0 + dt.timedelta(minutes=400), "click", 1.0)], src
        )
        wait_for(lambda: len(user7_rows()) >= 2)
    finally:
        q.stop()

    assert user7_rows()[-1] == (1, 1, 1)  # fresh ⇒ state was evicted
    got = {
        r.user_id: (r.n_sessions, r.n_events, r.max_session_events)
        for r in read_latest_sessions(spark, out).collect()
    }
    # retained-while-active: the 5-min-gap second event extended user
    # 0's ONE open session before the idle eviction
    assert got[0] == (1, 2, 2)


def test_interval_join_stream_cross_drain_parity(spark, tmp_path):
    """Stream-stream interval join: purchases in the hour before each
    click, drained in TWO availableNow runs sharing one checkpoint —
    the buffered right-side state must survive the restart so a pair
    whose purchase arrived in drain 1 and click in drain 2 is still
    found — and the union must equal the batch time-range join."""
    from selfclean_spark.streaming.interval import run_interval_join

    ldir, rdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    clicks1 = [_ev(1, 100, 90), _ev(2, 101, 30)]
    purch1 = [_ev(1, 200, 45, "purchase"), _ev(2, 201, 25, "purchase")]
    # drain 2: a click whose matching purchase arrived in drain 1
    clicks2 = [_ev(1, 102, 100), _ev(1, 103, 400)]
    purch2 = [_ev(1, 202, 95, "purchase")]

    _write_drop(spark, clicks1, ldir)
    _write_drop(spark, purch1, rdir)
    run_interval_join(spark, ldir, rdir, out, ckpt)
    _write_drop(spark, clicks2, ldir)
    _write_drop(spark, purch2, rdir)
    run_interval_join(spark, ldir, rdir, out, ckpt)

    got = sorted(
        (r.id_l, r.id_r, r.lag_secs)
        for r in spark.read.parquet(out).collect()
    )
    all_clicks = clicks1 + clicks2
    all_purch = purch1 + purch2
    want = sorted(
        (c[1], p[1], int((c[2] - p[2]).total_seconds()))
        for c in all_clicks
        for p in all_purch
        if c[0] == p[0]
        and dt.timedelta(0) <= c[2] - p[2] <= dt.timedelta(seconds=3600)
    )
    assert got == want
    # the cross-drain pair is present: click 102 (drain 2) × purchase
    # 200 (drain 1, 55 min earlier)
    assert (102, 200, 3300) in set(got)


def test_stream_dedup_within_watermark_matches_batch(spark, tmp_path):
    """Replayed events arriving within the lateness bound (same batch
    AND across the batch boundary) are dropped; output == batch
    dropDuplicates over the union.  State is watermark-bounded by
    construction (dropDuplicatesWithinWatermark), which is the whole
    point vs an unbounded streaming dropDuplicates."""
    from selfclean_spark.streaming.stream_dedup import run_dedup_stream

    src, out, ckpt = (str(tmp_path / d) for d in ("sd_src", "sd_out", "sd_ckpt"))
    # drop 1 carries an in-batch replay of event 1; drop 2 replays
    # events 3 and 4 across the boundary (well inside the 2 h bound of
    # the watermark their first arrivals advanced it to) plus new rows
    d1 = [_ev(1, 1, 5), _ev(1, 1, 5), _ev(1, 2, 20), _ev(2, 3, 30), _ev(2, 4, 45)]
    d2 = [_ev(2, 3, 30), _ev(2, 4, 45), _ev(1, 5, 60), _ev(3, 6, 75)]
    _write_drop(spark, d1, src)
    run_dedup_stream(spark, src, out, ckpt, keys=["event_id"])
    _write_drop(spark, d2, src)
    run_dedup_stream(spark, src, out, ckpt, keys=["event_id"])

    got = sorted(
        (r.event_id, r.user_id) for r in spark.read.parquet(out).collect()
    )
    truth = sorted(
        (r.event_id, r.user_id)
        for r in spark.createDataFrame(d1 + d2, SCHEMA)
        .dropDuplicates(["event_id"])
        .collect()
    )
    assert got == truth
    assert len(got) == 6  # events 1-6 exactly once each
