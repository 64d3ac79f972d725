"""applyInPandasWithState sessionization: the streaming operator must
emit exactly the sessions its declarative batch twin computes —
gap-closed sessions as soon as the closing event arrives, idle
sessions when the event-time watermark passes end + gap."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hunt_spark.operators.events import sessionize_batch
from hunt_spark.streaming.sessions import sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(evid, minutes, user, value):
    return (evid, T0 + dt.timedelta(minutes=minutes), user, "click", value, "{}")

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

# file 1: two users; user 1 has two sessions split by a 40-min gap,
# user 2 one session. file 2: a far-future event (user 99) whose
# event time pushes the watermark past every file-1 session timeout.
FILE1 = [
    _mk(1, 0, 1, 1.0), _mk(2, 10, 1, 2.0),          # session A: 0-10
    _mk(3, 50, 1, 3.0),                              # session B: 50
    _mk(4, 5, 2, 10.0), _mk(5, 20, 2, 0.5),          # session C: 5-20
]
FILE2 = [_mk(6, 60 * 48, 99, 0.25)]                  # 2 days later


@pytest.fixture()
def paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sess_stream")
    src = str(root / "events")
    for i, rows in enumerate((FILE1, FILE2)):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return src, str(root / "ckpt")


def test_stream_sessions_match_batch_twin(spark, paths):
    src, ckpt = paths
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    all_events = spark.createDataFrame(FILE1 + FILE2, EVENTS_SCHEMA)
    want_all = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"])
        for r in sessionize_batch(all_events, gap_minutes=30).collect()
    }
    # nothing spurious: every emitted session is a true batch session
    assert got <= want_all
    # every file-1 session must have flushed (gap-closed or timed out
    # once file 2's event time advanced the watermark 2 days)
    file1_users = {1, 2}
    want_f1 = {w for w in want_all if w[0] in file1_users}
    assert got >= want_f1, (sorted(got), sorted(want_f1))
    # values match the batch twin EXACTLY: both sum per-event integer
    # cents (order-independent), so no float-summation tolerance needed
    got_v = {
        (r["user_id"], r["start_ts"]): r["value_sum_x100"]
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    for r in sessionize_batch(all_events, gap_minutes=30).collect():
        key = (r["user_id"], r["start_ts"])
        if key in got_v:
            assert got_v[key] == r["value_sum_x100"]


@pytest.mark.slow
def test_state_bounded_under_key_explosion(spark, tmp_path_factory):
    """Adversarial key cardinality (the 100x-scale claim, evidenced):
    a micro-batch carrying 5*10^4 DISTINCT user_ids (the full 10^6 run
    via SESS_EXPLODE_KEYS=1000000 — minutes on this box, run once per
    round, recorded in BENCH/state_explosion.json) must (a) hold at most
    one bounded state row per key (5 scalars — no per-event growth),
    and (b) evict ALL of it through the event-time timeout once the
    watermark passes, emitting every session exactly once. At 10^12
    events the state store only ever holds the open-session frontier,
    not history."""
    import os

    n_users = int(os.environ.get("SESS_EXPLODE_KEYS", "50000"))
    root = tmp_path_factory.mktemp("sess_explode")
    src, ckpt = str(root / "events"), str(root / "ckpt")
    # file 1: one event per user at T0 (distributed generate — a 10^6
    # python-tuple createDataFrame would serialize on the driver)
    t0_s = int(T0.timestamp())
    (
        spark.range(n_users)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(t0_s)).alias("ts"),
            F.col("id").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .coalesce(4)
        .write.mode("append").parquet(src)
    )
    # file 2: a single event 2 days later — its event time drags the
    # watermark past every file-1 session's end + gap
    spark.createDataFrame(
        [_mk(n_users + 1, 60 * 48, n_users + 1, 0.25)], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 4
    ).parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_explode_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    # (b) every file-1 session flushed via timeout, exactly once
    agg = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT user_id) AS u, "
        "sum(n_events) AS e FROM sess_explode_out "
        f"WHERE user_id < {n_users}"
    ).first()
    assert (agg["n"], agg["u"], agg["e"]) == (n_users, n_users, n_users)
    # (a) the state store never exceeded one row per live key, and the
    # timeout pass removed the whole 10^6-key frontier — only the
    # file-2 user's still-open session may remain
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses
    peak = max(p["stateOperators"][0]["numRowsTotal"] for p in progresses)
    assert peak <= n_users + 1
    final = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    assert final <= 1, f"state not evicted: {final} rows remain"
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
    )
    assert removed >= n_users
