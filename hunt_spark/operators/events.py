"""Event-stream operators over the events table
(event_id, ts, user_id, event_type, value, props).

``sessionize_batch`` is the declarative gap-sessionization plan (lag +
cumulative gap count — two window functions over one user_id shuffle);
``streaming/sessions.py`` holds the applyInPandasWithState twin for
live streams. Batch output is the ground truth the streaming operator
is pinned against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_GAP_MIN = 30


def sessionize_batch(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN
) -> DataFrame:
    """Split each user's event sequence into sessions at inactivity
    gaps > ``gap_minutes``; one row per session.

    Plan shape at scale: ONE shuffle on user_id feeds both window
    functions and the final aggregation (same partitioning key), so
    Catalyst reuses the exchange; no driver involvement, no state —
    this is the replay/backfill path of the streaming operator.
    Returns (user_id, session_id, start_ts, end_ts, n_events,
    value_sum_x100) with session_id = 0-based per-user ordinal."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # MICROsecond gap arithmetic, matching the streaming twin and the
    # DuckDB oracle (epoch_us): a whole-second floor (the old
    # ts.cast('long')) splits sessions differently whenever the true
    # gap straddles the boundary by a fraction — e.g. 1800.5 s apart
    # but floored difference exactly 1800. Cast via timestamp first:
    # parquet event times may be TIMESTAMP_NTZ (session tz pinned UTC).
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(order)
    brk = F.when(gap > gap_minutes * 60 * 1_000_000, 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = events.withColumn("_sid", F.sum(brk).over(run))
    return (
        sessions.groupBy("user_id", F.col("_sid").alias("session_id"))
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count("*").alias("n_events"),
            # per-event integer cents, then an integer sum: exact and
            # order-independent (double-sum order differs between Spark
            # partial aggregation and other engines, flipping round() by
            # ±1 on near-half totals)
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("value_sum_x100"),
        )
        .select(
            "user_id", "session_id", "start_ts", "end_ts",
            "n_events", "value_sum_x100",
        )
    )
