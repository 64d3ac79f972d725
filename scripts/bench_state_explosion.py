"""One-off scale evidence for the streaming sessionizer's bounded
state: push N distinct user_ids (default 10^6) through
applyInPandasWithState in a handful of micro-batches, then advance the
event-time watermark and verify the timeout pass evicts the ENTIRE
key frontier — every session emitted exactly once, final state ~0
rows. Appends the measured run to BENCH/state_explosion.json.

    python scripts/bench_state_explosion.py [--keys 1000000]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import tempfile
import time

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=1_000_000)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "state_explosion.json"))
    args = ap.parse_args()

    from hunt_spark.session import get_spark
    from hunt_spark.streaming.sessions import sessionize_stream

    spark = get_spark("state_explosion")
    root = tempfile.mkdtemp(prefix="sess_explode_")
    src, ckpt = os.path.join(root, "events"), os.path.join(root, "ckpt")
    t0 = dt.datetime(2024, 1, 1)
    t0_s = int(t0.timestamp())
    n = args.keys
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(t0_s)).alias("ts"),
            F.col("id").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .coalesce(8)
        .write.mode("append")
        .parquet(src)
    )
    spark.createDataFrame(
        [(n + 1, t0 + dt.timedelta(days=2), n + 1, "click", 0.25, "{}")],
        EVENTS_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 8
    ).parquet(src)
    wall = time.time()
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("explode_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    wall = time.time() - wall
    agg = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT user_id) AS u FROM explode_out "
        f"WHERE user_id < {n}"
    ).first()
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    peak = max(p["stateOperators"][0]["numRowsTotal"] for p in progresses)
    final = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
    )
    rec = {
        "keys": n,
        "sessions_emitted": agg["n"],
        "distinct_users_emitted": agg["u"],
        "state_rows_peak": peak,
        "state_rows_final": final,
        "state_rows_removed": removed,
        "keys_per_sec": round(n / wall, 1),
        "wall_sec": round(wall, 1),
        "ok": bool(agg["n"] == n and agg["u"] == n and final <= 1
                   and removed >= n),
    }
    print(json.dumps(rec))
    history = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            history = json.load(f)
    history.append(rec)
    with open(args.out, "w") as f:
        json.dump(history, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
