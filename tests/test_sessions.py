"""Sessionization: batch gaps-and-islands + streaming stateful twin."""

import datetime as dt
import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import Window

from quickwit_spark.functions.sessions import sessionize, sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(user, minutes):
    return (user, T0 + dt.timedelta(minutes=minutes))


def test_sessionize_hand_computed(spark):
    rows = [
        # user 1: two sessions (40-min gap > 30-min timeout)
        _ev(1, 0), _ev(1, 10), _ev(1, 50), _ev(1, 60),
        # user 2: one session, gap exactly == timeout stays together
        _ev(2, 0), _ev(2, 30),
        # user 3: single event
        _ev(3, 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(df, gap_us=30 * 60 * 1_000_000).collect()
    }
    assert len(out) == 4
    assert out[(1, 0)]["n_events"] == 2
    assert out[(1, 0)]["duration_us"] == 10 * 60 * 1_000_000
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 1)]["start_us"] - out[(1, 0)]["end_us"] == 40 * 60 * 1_000_000
    assert out[(2, 0)]["n_events"] == 2  # boundary gap kept
    assert out[(3, 0)]["n_events"] == 1
    assert out[(3, 0)]["duration_us"] == 0


def test_sessionize_stream_matches_batch(spark):
    """The stateful streaming twin emits exactly the batch sessions
    minus each user's final (still-open) session, fed the same events
    in time order across micro-batches."""
    rows = [
        _ev(1, 0), _ev(1, 10), _ev(1, 50), _ev(1, 60), _ev(1, 120),
        _ev(2, 0), _ev(2, 30), _ev(2, 90), _ev(2, 95),
        _ev(3, 5),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")

    with tempfile.TemporaryDirectory(prefix="qws_sess_") as d:
        src = os.path.join(d, "src")
        ckpt = os.path.join(d, "ckpt")
        # one file per time slice, written in time order so arrival
        # order matches event order (the operator's stated contract)
        for i, cutoff in enumerate((45, 100, 999)):
            lo = (45, 100)[i - 1] if i else -1
            part = df.filter(
                (F.col("ts") > T0 + dt.timedelta(minutes=lo))
                & (F.col("ts") <= T0 + dt.timedelta(minutes=cutoff))
            )
            part.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = (
            sessionize_stream(stream, gap_us=30 * 60 * 1_000_000)
            .writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["user_id"], r["session_seq"]): (
                r["n_events"], r["start_us"], r["end_us"], r["duration_us"]
            )
            for r in spark.table("sess_out").collect()
        }

    batch = sessionize(df, gap_us=30 * 60 * 1_000_000)
    last = Window.partitionBy("user_id")
    closed = batch.withColumn(
        "max_seq", F.max("session_seq").over(last)
    ).filter(F.col("session_seq") < F.col("max_seq"))
    want = {
        (r["user_id"], r["session_seq"]): (
            r["n_events"], r["start_us"], r["end_us"], r["duration_us"]
        )
        for r in closed.collect()
    }
    assert want  # non-trivial: users 1 and 2 each close sessions
    assert got == want


def test_sessionize_single_shuffle(spark):
    """Plan shape: one exchange on the user key feeds both the window
    and the aggregation — sessionizing shuffles the events ONCE."""
    df = spark.createDataFrame([_ev(1, 0)], "user_id long, ts timestamp")
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
