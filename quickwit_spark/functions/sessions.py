"""Event sessionization — gaps-and-islands batch operator plus a
Structured Streaming stateful twin.

``sessionize`` groups each user's event stream into sessions separated
by inactivity gaps larger than ``gap_us``. All time arithmetic is
int64 microseconds (``unix_micros``) so every output cell is
integer-exact for cross-engine comparison.

Scale shape: ONE window partitioned by user (parallel across users —
no global sort) feeding ONE hash aggregation on (user, session). The
shuffle key is the user id; a pathologically hot user serializes only
its own partition. This is the standard analytics sessionization any
event table at 100 TB needs.

``sessionize_stream`` is the same semantics as an incremental
stateful operator (``applyInPandasWithState``): sessions are emitted
as soon as a later event for the same user closes them (an event
arrives past the gap), while the trailing still-open session per user
stays in state. Batch/stream parity is pinned by test: the stream's
emissions equal the batch result minus each user's final session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_seq long, n_events long, "
    "start_us long, end_us long, duration_us long"
)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """One row per (user, session): ordinal ``session_seq`` (0-based,
    in time order), event count, first/last event in µs since epoch,
    and duration. A new session starts when the gap since the user's
    previous event EXCEEDS ``gap_us``."""
    # cast: parquet TIMESTAMP_NTZ → TIMESTAMP (same µs instant under a
    # UTC session tz), as the date_histogram agg already does
    base = df.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us")
    sess = base.withColumn(
        "ns",
        F.when(
            F.col("us") - F.lag("us").over(w) <= F.lit(gap_us), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "session_seq",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


def _session_state_fn(gap_us: int):
    """Build the applyInPandasWithState function: state is the open
    session (seq, start, end, count); each batch folds the group's
    time-ordered events, emitting every session an arriving event
    closes."""
    import pandas as pd

    def fn(key, pdfs, state):
        user_id = key[0]
        if state.exists:
            seq, start, end, cnt = state.get
        else:
            seq, start, end, cnt = 0, None, None, 0
        out = []
        for pdf in pdfs:
            for t in pdf["us"].sort_values():
                t = int(t)
                if start is None:
                    start, end, cnt = t, t, 1
                elif t - end <= gap_us:
                    end, cnt = max(end, t), cnt + 1
                else:
                    out.append((user_id, seq, cnt, start, end, end - start))
                    seq, start, end, cnt = seq + 1, t, t, 1
        state.update((seq, start, end, cnt))
        cols = [
            "user_id", "session_seq", "n_events",
            "start_us", "end_us", "duration_us",
        ]
        if out:
            yield pd.DataFrame(out, columns=cols)

    return fn


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Streaming twin of :func:`sessionize` over a streaming DataFrame:
    per-user open-session state via ``applyInPandasWithState``; emits a
    session when a later event for that user closes it. Requires
    per-user time-ordered arrival across micro-batches (e.g. a file
    source fed in time order), the same contract as any event-time
    sessionizer without watermarked shuffles."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepped = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_state_fn(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType="seq long, start long, end long, cnt long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
