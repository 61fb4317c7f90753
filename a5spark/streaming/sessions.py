"""Custom stateful streaming operator: per-user gap sessionization.

The batch engine's event-sessionization (entry_queries.q_event_sessions,
window functions) re-expressed as an arbitrary-stateful Structured Streaming
operator: applyInPandasWithState keyed by user_id keeps one open session per
user (start, last ts, event count, value sum) and EMITS a session when the
gap to the next event exceeds the timeout, or when the event-time watermark
times the open state out.

State is O(#active users); the watermark bounds it. Output rows are closed
sessions — an append-mode sink (the batch form needs a full re-shuffle per
run; the streaming form pays one keyed state lookup per event).

Late-data semantics: events are sorted within each micro-batch, so in-order
streams match the batch window-function split exactly. A cross-batch late
event (admitted by the watermark) merges into the open session when it lands
within `gap` of the session's span — widening the start, never moving the end
backwards; a late event older than that is emitted as its own single-event
session (the session it might have bridged may already be emitted — the
standard bounded approximation of single-pass gap sessionization).
"""

import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _us(ts: pd.Series) -> pd.Series:
    return ts.astype("int64") // 1000  # pandas ns -> us


def _emit(user_id, start_us, last_us, n, total) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id], dtype="int64"),
            "session_start": pd.to_datetime([start_us], unit="us"),
            "session_end": pd.to_datetime([last_us], unit="us"),
            "n_events": pd.Series([n], dtype="int64"),
            "total_value": pd.Series([total], dtype="float64"),
        }
    )


def make_sessionizer(gap_us: int):
    """Returns the applyInPandasWithState function closing sessions at
    `gap_us` inactivity (event-time, exact same split rule as the batch
    window-function form)."""

    def sessionize(key, pdfs, state: GroupState):
        user_id = key[0]
        out = []
        if state.hasTimedOut:
            if state.exists:
                s, l, n, t = state.get
                out.append(_emit(user_id, s, l, n, t))
                state.remove()
            return iter(out)

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        ts_us = _us(rows["ts"])
        vals = rows["value"].astype("float64")

        if state.exists:
            s, l, n, t = state.get
        else:
            s = l = None
            n, t = 0, 0.0
        for ev_us, v in zip(ts_us.to_numpy(), vals.to_numpy()):
            ev_us = int(ev_us)
            if s is None:
                s, l, n, t = ev_us, ev_us, 1, float(v)
            elif ev_us - l > gap_us:
                out.append(_emit(user_id, s, l, n, t))
                s, l, n, t = ev_us, ev_us, 1, float(v)
            elif ev_us >= s - gap_us:
                # in-order events extend the end; a cross-batch LATE event
                # (ev < l, admitted by the watermark) merges into the open
                # session without moving its end backwards
                s = min(s, ev_us)
                l = max(l, ev_us)
                n += 1
                t += float(v)
            else:
                # late event older than the open session's reach: emit it as
                # its own session (a bridge to an already-emitted session can
                # no longer be repaired — bounded, documented approximation)
                out.append(_emit(user_id, ev_us, ev_us, 1, float(v)))
        state.update((s, l, n, t))
        # time the open session out once the watermark passes last + gap
        state.setTimeoutTimestamp(l // 1000 + gap_us // 1000)
        return iter(out)

    return sessionize


def streaming_sessions(
    spark: SparkSession,
    source_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    source_options: dict | None = None,
) -> DataFrame:
    """Streaming gap-sessionization over a parquet event stream: one state
    entry per active user, sessions emitted on gap or watermark timeout."""
    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    reader = spark.readStream.schema(schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.parquet(source_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
