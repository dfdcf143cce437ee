"""Custom stateful streaming operator #2: gap-based sessionization.

The batch twin (`events_sessionize` in `__spark_entry__.py`) assigns
session ids with a lag window over the full table; a live ingest cannot
do that — a user's session is open until the gap elapses, and events
for one session arrive across many micro-batches. Spark has no built-in
gap-session stateful operator for the Python API, so this is the second
`applyInPandasWithState` shape (alongside the cross-batch dedup in
`stateful.py`):

  - stream keyed by user_id; per key the GroupState holds the single
    OPEN session (start_us, last_us, n_events) — O(#active users),
    not O(#events);
  - a micro-batch's rows for the key are sorted by event time and run
    through the vectorized gap cut (numpy diff > GAP); every session
    CLOSED by a successor event is emitted, the trailing open session
    goes back into state;
  - emission is deterministic and batching-invariant AS LONG AS the
    feed is event-time monotonic ACROSS batches (within a batch any
    order is fine — the fn sorts): each closed session is emitted
    exactly once regardless of how the rows were cut into batches, so
    the deterministic replay below is a pure function of the input
    table and a DuckDB window oracle can reproduce it. The one row set
    the closed-only semantics never emits is each user's LAST session
    (still open at end-of-stream); in production that session closes
    via an event-time timeout (`timeout_mode="event_time"` below) when
    the watermark passes last_us + GAP — the gate pins the
    closed-by-successor core because the timeout firing instant is a
    watermark race, not a function of the data.

At 10^12 events the state store shards by user_id hash exactly like
the dedup op; the checkpoint makes every micro-batch a restart point.
Reference analog: none (SURVEY.md §2.6/§2.8).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # same 30-min gap as the batch op

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_fn_factory(event_time: bool):
    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # event_time mode only: the gap elapsed past the watermark —
            # close and emit the idle open session
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                }
            )
            return
        ts = np.sort(
            np.concatenate([p["ts_us"].to_numpy(np.int64) for p in pdfs])
        )
        if ts.size == 0:
            return
        # vectorized gap cut: a boundary sits after index i whenever
        # ts[i+1] - ts[i] > GAP; segments are [a, b) index windows
        cut = np.flatnonzero(np.diff(ts) > SESSION_GAP_US)
        bounds = [0, *(cut + 1).tolist(), int(ts.size)]
        segments = [
            (int(ts[a]), int(ts[b - 1]), b - a)
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            s0, l0, n0 = state.get
            if segments[0][0] - l0 <= SESSION_GAP_US:
                # first segment continues the carried open session
                # (feed is event-time monotonic across batches, so the
                # segment end is the new session end)
                a = segments[0]
                segments[0] = (s0, a[1], n0 + a[2])
            else:
                closed.append((s0, l0, n0))
        closed.extend(segments[:-1])
        open_s = segments[-1]
        state.update(open_s)
        if event_time:
            state.setTimeoutTimestamp(
                (open_s[1] + SESSION_GAP_US) // 1000
            )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    timeout_mode: str = "none",
):
    """File-stream of (event_id, user_id, ts, ...) -> closed gap
    sessions per user. `timeout_mode="event_time"` additionally closes
    idle sessions when the watermark passes last_event + gap (the
    production shape); `"none"` emits only successor-closed sessions —
    the deterministic configuration the gate replays."""
    src = (
        spark.readStream.schema(schema)
        # one staged file per micro-batch: the replay gate maps file k
        # to micro-batch k (replay.py), and a real ingest gets per-file
        # commit granularity
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    # ts is TIMESTAMP_NTZ: diff from the epoch as NTZ-to-NTZ, which is
    # timezone-free and equals DuckDB's epoch_us(ts) on the same column
    keyed = src.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).cast("long").alias("ts_us"),
        "ts",
    )
    if timeout_mode == "event_time":
        # the watermark clock requires TIMESTAMP (not NTZ); the cast
        # re-reads the naive value in the session timezone, so the
        # watermark and the NTZ-derived timeout micros tick the same
        # clock (UTC sessions; only relative order matters for timers)
        keyed = keyed.withColumn(
            "ts_wm", F.col("ts").cast("timestamp")
        ).withWatermark("ts_wm", "0 seconds")
        conf = GroupStateTimeout.EventTimeTimeout
    else:
        conf = GroupStateTimeout.NoTimeout
    sessions = keyed.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn_factory(timeout_mode == "event_time"),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
