"""Stateful gap-sessionization stream: cross-batch session carry,
successor-closed emission, and event-time-timeout closure of idle
sessions (streaming/sessions.py)."""

import datetime as dt
import glob
import os
import shutil

from docling_core_spark.streaming.sessions import (
    SESSION_GAP_US,
    sessionize_stream,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
GAP_S = SESSION_GAP_US // 1_000_000


def _us(t: dt.datetime) -> int:
    return int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def _stage(spark, input_dir, idx, rows):
    df = spark.createDataFrame(
        rows, schema="event_id long, user_id long, ts timestamp_ntz"
    )
    staging = os.path.join(input_dir, f"_staging-{idx}")
    df.coalesce(1).write.parquet(staging, mode="overwrite")
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(input_dir, f"batch-{idx}.parquet"))
    shutil.rmtree(staging)
    return df.schema


def _drain(spark, input_dir, output_dir, ckpt, schema, mode):
    q = sessionize_stream(
        spark, input_dir, output_dir, ckpt, schema=schema,
        timeout_mode=mode,
    )
    assert q.awaitTermination(300)


def test_sessions_close_by_successor_across_batches(spark, tmp_path):
    """A session spanning two micro-batches stays ONE session; a
    beyond-gap successor closes it with the pre-gap extent; trailing
    open sessions are never emitted in NoTimeout mode."""
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    s = dt.timedelta(seconds=1)
    # batch 1: user 7 session A starts (2 events 10s apart)
    schema = _stage(spark, input_dir, 0, [
        (1, 7, T0),
        (2, 7, T0 + 10 * s),
    ])
    _drain(spark, input_dir, output_dir, ckpt, schema, "none")
    assert spark.read.parquet(output_dir).count() == 0  # nothing closed

    # batch 2: +60s continues session A (within gap); then a beyond-gap
    # event closes A and opens session B
    _stage(spark, input_dir, 1, [
        (3, 7, T0 + 70 * s),
        (4, 7, T0 + dt.timedelta(seconds=70 + GAP_S + 1)),
    ])
    _drain(spark, input_dir, output_dir, ckpt, schema, "none")
    rows = spark.read.parquet(output_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 7
    assert r["session_start_us"] == _us(T0)
    assert r["session_end_us"] == _us(T0 + 70 * s)
    assert r["n_events"] == 3  # merged across the batch boundary


def test_event_time_timeout_closes_idle_session(spark, tmp_path):
    """In event_time mode the watermark closes idle sessions: once
    later events push the watermark past last_event + gap, the open
    session is emitted via the state timeout."""
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    s = dt.timedelta(seconds=1)
    h = dt.timedelta(hours=1)
    schema = _stage(spark, input_dir, 0, [
        (1, 1, T0),
        (2, 1, T0 + 10 * s),
    ])
    _drain(spark, input_dir, output_dir, ckpt, schema, "event_time")

    # watermark after this batch = T0 + 2h > user 1's timeout
    _stage(spark, input_dir, 1, [(3, 2, T0 + 2 * h)])
    _drain(spark, input_dir, output_dir, ckpt, schema, "event_time")

    # next drain processes the fired timer (timers fire against the
    # checkpointed watermark on the following micro-batch)
    _stage(spark, input_dir, 2, [(4, 3, T0 + 3 * h)])
    _drain(spark, input_dir, output_dir, ckpt, schema, "event_time")

    rows = {r["user_id"]: r for r in spark.read.parquet(output_dir).collect()}
    assert 1 in rows, "idle session must be closed by the watermark"
    assert rows[1]["session_start_us"] == _us(T0)
    assert rows[1]["session_end_us"] == _us(T0 + 10 * s)
    assert rows[1]["n_events"] == 2
    assert 3 not in rows  # watermark has not passed user 3's gap
