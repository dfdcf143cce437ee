"""Watermarked event-time windows: late-within-watermark events merge
into their window before it finalizes; later-than-watermark events are
dropped; every window row is emitted exactly once (append mode).

Batch sequencing is controlled by running one AvailableNow drain per
input file against a shared checkpoint — each drain advances the
watermark with the max event time it has seen, exactly like successive
cron-triggered incremental runs.
"""

import os
import uuid

from pyspark.sql import Row, functions as F

from docling_core_spark.streaming.windowed import (
    EVENTS_STREAM_SCHEMA,
    run_windowed_stream,
)


def _write_batch(spark, input_dir, idx, rows):
    """One flat parquet FILE per batch (the stream source lists files,
    not nested dirs): write to staging, move the part file in."""
    import glob
    import shutil
    from datetime import datetime

    df = spark.createDataFrame(
        [
            Row(
                event_id=i,
                user_id=i % 3,
                event_type=t,
                ts=datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"),
                value=1.0,
            )
            for i, (t, ts) in enumerate(rows)
        ],
        EVENTS_STREAM_SCHEMA,
    )
    staging = os.path.join(input_dir, f"_staging-{idx}")
    df.coalesce(1).write.parquet(staging, mode="overwrite")
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(input_dir, f"batch-{idx}.parquet"))
    shutil.rmtree(staging)


def _drain(spark, input_dir, output_dir, checkpoint_dir):
    q = run_windowed_stream(spark, input_dir, output_dir, checkpoint_dir)
    q.awaitTermination(120)


def _sink_rows(spark, output_dir):
    try:
        return {
            (str(r["window_start"]), r["event_type"]): (
                r["n_events"], r["total_value_cents"],
            )
            for r in spark.read.parquet(output_dir).collect()
        }
    except Exception:
        return {}


def test_watermarked_windows_merge_late_and_drop_too_late(spark, tmp_path):
    base = str(tmp_path / uuid.uuid4().hex)
    input_dir, output_dir, ckpt = (
        f"{base}/in", f"{base}/out", f"{base}/ckpt"
    )
    os.makedirs(input_dir)

    # batch 0: in-order events inside [10:00, 10:30)
    _write_batch(spark, input_dir, 0, [
        ("click", "2026-01-01 10:05:00"),
        ("click", "2026-01-01 10:10:00"),
        ("view", "2026-01-01 10:20:00"),
    ])
    _drain(spark, input_dir, output_dir, ckpt)
    # watermark = 10:20 - 1h → nothing finalized yet
    assert _sink_rows(spark, output_dir) == {}

    # batch 1: a LATE click for the same window (10:15 < current max ts
    # but above the 09:20 watermark → must merge), plus a fresh event at
    # 12:30 that advances the watermark to 11:30 and finalizes the
    # morning window WITH the late event counted
    _write_batch(spark, input_dir, 1, [
        ("click", "2026-01-01 10:15:00"),
        ("view", "2026-01-01 12:30:00"),
    ])
    _drain(spark, input_dir, output_dir, ckpt)
    rows = _sink_rows(spark, output_dir)
    assert rows[("2026-01-01 10:00:00", "click")] == (3, 300)  # 2 + late
    assert rows[("2026-01-01 10:00:00", "view")] == (1, 100)
    assert ("2026-01-01 12:30:00", "view") not in rows  # not final yet

    # batch 2: an event older than the 11:30 watermark → dropped, its
    # (already-emitted) window must NOT change or re-emit; advance far
    # enough to finalize the 12:30 window too
    _write_batch(spark, input_dir, 2, [
        ("click", "2026-01-01 10:25:00"),   # too late: < watermark
        ("view", "2026-01-01 15:00:00"),
    ])
    _drain(spark, input_dir, output_dir, ckpt)
    rows = _sink_rows(spark, output_dir)
    assert rows[("2026-01-01 10:00:00", "click")] == (3, 300)  # unchanged
    assert rows[("2026-01-01 12:30:00", "view")] == (1, 100)
    # append mode: exactly one row per (window, type)
    all_rows = spark.read.parquet(output_dir).collect()
    keys = [(str(r["window_start"]), r["event_type"]) for r in all_rows]
    assert len(keys) == len(set(keys))
