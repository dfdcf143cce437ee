"""Incremental extraction via Structured Streaming.

The reference is batch/in-memory (SURVEY.md §2.6); the engine's
incremental story is Spark-native:

  - `readStream` over a parquet directory of (doc_id, spans) files — at
    production scale an Iceberg/Delta table feed or a file drop zone;
  - the SAME shuffle-free `run_pipeline` mapInPandas stage (streaming
    and batch share one code path, so parity tests cover both);
  - `writeStream` with Spark's own checkpoint log: files are processed
    exactly once across restarts; `Trigger.AvailableNow` drains the
    backlog and stops, which is also how a cron-scheduled incremental
    ingest runs;
  - alternatively `foreachBatch` commits per-micro-batch metric rows
    next to the output — the streaming twin of ops/ledger.py (which
    covers the batch-resume path with per-shard lineage).

No watermarks/event-time are needed: documents are independent rows
(no temporal joins exist in the reference's semantics).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import SparkSession

from .. import schema as S
from ..pipeline import run_pipeline


def stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    salt_partitions: Optional[int] = None,
):
    """File-stream -> extraction -> parquet sink with checkpointing.
    Returns the StreamingQuery (AvailableNow: drains backlog, stops)."""
    src = (
        spark.readStream.schema(S.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    out = run_pipeline(src, salt_partitions=salt_partitions)
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_pipeline_foreach_batch(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """foreachBatch variant: each micro-batch writes its output AND an
    atomic metrics row (batch_id, doc/anomaly counts, wall time) —
    per-micro-batch lineage in the style of ops/ledger.py."""
    from pyspark.sql import functions as F

    metrics_dir = os.path.join(output_dir, "_batch_metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    data_dir = os.path.join(output_dir, "data")

    def handle(batch_df, batch_id: int):
        t0 = time.time()
        out = run_pipeline(batch_df)
        # foreachBatch is at-least-once: a retried micro-batch must
        # REPLACE its own output, not append a duplicate. Partition the
        # sink by batch_id and dynamically overwrite only this batch's
        # partition — the same idempotent-commit shape as the ledger.
        (
            out.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(data_dir)
        )
        agg = out.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans_in").alias("n_spans"),
            F.sum("parse_anomalies").alias("n_anomalies"),
        ).collect()[0]
        row = {
            "batch_id": int(batch_id),
            "n_docs": int(agg["n_docs"]),
            "n_spans": int(agg["n_spans"]),
            "n_anomalies": int(agg["n_anomalies"]),
            "wall_sec": round(time.time() - t0, 3),
        }
        final = os.path.join(metrics_dir, f"batch-{batch_id:06d}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(row, f)
        os.replace(tmp, final)

    src = (
        spark.readStream.schema(S.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    return (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_batch_metrics(output_dir: str):
    d = os.path.join(output_dir, "_batch_metrics")
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out
