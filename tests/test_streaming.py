"""Structured Streaming: incremental extraction with exactly-once file
processing across restarts (Spark checkpoint log)."""

import pytest

from docling_core_spark.streaming import (
    stream_pipeline,
    stream_pipeline_foreach_batch,
)
from docling_core_spark.streaming.stream import read_batch_metrics


def _write_batch(spark, input_dir, n, prefix):
    from docling_core_spark.pipeline import synth_docs

    docs = synth_docs(spark, n, partitions=2, prefix=prefix,
                      include_shapes=False)
    docs.write.mode("append").parquet(input_dir)
    return docs.count()


def test_stream_drains_and_resumes_exactly_once(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    n1 = _write_batch(spark, input_dir, 12, "s1")
    q = stream_pipeline(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(output_dir)
    assert got1.count() == n1
    assert got1.select("doc_id").distinct().count() == n1

    # new files arrive; restart drains ONLY them (checkpointed offsets)
    n2 = _write_batch(spark, input_dir, 7, "s2")
    q = stream_pipeline(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    got2 = spark.read.parquet(output_dir)
    assert got2.count() == n1 + n2
    assert got2.select("doc_id").distinct().count() == n1 + n2

    # idempotent: nothing new -> nothing reprocessed
    q = stream_pipeline(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(output_dir).count() == n1 + n2


def test_foreach_batch_commits_metrics(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    n = _write_batch(spark, input_dir, 10, "m1")
    q = stream_pipeline_foreach_batch(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)

    metrics = read_batch_metrics(output_dir)
    assert metrics
    assert sum(m["n_docs"] for m in metrics) == n
    assert all(m["n_spans"] > 0 for m in metrics)
    written = spark.read.parquet(f"{output_dir}/data")
    assert written.count() == n


def test_stream_enrich_exactly_once_and_broadcast(spark):
    """The stream-static enrichment replay must land every order
    exactly once (4 restarts against one checkpoint) and the rollup
    must equal the batch join — certified row-for-row by the gate
    oracle; here we assert the mass invariants directly."""
    from docling_core_spark.corpus import read_spread
    from docling_core_spark.streaming.replay import q_stream_enrich_replay

    sf = "/root/testdata/sf0.001"
    out = q_stream_enrich_replay(spark, sf)
    rows = out.collect()
    orders = read_spread(spark, sf, "orders").count()
    assert sum(r["n_orders"] for r in rows) == orders
    assert all(r["total_cents"] > 0 for r in rows)
    nations = read_spread(spark, sf, "nation").count()
    assert 0 < len(rows) <= nations
