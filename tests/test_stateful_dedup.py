"""Cross-micro-batch stateful dedup (applyInPandasWithState): a content
hash emitted in one micro-batch is suppressed in all later ones, with
state surviving restarts via the checkpoint."""

import pandas as pd
import pytest

from docling_core_spark.streaming.stateful import dedup_stream


def _write_docs(spark, input_dir, rows):
    from docling_core_spark import schema as S

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                doc_id, text = rows[int(i)]
                out.append(
                    {
                        "doc_id": doc_id,
                        "spans": [
                            {"kind": "text", "text": text,
                             "media_ref": "", "offset": 0}
                        ],
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "spans"])

    (
        spark.range(0, len(rows), numPartitions=1)
        .mapInPandas(gen, schema=S.DOCS_SCHEMA)
        .write.mode("append").parquet(input_dir)
    )


def test_dedup_across_micro_batches_and_restarts(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two distinct texts plus an in-batch duplicate
    _write_docs(spark, input_dir, [
        ("a1", "alpha text"), ("b1", "beta text"), ("a2", "alpha text"),
    ])
    q = dedup_stream(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    out1 = spark.read.parquet(output_dir)
    assert out1.count() == 2
    hashes1 = {r["content_hash"] for r in out1.collect()}

    # batch 2 (restart): repeats alpha + beta, adds gamma -> only gamma
    _write_docs(spark, input_dir, [
        ("a3", "alpha text"), ("b2", "beta text"), ("c1", "gamma text"),
    ])
    q = dedup_stream(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    out2 = spark.read.parquet(output_dir).collect()
    assert len(out2) == 3
    new = [r for r in out2 if r["content_hash"] not in hashes1]
    assert len(new) == 1
    assert new[0]["doc_id"] == "c1"


def test_dedup_state_ttl_evicts_idle_keys(spark, tmp_path):
    """Bounded-window semantics: a key idle past ttl_ms is evicted on
    the next trigger (state hygiene), so a later duplicate re-emits;
    a key refreshed within the window stays suppressed."""
    import time

    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ttl = 500

    def wait_rows(n, timeout=90):
        t0 = time.time()
        while time.time() - t0 < timeout:
            try:
                if spark.read.parquet(output_dir).count() >= n:
                    return True
            except Exception:
                pass
            time.sleep(0.5)
        return False

    # ONE long-lived continuously-triggered stream (the deployment
    # shape for timer-based state TTL; AvailableNow never terminates
    # with pending processing-time timers)
    _write_docs(spark, input_dir, [("x1", "xray text")])
    q = dedup_stream(
        spark, input_dir, output_dir, ckpt, ttl_ms=ttl,
        processing_time="500 milliseconds",
    )
    try:
        assert wait_rows(1)

        # let the window elapse while the stream idles: the timeout
        # fires and evicts the idle key
        time.sleep(1.5)
        _write_docs(spark, input_dir, [("y1", "yankee text")])
        assert wait_rows(2)

        # original content again: state was evicted -> re-emitted
        time.sleep(1.5)
        _write_docs(spark, input_dir, [("x2", "xray text")])
        assert wait_rows(3)
    finally:
        q.stop()
    rows = spark.read.parquet(output_dir).collect()
    assert sorted(r["doc_id"] for r in rows) == ["x1", "x2", "y1"]
