"""The resumable curation job: content-hash sharding must make the
per-shard decision equal the corpus-global one, crashes must resume at
the first uncommitted shard without rework, and the lineage audit must
certify what landed in storage."""

import pytest

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from docling_core_spark.corpus import read_spread

    return read_spread(spark, SF, "documents")


def test_sharded_decision_equals_global(spark, tmp_path):
    """The design invariant: running the decision per content-hash
    shard yields EXACTLY the corpus-global keep/canonical set."""
    from docling_core_spark.corpus.curation import curation_decide
    from jobs.curation_job import run_curation_with_ledger

    out = str(tmp_path / "run")
    run_curation_with_ledger(
        spark, _docs(spark), out, num_shards=7, shards_per_batch=3
    )
    sharded = {
        r["doc_id"]: (r["is_canonical"], r["keep"])
        for r in spark.read.parquet(out + "/data").collect()
    }
    whole = {
        r["doc_id"]: (r["is_canonical"], r["keep"])
        for r in curation_decide(_docs(spark)).collect()
    }
    assert sharded == whole


def test_crash_resume_is_idempotent(spark, tmp_path):
    from jobs.curation_job import (
        pending_shards,
        read_ledger,
        run_curation_with_ledger,
    )

    out = str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_curation_with_ledger(
            spark, _docs(spark), out,
            num_shards=6, shards_per_batch=2, fail_after_batches=1,
        )
    assert len(read_ledger(out)) == 2
    assert pending_shards(out, 6) == [2, 3, 4, 5]
    # resume: only the uncommitted shards run
    resumed = run_curation_with_ledger(
        spark, _docs(spark), out, num_shards=6, shards_per_batch=2
    )
    assert sorted(e.shard for e in resumed) == [2, 3, 4, 5]
    assert pending_shards(out, 6) == []
    # the committed set covers the corpus exactly once
    ledger = read_ledger(out)
    assert sum(e.n_docs for e in ledger) == _docs(spark).count()


def test_lineage_audit_detects_tampering(spark, tmp_path):
    import json
    import os

    from jobs.curation_job import (
        run_curation_with_ledger,
        verify_lineage,
    )

    out = str(tmp_path / "run")
    run_curation_with_ledger(
        spark, _docs(spark), out, num_shards=5, shards_per_batch=5
    )
    audit = verify_lineage(spark, _docs(spark), out, 5)
    assert all(r["lineage_ok"] for r in audit)
    # corrupt one ledger entry: the audit must flag exactly that shard
    path = os.path.join(out, "_ledger", "shard-000002.json")
    with open(path) as f:
        entry = json.load(f)
    entry["n_docs"] += 1
    with open(path, "w") as f:
        json.dump(entry, f)
    audit = {r["shard"]: r["lineage_ok"] for r in verify_lineage(
        spark, _docs(spark), out, 5
    )}
    assert audit[2] is False
    assert all(ok for s, ok in audit.items() if s != 2)
