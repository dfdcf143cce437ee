"""Checkpoint-ledger tests: crash -> resume at shard granularity, exact
lineage verification, idempotent completion."""

import pytest

from docling_core_spark.ops import (
    pending_shards,
    read_ledger,
    run_with_ledger,
)
from docling_core_spark.ops.ledger import verify_lineage

N_SHARDS = 6
N_DOCS = 40


@pytest.fixture()
def docs(spark):
    from docling_core_spark.pipeline import synth_docs

    return synth_docs(spark, N_DOCS, partitions=4)


def test_crash_then_resume_completes_exactly(spark, docs, tmp_path):
    out = str(tmp_path / "run")

    with pytest.raises(RuntimeError, match="simulated crash"):
        run_with_ledger(
            spark, docs, out, num_shards=N_SHARDS, shards_per_batch=2,
            fail_after_batches=1,
        )
    after_crash = read_ledger(out)
    assert 0 < len(after_crash) < N_SHARDS
    committed_shards = {e.shard for e in after_crash}
    assert pending_shards(out, N_SHARDS) == sorted(
        set(range(N_SHARDS)) - committed_shards
    )

    # resume processes ONLY the uncommitted shards
    resumed = run_with_ledger(
        spark, docs, out, num_shards=N_SHARDS, shards_per_batch=2
    )
    assert {e.shard for e in resumed} == set(range(N_SHARDS)) - committed_shards
    assert pending_shards(out, N_SHARDS) == []

    # full corpus present exactly once in the output
    written = spark.read.parquet(f"{out}/data")
    assert written.count() == docs.count()
    assert written.select("doc_id").distinct().count() == docs.count()

    # ledger metrics add up to the corpus totals
    ledger = read_ledger(out)
    assert sum(e.doc_count for e in ledger) == docs.count()
    assert all(e.status == "done" for e in ledger)

    # lineage audit: every shard's fingerprint matches the input
    audit = verify_lineage(spark, docs, out, N_SHARDS).collect()
    assert len(audit) == len(ledger)
    assert all(r["lineage_ok"] for r in audit)


def test_completed_run_is_noop_on_reinvoke(spark, docs, tmp_path):
    out = str(tmp_path / "run")
    run_with_ledger(spark, docs, out, num_shards=4, shards_per_batch=4)
    first = {e.shard: e.committed_at for e in read_ledger(out)}
    again = run_with_ledger(spark, docs, out, num_shards=4, shards_per_batch=4)
    assert again == []  # nothing pending -> no work, no re-commits
    assert {e.shard: e.committed_at for e in read_ledger(out)} == first


def test_verify_lineage_flags_one_sided_shards(spark, docs, tmp_path):
    """A shard present on only one side of the audit join (skipped /
    extra) must yield lineage_ok == False, never NULL."""
    import os

    from docling_core_spark.ops.ledger import _ledger_dir

    out = str(tmp_path / "run")
    run_with_ledger(spark, docs, out, num_shards=4, shards_per_batch=4)
    # drop one shard's ledger entry -> audit sees input with no commit
    ldir = _ledger_dir(out)
    victim = sorted(os.listdir(ldir))[0]
    os.remove(os.path.join(ldir, victim))
    audit = {r["shard"]: r for r in
             verify_lineage(spark, docs, out, 4).collect()}
    bad = [s for s, r in audit.items() if r["lineage_ok"] is not True]
    assert len(bad) == 1
    assert audit[bad[0]]["lineage_ok"] is False  # not None
