"""Semantics tests for the C4-style corpus-wide segment dedup and the
Bloom-filter decontamination probe (cross-engine value parity on the
fixture corpus is covered by the driver gate + tests/test_property_corpus.py;
these assert the first-occurrence-wins / zero-false-negative SEMANTICS
on crafted inputs, and the plan shapes that carry the 100 TB story)."""

import glob
import hashlib

import duckdb

from docling_core_spark.corpus import dedup as CD, filters as CF

W = CD.SEG_WORDS  # 8

SEG_A = "a b c d e f g h"          # one full segment
SEG_B = "i j k l m n o p"
SEG_C = "q r s t u v w x"


def _write(spark, tmp_path, rows):
    pq = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(pq)
    return str(tmp_path), glob.glob(pq + "/*.parquet")[0]


def test_seg_dedup_first_occurrence_wins(spark, tmp_path):
    """doc 1 owns both segments; doc 2 is a verbatim copy (keeps 0);
    doc 3 repeats doc 1's first segment then diverges (keeps 1); doc 4
    repeats its own segment in-doc (later in-doc copy also dropped)."""
    sf, _ = _write(spark, tmp_path, [
        (1, f"{SEG_A} {SEG_B}"),
        (2, f"{SEG_A} {SEG_B}"),
        (3, f"{SEG_A} {SEG_C}"),
        (4, f"{SEG_C} {SEG_C}"),
    ])
    rows = {r["doc_id"]: r for r in CD.q_seg_dedup(spark, sf).collect()}
    assert rows[1]["n_segs"] == 2 and rows[1]["n_kept"] == 2
    assert rows[2]["n_segs"] == 2 and rows[2]["n_kept"] == 0
    assert rows[2]["kept_md5"] == hashlib.md5(b"").hexdigest()
    assert rows[3]["n_kept"] == 1
    assert rows[3]["kept_md5"] == hashlib.md5(SEG_C.encode()).hexdigest()
    # in-doc duplicate: doc 3 (doc_id < 4) already owns SEG_C, so doc 4
    # keeps nothing; had doc 3 not existed it would keep exactly one copy
    assert rows[4]["n_kept"] == 0


def test_seg_dedup_short_tail_segment(spark, tmp_path):
    """The trailing sub-W-word window is a segment of its own and
    dedups like any other."""
    sf, _ = _write(spark, tmp_path, [
        (1, f"{SEG_A} tail words"),
        (2, "tail words"),  # duplicate of doc 1's short tail segment
    ])
    rows = {r["doc_id"]: r for r in CD.q_seg_dedup(spark, sf).collect()}
    assert rows[1]["n_segs"] == 2 and rows[1]["n_kept"] == 2
    assert rows[2]["n_segs"] == 1 and rows[2]["n_kept"] == 0


def test_seg_dedup_spark_duckdb_agree_on_crafted_fixture(spark, tmp_path):
    sf, part = _write(spark, tmp_path, [
        (1, f"{SEG_A} {SEG_B}"),
        (2, f"{SEG_A} {SEG_B}"),
        (3, f"{SEG_B} {SEG_C} trailing bit"),
        (4, "single"),
    ])
    got = (CD.q_seg_dedup(spark, sf).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{part}')"
    )
    want = (con.execute(CD.sql_seg_dedup()).df()
            .sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "n_segs", "n_kept", "n_chars_kept", "kept_md5"):
        assert list(got[c]) == list(want[c]), c


def test_seg_dedup_plan_is_agg_shaped(spark):
    """The keeper selection must be a combinable hash aggregate — NOT a
    per-segment window (a window serializes the hottest boilerplate
    segment into one partition at scale)."""
    plan = (CD.q_seg_dedup(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan


def test_bloom_decontaminate_soundness_and_exact_hits(spark, tmp_path):
    """doc 13 is the eval doc; doc 1 copies one of its 8-grams (an exact
    hit the bloom filter MUST also flag); doc 2 is clean. Soundness
    (n_bloom_hits >= n_exact_hits) must hold for every doc."""
    eval_text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliett kilo lima"
    )
    contaminated = (
        "intro words alpha bravo charlie delta echo foxtrot golf hotel "
        "then it diverges completely afterwards"
    )
    clean = "totally different text with no overlap at all here ok now"
    sf, _ = _write(spark, tmp_path, [
        (13, eval_text), (1, contaminated), (2, clean),
    ])
    rows = {r["doc_id"]: r
            for r in CF.q_bloom_decontaminate(spark, sf).collect()}
    assert 13 not in rows  # eval docs excluded
    assert rows[1]["n_exact_hits"] == 1
    assert rows[1]["n_bloom_hits"] >= 1  # zero false negatives
    assert rows[2]["n_exact_hits"] == 0
    assert all(r["sound"] for r in rows.values())
    assert all(r["n_false_positives"] >= 0 for r in rows.values())


def test_bloom_decontaminate_spark_duckdb_agree(spark, tmp_path):
    sf, part = _write(spark, tmp_path, [
        (13, "one two three four five six seven eight nine ten"),
        (1, "x one two three four five six seven eight y"),
        (2, "unrelated words that never touch the eval vocabulary here"),
        (20, "one two three four five six seven eight tail tail"),
    ])
    got = (CF.q_bloom_decontaminate(spark, sf).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{part}')"
    )
    want = (con.execute(CF.sql_bloom_decontaminate()).df()
            .sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "n_grams", "n_bloom_hits", "n_exact_hits",
              "n_false_positives"):
        assert list(got[c]) == list(want[c]), c
    assert [bool(x) for x in got["sound"]] == [
        bool(x) for x in want["sound"]]


def test_bloom_plan_broadcasts_filter(spark):
    """The bitset and the exact-truth gram set must arrive broadcast;
    the training side never shuffles its exploded grams."""
    plan = (CF.q_bloom_decontaminate(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_minhash_est_error_calibration(spark, tmp_path):
    """Identical docs estimate 1.0 exactly; a near-dup pair's estimate
    lands within the sketch's resolution of the exact Jaccard; both
    engines agree on every micro-Jaccard integer."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa")
    near = base + " extra"
    sf, part = _write(spark, tmp_path, [
        (1, base), (2, base), (3, near),
        (4, "entirely different words that share nothing at all with "
            "the others in this corpus fixture"),
    ])
    got = (CD.q_minhash_est_error(spark, sf).toPandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(got) >= 1
    by_pair = {(r.doc_a, r.doc_b): r for r in got.itertuples()}
    exact_dup = by_pair[(1, 2)]
    assert exact_dup.est_micro == 1_000_000
    assert exact_dup.exact_micro == 1_000_000
    assert exact_dup.abs_err_micro == 0
    # every estimate is a multiple of 1e6/NUM_PERMS
    assert all(r.est_micro % (1_000_000 // 16) == 0 for r in got.itertuples())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{part}')"
    )
    want = (con.execute(CD.sql_minhash_est_error()).df()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    for c in ("doc_a", "doc_b", "est_micro", "exact_micro",
              "abs_err_micro"):
        assert list(got[c]) == list(want[c]), c
