"""Sequence packing: contiguity/coverage invariants, cross-engine
parity, and the two-level prefix-sum plan shape."""

import duckdb
from pyspark.sql import functions as F

from docling_core_spark.corpus import packing as P

SF = "/root/testdata/sf0.001"


def test_packing_is_a_contiguous_disjoint_cover(spark):
    rows = sorted(
        P.q_pack_sequences(spark, SF).collect(),
        key=lambda r: r["global_start"],
    )
    assert rows[0]["global_start"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["global_start"] == a["global_start"] + a["n_tokens"]
    total = sum(r["n_tokens"] for r in rows)
    last = rows[-1]
    assert last["global_start"] + last["n_tokens"] == total
    # seq/offset arithmetic
    for r in rows:
        assert r["first_seq"] == r["global_start"] // P.SEQ_LEN
        assert r["start_pos"] == r["global_start"] % P.SEQ_LEN
        if r["n_tokens"] > 0:
            assert r["last_seq"] == (
                r["global_start"] + r["n_tokens"] - 1
            ) // P.SEQ_LEN
            assert r["last_seq"] >= r["first_seq"]


def test_deterministic_across_runs(spark):
    a = sorted(tuple(r) for r in P.q_pack_sequences(spark, SF).collect())
    b = sorted(tuple(r) for r in P.q_pack_sequences(spark, SF).collect())
    assert a == b


def test_cross_engine_parity(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    got = (P.q_pack_sequences(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (con.execute(P.sql_pack_sequences()).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert sorted(got.columns) == sorted(want.columns)
    for c in sorted(got.columns):
        assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c


def test_plan_has_no_global_corpus_window(spark):
    """Every corpus-wide Window must be partitioned (the within-group
    cumsum); the only unpartitioned window runs over the PACK_GROUPS-row
    totals table, and the prefix table comes back via broadcast."""
    df = P.q_pack_sequences(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # a PARTITIONED Window prints THREE bracket groups
    # 'Window [exprs], [partSpec], [orderSpec]' (2x '], ['); a global
    # one prints two ('Window [exprs], [orderSpec]', 1x '], [') — the
    # windowspecdefinition inside the first group uses parens, never
    # '], [', so the separator count is unambiguous (probed on 4.1.2)
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(win_lines) == 2, plan  # within-group cumsum + group prefix
    unpartitioned = [ln for ln in win_lines if ln.count("], [") == 1]
    partitioned = [ln for ln in win_lines if ln.count("], [") == 2]
    # exactly ONE global window (the PACK_GROUPS-row prefix table); the
    # corpus-wide cumsum must be partitioned on g
    assert len(unpartitioned) == 1, plan
    assert len(partitioned) == 1 and "g#" in partitioned[0], plan


def test_shard_manifest_exactly_once(spark):
    """Every packed sequence lands in exactly one shard: n_seqs sums to
    the total sequence count, and the XOR of shard lineages equals the
    XOR over all sequence hashes (any dropped or duplicated sequence
    breaks it)."""
    from functools import reduce

    from docling_core_spark.corpus.packing import (
        q_pack_sequences, q_shard_manifest,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_shard_manifest(spark, sf).collect()
    pack = q_pack_sequences(spark, sf).collect()
    n_seqs_total = len({
        s for r in pack for s in range(r["first_seq"], r["last_seq"] + 1)
    })
    assert sum(r["n_seqs"] for r in rows) == n_seqs_total
    assert sum(r["n_doc_slices"] for r in rows) == sum(
        r["last_seq"] - r["first_seq"] + 1 for r in pack
    )
    import hashlib

    def h30(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % (1 << 30)

    want = reduce(
        lambda a, x: a ^ x,
        (h30(str(s)) for r in pack
         for s in range(r["first_seq"], r["last_seq"] + 1)),
        0,
    )
    # per-seq hash enters each shard's XOR once -> global XOR matches
    have = reduce(lambda a, r: a ^ r["lineage_xor"], rows, 0)
    # sequences shared by several docs still hash once: recompute over
    # the DISTINCT sequence set
    want_distinct = reduce(
        lambda a, x: a ^ x,
        {h30(str(s)) for r in pack
         for s in range(r["first_seq"], r["last_seq"] + 1)},
        0,
    )
    assert have == want_distinct, (have, want, want_distinct)


def test_mm_pack_accounting_and_parity(spark):
    """mm_pack conserves the corpus cost mass (sum over sequences ==
    sum over docs of text+vision cost), its plan keeps the prefix-sum
    decomposition (one partitioned corpus window, one global window on
    the group-totals table), and both engines emit identical rows."""
    seqs = P.q_mm_pack(spark, SF).collect()
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    orc = set(map(tuple, con.execute(P.sql_mm_pack()).fetchall()))
    assert {tuple(r) for r in seqs} == orc

    tot = con.execute(
        "SELECT sum(len(regexp_split_to_array(lower(trim(text)),"
        " '\\s+')))::BIGINT,"
        " sum(CASE WHEN doc_id % 3 = 0 THEN"
        " (ceil((320 + doc_id % 320) / 28.0)"
        "  * ceil((240 + doc_id % 240) / 28.0))::BIGINT"
        " ELSE 0 END)::BIGINT FROM documents"
    ).fetchone()
    assert sum(r.txt_tokens for r in seqs) == tot[0]
    assert sum(r.img_tokens for r in seqs) == tot[1]

    plan = P.q_mm_pack(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    unpartitioned = [ln for ln in win_lines if ln.count("], [") == 1]
    partitioned = [ln for ln in win_lines if ln.count("], [") == 2]
    assert len(unpartitioned) == 1, plan
    assert len(partitioned) == 1 and "g#" in partitioned[0], plan
    assert "BroadcastHashJoin" in plan
