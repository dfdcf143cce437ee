"""Deterministic stratified sampling: balance, determinism, parity,
and the scale-critical broadcast-prefilter plan shape."""

import duckdb
from pyspark.sql import functions as F

from docling_core_spark.corpus import sampling as S

SF = "/root/testdata/sf0.001"


def test_balanced_and_deterministic(spark):
    out = S.q_stratified_sample(spark, SF)
    per = out.groupBy("source", "lang").count().collect()
    assert all(r["count"] <= S.SAMPLE_K for r in per)
    # strata with >= K docs yield exactly K
    full = [r for r in per if r["count"] == S.SAMPLE_K]
    assert len(full) > 50  # most of the ~100 strata are selecting
    # rerun == same rows (no RNG state)
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in S.q_stratified_sample(spark, SF).collect())
    assert a == b


def test_small_strata_pass_through(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "only", 10) for i in range(2)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = S.q_stratified_sample(spark, str(tmp_path)).collect()
    assert len(rows) == 2  # stratum smaller than K is kept whole
    assert {r["doc_id"] for r in rows} == {0, 1}
    assert all(r["n_stratum"] == 2 for r in rows)


def test_cross_engine_parity(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    cols = ["source", "lang", "rk"]
    got = (S.q_stratified_sample(spark, SF).toPandas()
           .sort_values(cols).reset_index(drop=True))
    want = (con.execute(S.sql_stratified_sample()).df()
            .sort_values(cols).reset_index(drop=True))
    assert sorted(got.columns) == sorted(want.columns)
    for c in sorted(got.columns):
        assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c


def test_plan_broadcasts_stratum_sizes(spark):
    """The stratum-size table must broadcast and the hash prefilter must
    run before the window — the window may only see the survivor set."""
    plan = (S.q_stratified_sample(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the hash prefilter (h compared against the least(H30_MOD,
    # ceil(K*SAFETY*...)) bound) must apply BELOW the top-K Window —
    # Catalyst folds it into the BroadcastHashJoin condition
    # ('h#.. < least(..' on the join line) or leaves it as a Filter;
    # delete the prefilter in q_stratified_sample and this fails
    lines = plan.splitlines()
    win_idx = min(i for i, ln in enumerate(lines) if "Window [" in ln)
    prefilter_idx = [
        i for i, ln in enumerate(lines)
        if ("Filter" in ln or "Join" in ln)
        and "least(" in ln and "h#" in ln
    ]
    assert prefilter_idx and min(prefilter_idx) > win_idx, plan


def test_weighted_sample_biased_and_parity(spark):
    got = (S.q_weighted_sample(spark, SF).toPandas()
           .sort_values("rk").reset_index(drop=True))
    assert len(got) == S.WEIGHTED_K
    assert list(got["rk"]) == list(range(1, S.WEIGHTED_K + 1))
    # priority sampling must over-represent heavy (long) documents
    all_docs = S.q_stratified_sample.__globals__["read_spread"](
        spark, SF, "documents"
    )
    from pyspark.sql import functions as F

    corpus_mean = all_docs.agg(
        F.avg(F.expr("size(split(lower(trim(text)), '\\\\s+'))"))
    ).collect()[0][0]
    assert got["n_tokens"].mean() > corpus_mean
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    want = (con.execute(S.sql_weighted_sample()).df()
            .sort_values("rk").reset_index(drop=True))
    fmt = lambda x: f"{x:.6g}" if isinstance(x, float) else str(x)
    for c in sorted(got.columns):
        assert [fmt(x) for x in got[c]] == [fmt(x) for x in want[c]], c


def test_weighted_sample_plan_is_takeordered(spark):
    plan = (S.q_weighted_sample(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_mixture_weights_math_and_parity(spark, tmp_path):
    """Two strata with a 3:1 token imbalance: the heavy stratum gets
    weight < 1 (downweighted), the light one > 1, and every micro
    integer matches the hand computation and the DuckDB oracle."""
    import glob

    rows = [
        # (s0, en): 6 tokens; (s1, de): 2 tokens -> shares 750000/250000
        (1, "a b c", "en", "s0"),
        (2, "d e f", "en", "s0"),
        (3, "g h", "de", "s1"),
    ]
    pq = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source"]
    ).coalesce(1).write.mode("overwrite").parquet(pq)
    got = (S.q_mixture_weights(spark, str(tmp_path)).toPandas()
           .sort_values(["source", "lang"]).reset_index(drop=True))
    by = {(r.source, r.lang): r for r in got.itertuples()}
    heavy, light = by[("s0", "en")], by[("s1", "de")]
    assert heavy.tokens == 6 and light.tokens == 2
    assert heavy.observed_micro == 750_000
    assert light.observed_micro == 250_000
    assert heavy.target_micro == 500_000 == light.target_micro
    assert heavy.weight_micro == 500_000 * 1_000_000 // 750_000
    assert light.weight_micro == 2_000_000  # 0.5 / 0.25
    part = glob.glob(pq + "/*.parquet")[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{part}')"
    )
    want = (con.execute(S.sql_mixture_weights()).df()
            .sort_values(["source", "lang"]).reset_index(drop=True))
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_dsir_parity_and_target_bias(spark):
    """DSIR vs the DuckDB oracle, plus the semantic property the
    operator exists for: documents FROM the target slice (lang='en')
    must score higher on average than off-target documents, because
    the target model was fit on them."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = (S.q_dsir_weights(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (con.execute(S.sql_dsir_weights()).df()
            .sort_values("doc_id").reset_index(drop=True))
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c

    langs = {
        r["doc_id"]: r["lang"]
        for r in S.q_dsir_weights.__globals__["read_spread"](
            spark, SF, "documents"
        ).select("doc_id", "lang").collect()
    }
    on = [r.li_avg for r in got.itertuples() if langs[r.doc_id] == "en"]
    off = [r.li_avg for r in got.itertuples() if langs[r.doc_id] != "en"]
    assert sum(on) / len(on) > sum(off) / len(off)
    # the Gumbel-top-K cut must be dominated by target-like docs
    sel = S.q_dsir_select(spark, SF).collect()
    assert len(sel) == S.DSIR_K
    n_en = sum(1 for r in sel if langs[r["doc_id"]] == "en")
    # clear enrichment over the ~39% base rate (Gumbel resampling is
    # intentionally noisy — it samples proportionally, not greedily)
    base_rate = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert n_en / S.DSIR_K > base_rate * 1.35
    # rank is dense 1..K and follows the key ordering
    assert [r["rk"] for r in sorted(sel, key=lambda r: (-r["key_micro"], r["doc_id"]))] == list(range(1, S.DSIR_K + 1))


def test_dsir_select_plan_shape(spark):
    """The global cut must be a distributed TakeOrderedAndProject, and
    the 4096-row log-ratio table must broadcast onto the gram stream
    (no shuffle join on the corpus side)."""
    plan = (S.q_dsir_select(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_temperature_mixture_flattens_toward_tail(spark):
    """alpha=0.3 tempering must upsample every tail language
    (ratio > 1) and downsample the head (en, ratio < 1); sampling
    shares sum to ~1e6 micro and both engines agree bit-for-bit."""
    import duckdb

    from docling_core_spark.corpus.sampling import (
        q_temperature_mixture, sql_temperature_mixture,
    )

    rows = q_temperature_mixture(spark, SF).collect()
    by_lang = {r.lang: r for r in rows}
    head = max(rows, key=lambda r: r.tokens)
    assert head.lang == "en"
    assert head.ratio_micro < 1_000_000
    for r in rows:
        if r.lang != head.lang:
            assert r.ratio_micro > 1_000_000, r
    assert abs(sum(r.sample_micro for r in rows) - 1_000_000) <= len(rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    orc = set(map(tuple, con.execute(sql_temperature_mixture()).fetchall()))
    assert {tuple(r) for r in rows} == orc
