"""Corpus keyword operators: top n-grams and per-doc TF-IDF top-k."""

import glob

import duckdb
from pyspark.sql import functions as F

from docling_core_spark.corpus import keywords as K

SF = "/root/testdata/sf0.001"


def test_top_ngrams_shape_and_order(spark):
    rows = K.q_top_ngrams(spark, SF).collect()
    assert len(rows) == K.TOP_NGRAMS_K
    assert [r["rank"] for r in rows] == list(range(1, 101))
    # deterministic (count desc, gram asc) order
    keys = [(-r["n_occurrences"], r["gram"]) for r in rows]
    assert keys == sorted(keys)
    assert all(r["n_docs"] <= r["n_occurrences"] for r in rows)


def test_tfidf_crafted_fixture(spark, tmp_path):
    """'rare' appears only in doc 1 -> highest idf there; 'common' is in
    every doc -> lowest idf."""
    docs = spark.createDataFrame(
        [(1, "common rare common alpha"),
         (2, "common beta beta gamma"),
         (3, "common gamma delta alpha")],
        ["doc_id", "text"],
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = K.q_tfidf_topk(spark, str(tmp_path))
    d1 = {r["rank"]: r for r in out.where("doc_id = 1").collect()}
    assert d1[1]["term"] == "rare"
    assert d1[1]["df"] == 1
    # the everywhere-term scores idf = ln(4/4) = 0 exactly
    common = [r for r in d1.values() if r["term"] == "common"][0]
    assert common["score"] == 0.0
    assert common["df"] == 3 and common["tf"] == 2
    # every doc emits at most TFIDF_TOPK rows
    counts = (out.groupBy("doc_id").count().collect())
    assert all(c["count"] <= K.TFIDF_TOPK for c in counts)


def test_cross_engine_parity_sf0001(spark):
    part = glob.glob(f"{SF}/documents.parquet")[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{part}')"
    )
    for name, qf, sqlf, sort_cols in [
        ("top_ngrams", K.q_top_ngrams, K.sql_top_ngrams, ["rank"]),
        ("tfidf_topk", K.q_tfidf_topk, K.sql_tfidf_topk,
         ["doc_id", "rank"]),
    ]:
        got = (qf(spark, SF).toPandas()
               .sort_values(sort_cols).reset_index(drop=True))
        want = (con.execute(sqlf()).df()
                .sort_values(sort_cols).reset_index(drop=True))
        assert sorted(got.columns) == sorted(want.columns), name
        for c in sorted(got.columns):
            fmt = lambda x: (f"{x:.6g}" if isinstance(x, float) else str(x))
            assert [fmt(x) for x in got[c]] == [fmt(x) for x in want[c]], (
                name, c)


def test_top_ngrams_plan_no_global_window_before_cut(spark):
    """The rank window must run AFTER the TakeOrdered top-k cut — a
    global row_number over the full aggregate would single-partition
    the whole vocabulary at scale."""
    plan = (K.q_top_ngrams(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_plan_shape(spark):
    plan = (K.q_tfidf_topk(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_one_sided_error_and_parity(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    got = (K.q_cms_heavy_hitters(spark, SF).toPandas()
           .sort_values("rank").reset_index(drop=True))
    assert len(got) == K.TOP_NGRAMS_K
    # CMS never underestimates (one-sided error, C&M 2005)
    assert (got["overestimate"] >= 0).all()
    assert (got["cms_estimate"]
            == got["true_count"] + got["overestimate"]).all()
    # with W=1024 >> 100 probes, a decent share must be collision-free
    assert (got["overestimate"] == 0).sum() > 10
    want = (con.execute(K.sql_cms_heavy_hitters()).df()
            .sort_values("rank").reset_index(drop=True))
    for c in sorted(got.columns):
        assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c


def test_cms_sketch_build_is_bounded_agg(spark):
    """The sketch groupBy key space is CMS_ROWS*CMS_WIDTH cells — the
    probe join must broadcast, and nothing may cartesian."""
    plan = (K.q_cms_heavy_hitters(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kmv_distinct_estimate_and_parity(spark, tmp_path):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    got = K.q_kmv_distinct(spark, SF).toPandas()
    want = con.execute(K.sql_kmv_distinct()).df()
    assert len(got) == 1
    for c in sorted(got.columns):
        assert str(got[c][0]) == str(want[c][0]), c
    r = got.iloc[0]
    # KMV with K=256 on ~900 distinct grams: within a few percent
    assert abs(r["rel_error"]) < 0.15
    assert r["k_held"] == K.KMV_K <= r["exact_distinct"]

    # under K distinct values the sketch is exact by construction
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "s", 22)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    small = K.q_kmv_distinct(spark, str(tmp_path)).collect()[0]
    assert small["k_held"] == small["exact_distinct"] == 3
    assert small["kmv_estimate"] == 3.0 and small["rel_error"] == 0.0


def test_hll_distinct_estimate_and_parity(spark, tmp_path):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    got = K.q_hll_distinct(spark, SF).toPandas()
    want = con.execute(K.sql_hll_distinct()).df()
    assert len(got) == 1
    for c in sorted(got.columns):
        assert str(got[c][0]) == str(want[c][0]), c
    r = got.iloc[0]
    # HLL with 256 registers: ~1.04/sqrt(256) = 6.5% std error; allow 3x
    assert abs(r["rel_error"]) < 0.20
    assert 0 <= r["n_zero_regs"] <= K.HLL_M

    # tiny stream: the linear-counting branch fires and stays close
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "s", 22)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    small = K.q_hll_distinct(spark, str(tmp_path)).collect()[0]
    assert small["exact_distinct"] == 3
    assert small["n_zero_regs"] >= K.HLL_M - 3
    assert abs(small["hll_estimate"] - 3.0) < 0.2
