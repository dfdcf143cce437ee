"""CCNet-style unigram LM scoring: ranking semantics, integerised
aggregation parity, and plan shape."""

import duckdb
from pyspark.sql import functions as F

from docling_core_spark.corpus import lm as L

SF = "/root/testdata/sf0.001"


def test_off_distribution_doc_scores_lower(spark, tmp_path):
    """A doc of corpus-frequent words must out-score a doc of hapaxes —
    the CCNet ranking property the operator exists for."""
    docs = spark.createDataFrame(
        [(1, "common words common words common words", "en", "s", 39),
         (2, "common words common words common words", "en", "s", 39),
         (3, "zxqv jkwp qmfl xbrt zzyq plomk", "en", "s", 30)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r["doc_id"]: r
            for r in L.q_lm_score(spark, str(tmp_path)).collect()}
    assert rows[1]["avg_logprob"] == rows[2]["avg_logprob"]  # same text
    assert rows[3]["avg_logprob"] < rows[1]["avg_logprob"]
    assert rows[1]["n_tokens"] == 6


def test_cross_engine_parity(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    got = (L.q_lm_score(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (con.execute(L.sql_lm_score()).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 500
    fmt = lambda x: f"{x:.6g}" if isinstance(x, float) else str(x)
    for c in sorted(got.columns):
        assert [fmt(x) for x in got[c]] == [fmt(x) for x in want[c]], c
    assert (got["avg_logprob"] < 0).all()


def test_plan_shape(spark):
    plan = (L.q_lm_score(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan  # scalars go via broadcast
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_segment_ppl_bounds(spark):
    """Worst <= best per doc, segment counts match ceil(tokens/SEG)
    (cross-checked against token_stats), and both engines agree."""
    import duckdb

    from docling_core_spark.corpus.lm import q_segment_ppl, sql_segment_ppl

    import math

    from docling_core_spark.corpus.dedup import SEG_WORDS

    rows = q_segment_ppl(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.worst_avg_micro <= r.best_avg_micro
        assert r.n_segs >= 1 and 0 <= r.n_bad_segs <= r.n_segs

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    orc = set(map(tuple, con.execute(sql_segment_ppl()).fetchall()))
    assert {tuple(r) for r in rows} == orc

    # the promised cross-check: n_segs == ceil(n_tokens / SEG_WORDS)
    toks = dict(con.execute(
        "SELECT doc_id, len(regexp_split_to_array(lower(trim(text)),"
        " '\\s+')) FROM documents"
    ).fetchall())
    for r in rows:
        assert r.n_segs == math.ceil(toks[r.doc_id] / SEG_WORDS), r
