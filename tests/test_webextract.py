"""Main-content extraction (HTML boilerplate strip + DOM heuristics):
self-validation invariants, cross-engine parity, and plan shape."""

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_core_spark.corpus import webextract as W

SF = "/root/testdata/sf0.001"


def test_html_strip_contains_source_for_all_docs(spark):
    agg = W.q_html_strip(spark, SF).agg(
        F.count("*").alias("n"),
        F.sum(F.col("contains_source").cast("int")).alias("ok"),
        F.min("n_html_chars").alias("min_html"),
    ).collect()[0]
    assert agg["n"] == 500
    assert agg["ok"] == 500  # stripping never loses the document text
    assert agg["min_html"] > 0


def test_main_content_recovers_source_for_all_docs(spark):
    agg = W.q_main_content(spark, SF).agg(
        F.count("*").alias("n"),
        F.sum(F.col("recovered").cast("int")).alias("ok"),
        F.min("n_blocks").alias("min_b"),
        F.max("n_blocks").alias("max_b"),
        F.min("n_content_blocks").alias("min_c"),
        F.max("n_content_blocks").alias("max_c"),
        F.sum("boiler_chars").alias("boiler"),
    ).collect()[0]
    assert agg["n"] == 500
    # every synthesised page yields exactly the 6 known blocks, exactly
    # the 2 content paragraphs, and the classifier reconstructs the
    # original text byte-for-byte
    assert agg["ok"] == 500
    assert agg["min_b"] == agg["max_b"] == 6
    assert agg["min_c"] == agg["max_c"] == 2
    assert agg["boiler"] > 0  # nav/h1/aside/footer mass was rejected


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    pq = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)
    return pq


def test_classifier_rejects_short_and_linky_blocks(spark, tmp_path):
    """A doc shorter than 2*LENGTH_LOW chars per paragraph half is
    honestly NOT recovered (both halves fall under the length floor)."""
    long_text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliett kilo lima mike november oscar papa"
    )
    _write_docs(
        spark, tmp_path,
        [(1, long_text, "en", "srcA", len(long_text)),
         (2, "tiny words only", "en", "srcB", 15)],
    )
    rows = {r["doc_id"]: r
            for r in W.q_main_content(spark, str(tmp_path)).collect()}
    assert rows[1]["recovered"] is True
    assert rows[1]["n_content_blocks"] == 2
    # 'tiny words' / 'only' halves are 10 and 4 chars < LENGTH_LOW
    assert rows[2]["recovered"] is False
    assert rows[2]["n_content_blocks"] == 0
    assert rows[2]["content_chars"] == 0
    # the boilerplate blocks were still found and counted
    assert rows[2]["n_blocks"] == 6
    assert rows[2]["boiler_chars"] > 0


def test_cross_engine_parity_on_crafted_fixture(spark, tmp_path):
    pq = _write_docs(
        spark, tmp_path,
        [(1, "alpha bravo charlie delta echo foxtrot golf hotel india"
             " juliett kilo lima", "en", "srcA", 80),
         (2, "tiny words only", "de", "srcB", 15),
         (3, "one two three four five six seven eight nine ten eleven"
             " twelve thirteen fourteen", "fr", "srcC", 85)],
    )
    part = glob.glob(pq + "/*.parquet")[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{part}')"
    )
    for qf, sqlf in [(W.q_html_strip, W.sql_html_strip),
                     (W.q_main_content, W.sql_main_content)]:
        got = (qf(spark, str(tmp_path)).toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = (con.execute(sqlf()).df()
                .sort_values("doc_id").reset_index(drop=True))
        assert sorted(got.columns) == sorted(want.columns)
        for c in sorted(got.columns):
            assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c


@pytest.mark.parametrize("qf", [W.q_html_strip, W.q_main_content])
def test_plan_is_scan_shaped(spark, qf):
    """Narrow per-row expressions: the only allowed Exchange is
    read_spread's small-file fan-out repartition."""
    plan = (qf(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Exchange") <= 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_boilerplate_rejected_even_when_long(spark, tmp_path):
    """Scale regression: an 11+-digit doc_id pushes the h1 over the
    length floor and a long source name pushes the footer over it —
    the tag guard must still classify both as boilerplate."""
    text = ("alpha bravo charlie delta echo foxtrot golf hotel india"
            " juliett kilo lima mike november")
    _write_docs(
        spark, tmp_path,
        [(123456789012, text, "en",
          "a-very-long-source-name-over-36-chars-x", len(text))],
    )
    rows = W.q_main_content(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_content_blocks"] == 2  # the two <p> halves, nothing else
    assert r["recovered"] is True      # no 'doc N'/footer leak into main


def test_extract_links_inventory_and_parity(spark):
    out = W.q_extract_links(spark, SF)
    per = out.groupBy("doc_id").count().collect()
    assert len(per) == 500 and all(r["count"] == 6 for r in per)
    anchors = {r["anchor"] for r in out.where("doc_id = 0").collect()}
    assert {"home", "sponsored", "terms", "privacy"} <= anchors
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    got = (out.toPandas().sort_values(["doc_id", "ord"])
           .reset_index(drop=True))
    want = (con.execute(W.sql_extract_links()).df()
            .sort_values(["doc_id", "ord"]).reset_index(drop=True))
    for c in sorted(got.columns):
        assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c
