"""Behavioral tests for the corpus filter operators (the cross-engine
value parity is covered by tests/test_corpus_ops.py and the driver
gate; these assert the SEMANTICS on crafted fixtures — the synthetic
corpus contains no PII and no line structure, so redaction and rule
edge cases need their own inputs)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from docling_core_spark.corpus import filters as CF

PII_TEXT = (
    "contact alice.smith+spam@example.co.uk or bob@sub.domain.org, "
    "server at 192.168.001.250 port 80, call 555-867-5309 or "
    "555 123 4567, not-an-ip 1234.5.6.7890, not-a-phone 12-34-56"
)


def test_pii_scrub_redacts_crafted_fixture(spark):
    df = spark.createDataFrame([(1, PII_TEXT)], ["doc_id", "text"])
    out = df.select(
        F.expr(CF.scrub_expr_spark("text")).alias("scrubbed"),
        *[
            F.expr(
                "size(regexp_extract_all(text,"
                f" '{CF._spark_re(pat)}', 0))"
            ).alias(f"n_{name}")
            for name, pat, _ in CF._PII
        ],
    ).collect()[0]
    assert out["n_email"] == 2
    assert out["n_ipv4"] == 1
    assert out["n_phone"] == 2
    s = out["scrubbed"]
    assert "<EMAIL>" in s and "<IP>" in s and "<PHONE>" in s
    assert "example.co.uk" not in s and "192.168" not in s
    assert "867-5309" not in s
    # non-matches survive untouched
    assert "1234.5.6.7890" in s and "12-34-56" in s


def test_pii_scrub_spark_duckdb_same_on_crafted_fixture(spark):
    """The gate corpus has no PII, so prove the two regex stacks agree
    on text that actually exercises the patterns."""
    spark_s = spark.createDataFrame([(PII_TEXT,)], ["text"]).select(
        F.expr(CF.scrub_expr_spark("text")).alias("s")
    ).collect()[0]["s"]
    duck_s = duckdb.sql(
        f"SELECT {CF.scrub_expr_duck('?')} AS s",
        params=[PII_TEXT],
    ).fetchone()[0]
    assert spark_s == duck_s


def test_gopher_rules_on_crafted_docs(spark, tmp_path):
    """A fluent English paragraph passes every rule; word salad without
    stopwords fails r_stopwords; a hash-spam doc fails r_symbol_ratio;
    a short doc fails r_word_count."""
    good = (
        "the quick brown fox jumps over the lazy dog and runs to the "
        "river for a drink of cool water that was flowing past the "
        "old mill near the edge of the quiet village where people "
        "gather in the evening to talk about the news of the day and "
        "share stories that were told for many years"
    )
    salad = " ".join(f"zz{i}qx" for i in range(60))
    hashy = "the of " + "# " * 60 + " ".join(
        "word" for _ in range(50)
    )
    short = "the of and to in is"
    docs = spark.createDataFrame(
        [(1, good), (2, salad), (3, hashy), (4, short)],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(path)

    import shutil

    # q_gopher_quality reads <sf_dir>/documents.parquet (a directory
    # works the same for spark.read.parquet)
    sf_dir = str(tmp_path)
    shutil.move(path, str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in CF.q_gopher_quality(spark, sf_dir).collect()
    }
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["r_stopwords"] is False
    assert rows[3]["keep"] is False and rows[3]["r_symbol_ratio"] is False
    assert rows[4]["keep"] is False and rows[4]["r_word_count"] is False


def test_dup_ngrams_counts_repetition(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: ab ba ab ba ab -> all dup
            (2, "one two three four"),  # 3 distinct bigrams, no dups
            (3, "single"),           # no bigrams
        ],
        ["doc_id", "text"],
    )
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r["doc_id"]: r
        for r in CF.q_dup_ngrams(spark, str(tmp_path)).collect()
    }
    assert rows[1]["n_bigrams"] == 5
    assert rows[1]["top_bigram_n"] == 3  # "a b" x3
    assert rows[1]["dup_bigram_frac"] == 1.0
    assert rows[2]["n_bigrams"] == 3
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[3]["n_bigrams"] == 0
    assert rows[3]["top_bigram_frac"] == 0.0


def test_gopher_plan_is_scan_shaped(spark):
    """Zero exchanges: the rules are narrow per-row expressions."""
    plan = CF.q_gopher_quality(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    # read_spread may inject its fan-out repartition on the tiny test
    # file; beyond that the plan must be exchange-free
    assert plan.count("Exchange") <= 1


def test_pii_plan_is_scan_shaped(spark):
    plan = CF.q_pii_scrub(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1


def test_decontaminate_flags_8gram_overlap(spark, tmp_path):
    """doc 13 is the eval doc (13 % 97 == 13); doc 1 copies one of its
    8-grams verbatim, doc 2 shares only shorter overlaps."""
    eval_text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliett kilo lima"
    )
    # contains 'alpha ... hotel' = the eval doc's first 8-gram
    contaminated = (
        "intro words alpha bravo charlie delta echo foxtrot golf hotel "
        "then it diverges completely afterwards"
    )
    # 7-gram overlap only -> clean
    clean = (
        "alpha bravo charlie delta echo foxtrot golf DIFFERENT tail "
        "words here"
    )
    docs = spark.createDataFrame(
        [(13, eval_text), (1, contaminated), (2, clean)],
        ["doc_id", "text"],
    )
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {
        r["doc_id"]: r
        for r in CF.q_decontaminate(spark, str(tmp_path)).collect()
    }
    assert 13 not in rows  # eval docs excluded from the output
    assert rows[1]["contaminated"] is True
    assert rows[1]["n_hit_grams"] == 1
    assert rows[2]["contaminated"] is False
    assert rows[2]["n_hit_grams"] == 0
    assert rows[2]["n_grams"] == 4  # 11 words -> 4 8-grams


def test_decontaminate_spark_duckdb_agree_on_crafted_fixture(
    spark, tmp_path
):
    docs = spark.createDataFrame(
        [
            (13, "one two three four five six seven eight nine ten"),
            (1, "x one two three four five six seven eight y"),
            (2, "totally different text with no overlap at all here ok"),
            (20, "one two three four five six seven eight tail tail"),
        ],
        ["doc_id", "text"],
    )
    pq = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.mode("overwrite").parquet(pq)
    got = (
        CF.q_decontaminate(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import glob

    part = glob.glob(pq + "/*.parquet")[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{part}')"
    )
    want = (
        con.execute(CF.sql_decontaminate())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_grams"]) == list(want["n_grams"])
    assert list(got["n_hit_grams"]) == list(want["n_hit_grams"])
    assert [bool(x) for x in got["contaminated"]] == [
        bool(x) for x in want["contaminated"]
    ]
    # both train docs overlap the eval doc's 8-grams
    by_id = dict(zip(got["doc_id"], got["contaminated"]))
    assert bool(by_id[1]) and bool(by_id[20]) and not bool(by_id[2])


def test_decontaminate_plan_broadcasts_eval_grams(spark):
    plan = CF.q_decontaminate(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


CODE_TEXT = (
    "def main(argv):\n"
    "  x = compute(argv[0]);\n"
    "  if x > 0:\n"
    "    return x\n"
    "  else:\n"
    "    return -x\n"
)
PROSE_TEXT = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the quiet field until the evening light fades away"
)


def test_code_detect_routes_crafted_fixtures(spark):
    """The routing rule fires on obvious code (dense punctuation +
    keywords + indented block) and stays off for plain prose; both
    engines produce identical signal rows on the same fixtures."""
    import duckdb

    from docling_core_spark.corpus import filters as CFI

    df = spark.createDataFrame(
        [(1, CODE_TEXT), (2, PROSE_TEXT)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in _code_detect_local(spark, df).collect()}
    assert out[1]["is_code"] is True
    assert out[2]["is_code"] is False
    assert out[1]["kw_hits"] >= 3
    assert out[1]["indent_ppm"] >= 300_000
    assert out[2]["sym_ppm"] < 20_000
    # DuckDB oracle on the same two rows
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.execute(
        "INSERT INTO documents VALUES (?, ?), (?, ?)",
        [1, CODE_TEXT, 2, PROSE_TEXT],
    )
    orc = {r[0]: r for r in con.execute(CFI.sql_code_detect()).fetchall()}
    eng = {k: tuple(v) for k, v in out.items()}
    assert eng[1] == orc[1] and eng[2] == orc[2]
    con.close()


def _code_detect_local(spark, docs):
    """Run q_code_detect's expression body over a local docs frame
    (bypasses read_spread, same expressions)."""
    from unittest import mock

    from docling_core_spark.corpus import filters as CFI

    with mock.patch.object(
        CFI, "read_spread", lambda _s, _d, _t: docs
    ):
        return CFI.q_code_detect(spark, "unused")


def test_badwords_filter_crafted_semantics(spark):
    """C4 blocklist semantics on crafted docs: unigram hits, word-level
    phrase counting (incl. back-to-back phrases, which substring
    replace-counting would undercount), single-token guard, and the
    drop-on-any-hit decision — identical rows from both engines."""
    docs = [
        (1, "clean text only here"),          # keep
        (2, "a dup and another dup here"),    # 2 token hits, 1 term
        (3, "try hash join now"),             # 1 phrase hit
        (4, "hash join hash join"),           # 2 phrase hits
        (5, "hash hash join"),                # 1 phrase hit
        (6, "dup"),                           # single-token doc, hit
        (7, "crash dup crash"),               # both terms
        (8, "join hash"),                     # reversed: no phrase
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    df.createOrReplaceTempView("documents")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {
            r["doc_id"]: (
                r["n_token_hits"], r["n_terms_hit"],
                r["n_phrase_hits"], r["keep"],
            )
            for r in CF.q_badwords_filter(spark, td).collect()
        }
    assert out[1] == (0, 0, 0, True)
    assert out[2] == (2, 1, 0, False)
    assert out[3] == (0, 0, 1, False)
    assert out[4] == (0, 0, 2, False)
    assert out[5] == (0, 0, 1, False)
    assert out[6] == (1, 1, 0, False)
    assert out[7] == (3, 2, 0, False)
    assert out[8] == (0, 0, 0, True)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id INT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", docs
    )
    orc = {
        r[0]: tuple(r[1:])
        for r in con.execute(CF.sql_badwords_filter()).fetchall()
    }
    assert {k: tuple(map(lambda x: x, v)) for k, v in orc.items()} == {
        k: (int(a), int(b), int(c), d) for k, (a, b, c, d) in out.items()
    }
