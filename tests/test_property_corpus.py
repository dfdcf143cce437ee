"""Property-based cross-engine fuzzing for the corpus operators: on
ARBITRARY documents tables (not just the driver's fixture shapes) every
SQL-oracled corpus operator must produce byte-identical results through
Spark and through its DuckDB oracle.

Hypothesis explores what the fixture corpus can't: single-word and
whitespace-heavy texts, markup-hostile characters ('<', '&', quotes —
the page synthesiser embeds text raw, so both engines must degrade
IDENTICALLY even when the synthetic HTML goes malformed), doc_ids on
the decontamination eval residue, 12-digit doc_ids, tiny/empty strata,
and skewed token masses.
"""

import glob
import tempfile

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docling_core_spark.corpus import (
    dedup as CD,
    filters as CF,
    keywords as CK,
    lm as CL,
    packing as CP,
    sampling as CSA,
    webextract as CW,
)

_WORDS = st.sampled_from(
    ["the", "spark", "scan", "join", "batch", "zz", "a", "dup",
     "window", "merge", "<p>", "&amp;", "it's", 'say "hi"', "x|y"]
)
_TEXT = st.lists(_WORDS, min_size=1, max_size=30).map(" ".join)

_DOC_IDS = st.one_of(
    st.integers(0, 400),
    st.sampled_from([13, 110, 207, 123456789012]),  # eval residue + huge
)


@st.composite
def docs_table(draw):
    ids = draw(st.lists(_DOC_IDS, min_size=1, max_size=12, unique=True))
    rows = []
    for i in ids:
        text = draw(_TEXT)
        rows.append((
            i, text,
            draw(st.sampled_from(["en", "de", "fr"])),
            draw(st.sampled_from(["s0", "s1"])),
            len(text),
        ))
    return rows


# every SQL-oracled corpus op that reads ONLY the documents table and
# has no persisted-state memoization (those need session-stable input)
_OPS = [
    ("html_strip", CW.q_html_strip, CW.sql_html_strip, ["doc_id"]),
    ("main_content", CW.q_main_content, CW.sql_main_content, ["doc_id"]),
    ("extract_links", CW.q_extract_links, CW.sql_extract_links,
     ["doc_id", "ord"]),
    ("decontaminate", CF.q_decontaminate, CF.sql_decontaminate,
     ["doc_id"]),
    ("bloom_decontaminate", CF.q_bloom_decontaminate,
     CF.sql_bloom_decontaminate, ["doc_id"]),
    ("seg_dedup", CD.q_seg_dedup, CD.sql_seg_dedup, ["doc_id"]),
    ("top_ngrams", CK.q_top_ngrams, CK.sql_top_ngrams, ["rank"]),
    ("tfidf_topk", CK.q_tfidf_topk, CK.sql_tfidf_topk,
     ["doc_id", "rank"]),
    ("cms_heavy_hitters", CK.q_cms_heavy_hitters,
     CK.sql_cms_heavy_hitters, ["rank"]),
    ("kmv_distinct", CK.q_kmv_distinct, CK.sql_kmv_distinct,
     ["exact_distinct"]),
    ("lm_score", CL.q_lm_score, CL.sql_lm_score, ["doc_id"]),
    ("pack_sequences", CP.q_pack_sequences, CP.sql_pack_sequences,
     ["doc_id"]),
    ("stratified_sample", CSA.q_stratified_sample,
     CSA.sql_stratified_sample, ["source", "lang", "rk"]),
    ("mixture_weights", CSA.q_mixture_weights, CSA.sql_mixture_weights,
     ["source", "lang"]),
    ("weighted_sample", CSA.q_weighted_sample, CSA.sql_weighted_sample,
     ["rk"]),
]


def _fmt(x):
    return f"{x:.6g}" if isinstance(x, float) else str(x)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs_table())
def test_arbitrary_documents_tables_match_duckdb(spark, rows):
    with tempfile.TemporaryDirectory() as td:
        pq = f"{td}/documents.parquet"
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).coalesce(1).write.mode("overwrite").parquet(pq)
        part = glob.glob(pq + "/*.parquet")[0]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT *"
            f" FROM read_parquet('{part}')"
        )
        for name, qf, sqlf, sort_cols in _OPS:
            got = (qf(spark, td).toPandas()
                   .sort_values(sort_cols).reset_index(drop=True))
            want = (con.execute(sqlf()).df()
                    .sort_values(sort_cols).reset_index(drop=True))
            assert sorted(got.columns) == sorted(want.columns), name
            assert len(got) == len(want), (name, len(got), len(want))
            for c in sorted(got.columns):
                assert [_fmt(x) for x in got[c]] == [
                    _fmt(x) for x in want[c]
                ], (name, c, rows)
