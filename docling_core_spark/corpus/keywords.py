"""Corpus keyword operators: corpus-wide top n-grams and per-document
TF-IDF keyword extraction.

Both are classic training-data diagnostics (what boilerplate phrases
dominate the corpus? what is each document about?) expressed as pure
DataFrame aggregations with DuckDB oracles built from the same
constants.

Cross-engine float discipline (tfidf score): the idf division is exact
IEEE ((N+1)/(df+1), identical left-to-right order in both engines), ln
is 1-ulp libm in both, and the result is rounded to 6dp BEFORE both
output and ordering, with a lexical term tie-break, so Spark and DuckDB
produce identical rows and identical top-k cuts.

Reference analog: none (docling-core has no corpus analytics) — this is
the SURVEY.md §2 training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK

TOP_NGRAMS_N = 2       # bigrams
TOP_NGRAMS_K = 100     # corpus-wide top-k
TFIDF_TOPK = 5         # keywords per document


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-100 bigrams by occurrence count (doc frequency
    carried along), deterministic (count desc, gram asc) order.

    100 TB story: one map-side-combined groupBy on the uniform gram key
    (the only wide exchange — distinct-bigram cardinality, not corpus
    size), then a TakeOrdered top-k; the 100-row rank window runs on the
    already-cut result, never on the full aggregate."""
    n = TOP_NGRAMS_N
    docs = read_spread(spark, sf_dir, "documents")
    # project toks ONCE: a tokenizer referenced inside the transform
    # lambda would re-split the whole document per gram position
    toks = docs.select(
        "doc_id", F.expr(TOKENS_SPARK).alias("toks")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"case when size(toks) >= {n} then"
                f" transform(sequence(1, size(toks) - {n - 1}),"
                f"   i -> concat_ws(' ', slice(toks, i, {n})))"
                f" else array() end"
            )
        ).alias("gram"),
    )
    agg = grams.groupBy("gram").agg(
        F.count("*").cast("bigint").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    top = agg.orderBy(
        F.desc("n_occurrences"), F.asc("gram")
    ).limit(TOP_NGRAMS_K)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("gram"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "gram",
        "n_occurrences",
        "n_docs",
    )


def sql_top_ngrams() -> str:
    n = TOP_NGRAMS_N
    return f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        grams AS (
            SELECT doc_id, unnest(
                CASE WHEN len(toks) >= {n} THEN
                    list_transform(range(1, len(toks) - {n - 2}),
                        i -> array_to_string(toks[i:i + {n - 1}], ' '))
                ELSE [] END) AS gram
            FROM toks
        ),
        agg AS (
            SELECT gram,
                   COUNT(*)::BIGINT AS n_occurrences,
                   COUNT(DISTINCT doc_id)::BIGINT AS n_docs
            FROM grams GROUP BY gram
        )
        SELECT row_number() OVER (
                   ORDER BY n_occurrences DESC, gram ASC
               )::BIGINT AS rank,
               gram, n_occurrences, n_docs
        FROM agg
        ORDER BY n_occurrences DESC, gram ASC
        LIMIT {TOP_NGRAMS_K}
    """


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 keywords by TF-IDF (smoothed idf =
    ln((N+1)/(df+1)), score = tf * idf rounded to 6dp).

    100 TB story: term-frequency groupBy on (doc_id, term) — uniform
    composite key; document-frequency groupBy on term (map-side
    combined; vocabulary-sized, not corpus-sized); the df table joins
    back on term (sort-merge at prod vocab scale); the final top-k is a
    per-doc window on uniform doc_id."""
    docs = read_spread(spark, sf_dir, "documents")
    # N joins in lazily as a broadcast 1-row aggregate (mirrors the
    # oracle's CROSS JOIN n CTE) — no eager count() job at plan time
    n_tbl = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    terms = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df_tbl = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    scored = tf.join(df_tbl, "term").crossJoin(
        F.broadcast(n_tbl)
    ).select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.expr(
            "round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6)"
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


def sql_tfidf_topk() -> str:
    return f"""
        WITH terms AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*)::BIGINT AS tf
            FROM terms GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)),
                         6) AS score
            FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        ranked AS (
            SELECT doc_id, term, tf, df, score,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY score DESC, term ASC
                   )::BIGINT AS rank
            FROM scored
        )
        SELECT doc_id, rank, term, tf, df, score
        FROM ranked WHERE rank <= {TFIDF_TOPK}
    """
