"""BM25 ranked retrieval over the corpus (Robertson & Sparck Jones;
the Okapi BM25 formula in its Lucene form) — the retrieval half of a
training-data pipeline: eval-query search, RAG indexing diagnostics,
and the relevance scorer data-selection recipes rank by.

``bm25_topk`` returns the top-K documents per query for a fixed query
set. The score is the standard

    sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))    (Lucene's form,
                                                     always positive)

Cross-engine float discipline (the lm_score rule): each (doc, term)
partial score is computed with the IDENTICAL left-to-right double
expression in both dialects, floored to micro units, and summed as
integers — aggregation order cannot move the result.

100 TB story: the gram stream is cut to query-vocabulary terms by a
broadcast hash semi-join BEFORE any shuffle (the scan's whole token
stream never exchanges); df/tf aggregate on uniform (term) / (doc_id,
term) keys; the per-query top-K runs as a SALTED two-level cut — a
window over (query_id, salt) keeps K per salt, then the final window
sees only K x SALTS rows per query — so a query matching 10^10
documents still never concentrates one partition (the DuckDB oracle
computes the single-level top-K; the gate proves the two-level cut is
algebraically identical given the deterministic tie-break).

Reference analog: none (SURVEY.md §2.8); tfidf_topk is the per-doc
keyword variant, this is cross-doc retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
BM25_SALTS = 16

# fixed query set (terms chosen from the synthetic corpus vocabulary)
BM25_QUERIES = [
    ("q_hash_join", ["hash", "join"]),
    ("q_window_sort", ["window", "sort"]),
    ("q_vector_query", ["vector", "query"]),
    ("q_stream_batch_dup", ["stream", "batch", "dup"]),
]


def _score_micro(duck: bool) -> str:
    """Per-(doc, term) BM25 partial in micro units. `tf`, `df`, `dl`
    BIGINT; `n_docs`, `avgdl` from the broadcast scalar row. The float
    expression is written ONCE here and rendered per dialect with
    identical operator order."""
    # explicit double casts on the Spark side: bare `bigint + 0.5`
    # parses the literal as DECIMAL in Spark SQL and the high-precision
    # decimal quotient can round differently from DuckDB's doubles
    def d(col: str) -> str:
        return col if duck else f"cast({col} as double)"

    idf = f"ln(1 + ({d('n_docs')} - {d('df')} + 0.5) / ({d('df')} + 0.5))"
    dl = f"({d('dl')} / avgdl)"
    denom = f"({d('tf')} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * {dl}))"
    expr = f"{idf} * {d('tf')} * ({BM25_K1} + 1) / {denom}"
    if duck:
        return f"floor(({expr}) * 1000000)::BIGINT"
    return f"cast(floor(({expr}) * 1000000) as bigint)"


def _query_rows() -> list[tuple[str, str]]:
    return [(qid, t) for qid, terms in BM25_QUERIES for t in terms]


def _retrieval_base(spark: SparkSession, sf_dir: str) -> dict:
    """ONE shared set of retrieval tables for every lexical ranker —
    the query-vocab broadcast semi-join cut of the token stream, the
    tf/df/ctf aggregates and the corpus scalars are defined exactly
    once, so bm25_topk and rrf_fusion cannot drift. Doc lengths +
    scalars come from the full stream; the expensive per-term work
    only from the query-vocab subset."""
    docs = read_spread(spark, sf_dir, "documents")
    qterms = spark.createDataFrame(_query_rows(), ["query_id", "term"])
    terms = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("term")
    )
    dls = docs.select(
        "doc_id", F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("dl")
    )
    scalars = dls.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr("sum(dl) / cast(count(*) as double)").alias("avgdl"),
        F.sum("dl").cast("bigint").alias("total_toks"),
    )
    vocab = qterms.select("term").distinct()
    hits = terms.join(F.broadcast(vocab), "term")
    tf = hits.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    ctf_t = hits.groupBy("term").agg(
        F.count("*").cast("bigint").alias("ctf")
    )
    return {"qterms": qterms, "dls": dls, "scalars": scalars,
            "tf": tf, "df_t": df_t, "ctf_t": ctf_t}


def _bm25_per_query(base: dict) -> DataFrame:
    """Per-(query, doc) BM25 score_micro + n_terms_hit from the shared
    base — the single definition both bm25_topk and rrf_fusion rank."""
    scored = (
        base["tf"].join(F.broadcast(base["df_t"]), "term")
        .join(base["dls"], "doc_id")
        .crossJoin(F.broadcast(base["scalars"]))
        .select("doc_id", "term", F.expr(_score_micro(False)).alias("s"))
    )
    return (
        scored.join(F.broadcast(base["qterms"]), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("s").cast("bigint").alias("score_micro"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_query = _bm25_per_query(_retrieval_base(spark, sf_dir))
    # salted two-level top-K (see module docstring)
    return _salted_topk(per_query, BM25_TOPK).select(
        "query_id",
        "rk",
        "doc_id",
        "n_terms_hit",
        F.expr("round(score_micro / cast(1000000 as double), 6)").alias(
            "score"
        ),
    )


def sql_bm25_topk() -> str:
    qrows = ", ".join(f"('{q}', '{t}')" for q, t in _query_rows())
    return f"""
        WITH qterms(query_id, term) AS (VALUES {qrows}),
        dls AS (
            SELECT doc_id, len({TOKENS_DUCK})::BIGINT AS dl
            FROM documents
        ),
        scalars AS (
            SELECT COUNT(*)::BIGINT AS n_docs,
                   SUM(dl) / COUNT(*)::DOUBLE AS avgdl
            FROM dls
        ),
        terms AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS term FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*)::BIGINT AS tf
            FROM terms
            WHERE term IN (SELECT DISTINCT term FROM qterms)
            GROUP BY doc_id, term
        ),
        dfs AS (
            SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
        ),
        scored AS (
            SELECT doc_id, term, {_score_micro(True)} AS s
            FROM tf JOIN dfs USING (term)
            JOIN dls USING (doc_id)
            CROSS JOIN scalars
        ),
        per_query AS (
            SELECT query_id, doc_id,
                   SUM(s)::BIGINT AS score_micro,
                   COUNT(*)::BIGINT AS n_terms_hit
            FROM scored JOIN qterms USING (term)
            GROUP BY query_id, doc_id
        ),
        ranked AS (
            SELECT query_id, doc_id, n_terms_hit, score_micro,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score_micro DESC, doc_id ASC
                   )::BIGINT AS rk
            FROM per_query
        )
        SELECT query_id, rk, doc_id, n_terms_hit,
               round(score_micro / 1000000.0, 6) AS score
        FROM ranked WHERE rk <= {BM25_TOPK}
    """


# ---------------------------------------------------------------------------
# RRF hybrid fusion: BM25 + Dirichlet query-likelihood
# ---------------------------------------------------------------------------

# Dirichlet smoothing mass (Zhai & Lafferty, SIGIR'01 — the standard
# LM-retrieval second ranker every hybrid-search stack fuses with BM25)
QL_MU = 2000.0
# Cormack/Clarke/Buettcher SIGIR'09 reciprocal-rank-fusion constant
RRF_KCONST = 60
RRF_TOPK = 10


def _ql_term_micro(duck: bool) -> str:
    """Per-(query, doc, term) Dirichlet QL partial in micro units:
    ln((tf0 + MU * ctf / total_toks) / (dl + MU)). tf0/ctf/dl/total_toks
    are BIGINT; the double expression is written once and rendered per
    dialect with identical operator order (the lm_score / bm25 rule)."""
    def d(col: str) -> str:
        return col if duck else f"cast({col} as double)"

    expr = (
        f"ln(({d('tf0')} + {QL_MU} * {d('ctf')} / {d('total_toks')})"
        f" / ({d('dl')} + {QL_MU}))"
    )
    if duck:
        return f"floor(({expr}) * 1000000)::BIGINT"
    return f"cast(floor(({expr}) * 1000000) as bigint)"


def _rrf_contrib(rank_col: str, duck: bool) -> str:
    """floor(1e6 / (K + rank)) as BIGINT — integer RRF contribution,
    NULL-safe (a doc absent from one ranker's top-K contributes 0)."""
    if duck:
        return (
            f"COALESCE(floor(1000000.0 / ({RRF_KCONST} + {rank_col}))"
            f"::BIGINT, 0)"
        )
    return (
        f"coalesce(cast(floor(1000000.0 / ({RRF_KCONST} + {rank_col}))"
        f" as bigint), 0)"
    )


def _salted_topk(df: DataFrame, k: int) -> DataFrame:
    """Salted two-level per-query top-K cut over a (query_id, doc_id,
    score_micro) table — same shape as bm25_topk's (see module
    docstring): K per (query, salt) first, so the final window sees
    only K x SALTS rows per query. Adds `rk`."""
    salted = df.withColumn(
        "salt", F.expr(f"cast(doc_id % {BM25_SALTS} as int)")
    )
    w1 = Window.partitionBy("query_id", "salt").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        salted.withColumn("r1", F.row_number().over(w1))
        .where(f"r1 <= {k}")
        .withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .where(f"rk <= {k}")
    )


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 top-K and the Dirichlet
    query-likelihood top-K per query with reciprocal-rank fusion
    (rrf = sum over rankers of 1/(60 + rank), Cormack et al. 2009),
    returning the fused top-{RRF_TOPK} with each ranker's rank.

    100 TB story: both rankers share one query-vocab broadcast
    semi-join cut of the token stream (the full stream never
    exchanges); tf/df/ctf aggregate on uniform (doc, term)/(term)
    keys; each ranker's top-K runs the salted two-level cut, so the
    fusion join and the final window operate on <= K x |queries| rows
    regardless of corpus size. A second retrieval signal costs one
    more pass over the ALREADY-CUT hit table, not over the corpus.

    Reference analog: none (SURVEY.md §2.8) — this is the hybrid
    lexical-fusion step of an eval-retrieval / RAG-diagnostics stack.
    """
    base = _retrieval_base(spark, sf_dir)
    qterms, tf, dls = base["qterms"], base["tf"], base["dls"]
    scalars, ctf_t = base["scalars"], base["ctf_t"]

    # --- ranker 1: BM25 (the SAME per-query builder bm25_topk ranks) --
    bm_top = _salted_topk(_bm25_per_query(base), BM25_TOPK).select(
        "query_id", "doc_id", F.col("rk").alias("bm25_rank")
    )

    # --- ranker 2: Dirichlet QL --------------------------------------
    # candidates: docs hitting >= 1 query term; every candidate is
    # scored against ALL of its query's terms (tf0 = 0 smoothing arm)
    cand = (
        tf.join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id").distinct()
    )
    ql_terms = (
        cand.join(F.broadcast(qterms), "query_id")
        .join(tf, ["doc_id", "term"], "left")
        .select(
            "query_id", "doc_id", "term",
            F.coalesce("tf", F.lit(0)).cast("bigint").alias("tf0"),
        )
        .join(F.broadcast(ctf_t), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "query_id", "doc_id",
            F.expr(_ql_term_micro(False)).alias("s"),
        )
    )
    ql_pq = ql_terms.groupBy("query_id", "doc_id").agg(
        F.sum("s").cast("bigint").alias("score_micro")
    )
    ql_top = _salted_topk(ql_pq, BM25_TOPK).select(
        "query_id", "doc_id", F.col("rk").alias("ql_rank")
    )

    # --- fusion (<= 2K rows per query) --------------------------------
    fused = (
        bm_top.join(ql_top, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id", "doc_id", "bm25_rank", "ql_rank",
            (
                F.expr(_rrf_contrib("bm25_rank", False))
                + F.expr(_rrf_contrib("ql_rank", False))
            ).alias("rrf_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(f"rk <= {RRF_TOPK}")
        .select("query_id", "rk", "doc_id", "bm25_rank", "ql_rank",
                "rrf_micro")
    )


def sql_rrf_fusion() -> str:
    qrows = ", ".join(f"('{q}', '{t}')" for q, t in _query_rows())
    return f"""
        WITH qterms(query_id, term) AS (VALUES {qrows}),
        dls AS (
            SELECT doc_id, len({TOKENS_DUCK})::BIGINT AS dl
            FROM documents
        ),
        scalars AS (
            SELECT COUNT(*)::BIGINT AS n_docs,
                   SUM(dl) / COUNT(*)::DOUBLE AS avgdl,
                   SUM(dl)::BIGINT AS total_toks
            FROM dls
        ),
        terms AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS term FROM documents
        ),
        hits AS (
            SELECT doc_id, term FROM terms
            WHERE term IN (SELECT DISTINCT term FROM qterms)
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*)::BIGINT AS tf
            FROM hits GROUP BY doc_id, term
        ),
        dfs AS (
            SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
        ),
        ctfs AS (
            SELECT term, COUNT(*)::BIGINT AS ctf FROM hits GROUP BY term
        ),
        bm_scored AS (
            SELECT doc_id, term, {_score_micro(True)} AS s
            FROM tf JOIN dfs USING (term)
            JOIN dls USING (doc_id)
            CROSS JOIN scalars
        ),
        bm_pq AS (
            SELECT query_id, doc_id, SUM(s)::BIGINT AS score_micro
            FROM bm_scored JOIN qterms USING (term)
            GROUP BY query_id, doc_id
        ),
        bm_top AS (
            SELECT query_id, doc_id, rk AS bm25_rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score_micro DESC, doc_id ASC
                       )::BIGINT AS rk
                FROM bm_pq
            ) WHERE rk <= {BM25_TOPK}
        ),
        cand AS (
            SELECT DISTINCT query_id, doc_id
            FROM tf JOIN qterms USING (term)
        ),
        ql_terms AS (
            SELECT c.query_id, c.doc_id,
                   COALESCE(tf.tf, 0)::BIGINT AS tf0,
                   ct.ctf, dls.dl, s.total_toks
            FROM cand c
            JOIN qterms q USING (query_id)
            LEFT JOIN tf ON tf.doc_id = c.doc_id AND tf.term = q.term
            JOIN ctfs ct ON ct.term = q.term
            JOIN dls ON dls.doc_id = c.doc_id
            CROSS JOIN scalars s
        ),
        ql_pq AS (
            SELECT query_id, doc_id,
                   SUM({_ql_term_micro(True)})::BIGINT AS score_micro
            FROM ql_terms GROUP BY query_id, doc_id
        ),
        ql_top AS (
            SELECT query_id, doc_id, rk AS ql_rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score_micro DESC, doc_id ASC
                       )::BIGINT AS rk
                FROM ql_pq
            ) WHERE rk <= {BM25_TOPK}
        ),
        fused AS (
            SELECT COALESCE(b.query_id, q.query_id) AS query_id,
                   COALESCE(b.doc_id, q.doc_id) AS doc_id,
                   b.bm25_rank, q.ql_rank,
                   {_rrf_contrib('b.bm25_rank', True)}
                   + {_rrf_contrib('q.ql_rank', True)} AS rrf_micro
            FROM bm_top b
            FULL OUTER JOIN ql_top q
              ON b.query_id = q.query_id AND b.doc_id = q.doc_id
        )
        SELECT query_id, rk, doc_id, bm25_rank, ql_rank, rrf_micro
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY rrf_micro DESC, doc_id ASC
            )::BIGINT AS rk
            FROM fused
        ) WHERE rk <= {RRF_TOPK}
    """
