"""Deterministic sampling operators: a balanced per-(source, lang)
stratified sample and a token-weighted priority sample — both selected
by hash order so the samples are reproducible across runs, engines,
and cluster sizes (no RNG state).

Scale design (the part that matters at 100 TB): a naive "row_number
per stratum, keep <= K" window ranks EVERY row of every stratum — a
mega-stratum with 10^10 docs single-tasks its whole partition. Instead:

1. one tiny agg computes stratum sizes (as many rows as strata);
2. it is BROADCAST back onto the corpus;
3. a map-side hash prefilter keeps only rows whose 30-bit doc hash
   falls under ``ceil(K * SAFETY * H30_MOD / n_stratum)`` — an expected
   K*SAFETY survivors per stratum, integer math, engine-exact;
4. the top-K-by-hash window then runs on the tiny survivor set only.

The oracle applies the IDENTICAL prefilter, so both engines agree
bit-for-bit even in the (astronomically unlikely at SAFETY=8) case the
prefilter under-selects a stratum. Strata smaller than K pass through
whole.

Reference analog: none — training-data extension surface (SURVEY.md §2
addendum; dev-scale corpus carving, eval splits, per-source caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import constants as C, read_spread
from .textstats import TOKENS_DUCK, _h30_duck, _h30_spark

# K is a job parameter; 3 keeps the gate corpus' ~5-doc strata actually
# selecting (a production carve would use thousands per stratum).
SAMPLE_K = 3
SAMPLE_SAFETY = 8  # prefilter over-selection factor


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang",
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    )
    sizes = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_stratum")
    )
    bound = (
        f"least(cast({C.H30_MOD} as bigint),"
        f" cast(ceil({SAMPLE_K} * {SAMPLE_SAFETY} * cast({C.H30_MOD} as"
        f" bigint) / n_stratum) as bigint))"
    )
    pre = docs.join(F.broadcast(sizes), ["source", "lang"]).where(
        F.expr(f"h < {bound}")
    )
    w = Window.partitionBy("source", "lang").orderBy(
        F.asc("h"), F.asc("doc_id")
    )
    return (
        pre.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("source", "lang", "rk", "doc_id", "n_stratum")
    )


def sql_stratified_sample() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    bound = (
        f"least({C.H30_MOD}::BIGINT,"
        f" ceil({SAMPLE_K} * {SAMPLE_SAFETY} * {C.H30_MOD}::BIGINT"
        f" / n_stratum)::BIGINT)"
    )
    return f"""
        WITH hashed AS (
            SELECT doc_id, source, lang, {h} AS h FROM documents
        ),
        sizes AS (
            SELECT source, lang, COUNT(*)::BIGINT AS n_stratum
            FROM documents GROUP BY source, lang
        ),
        pre AS (
            SELECT hashed.*, sizes.n_stratum
            FROM hashed JOIN sizes USING (source, lang)
            WHERE h < {bound}
        ),
        ranked AS (
            SELECT source, lang, doc_id, n_stratum,
                   row_number() OVER (
                       PARTITION BY source, lang ORDER BY h ASC, doc_id ASC
                   )::BIGINT AS rk
            FROM pre
        )
        SELECT source, lang, rk, doc_id, n_stratum
        FROM ranked WHERE rk <= {SAMPLE_K}
    """


# ---------------------------------------------------------------------------
# weighted (priority) sampling
# ---------------------------------------------------------------------------

# Priority sampling (Duffield/Lund/Thorup 2007): priority = u / w with
# u uniform; the K smallest priorities form a weight-proportional
# sample without replacement. u is the deterministic 30-bit doc hash,
# w the token count — heavier documents get proportionally more chance,
# and the sample is reproducible across runs, engines, cluster sizes.
WEIGHTED_K = 100


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted deterministic sample of WEIGHTED_K documents.

    100 TB story: priority is a narrow per-row expression; the global
    bottom-K is a TakeOrderedAndProject (distributed top-k, never a
    single-partition sort); the rank window runs on the K-row cut
    only. The priority double is a SINGLE division of two exact
    integers — identical bit pattern in both engines, no accumulation."""
    from pyspark.sql import Window

    from .textstats import TOKENS_SPARK

    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("n_tokens"),
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    ).where("n_tokens > 0")
    pri = "h / cast(n_tokens as double)"
    top = (
        docs.select(
            "doc_id", "n_tokens", F.expr(pri).alias("priority")
        )
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
    )
    w = Window.orderBy(F.asc("priority"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rk"),
        "doc_id",
        "n_tokens",
        F.expr("round(priority, 6)").alias("priority"),
    )


def sql_weighted_sample() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len({TOKENS_DUCK})::BIGINT AS n_tokens,
                   {h} AS h
            FROM documents
        ),
        pri AS (
            SELECT doc_id, n_tokens,
                   h / n_tokens::DOUBLE AS priority
            FROM base WHERE n_tokens > 0
        ),
        top AS (
            SELECT * FROM pri
            ORDER BY priority ASC, doc_id ASC LIMIT {WEIGHTED_K}
        )
        SELECT row_number() OVER (
                   ORDER BY priority ASC, doc_id ASC
               )::BIGINT AS rk,
               doc_id, n_tokens, round(priority, 6) AS priority
        FROM top
        ORDER BY rk
    """


# ---------------------------------------------------------------------------
# mixture rebalancing weights (uniform-target importance weights)
# ---------------------------------------------------------------------------

def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) stratum: token mass, observed corpus share,
    the uniform target share, and the importance weight
    target/observed a mixture-rebalanced sampler would apply (the
    static-weights step of data-mixing recipes — The Pile's per-set
    epochs, DoReMi's reweighted sampling; here the target is uniform
    over the observed strata). All shares/weights are exact
    micro-unit BIGINTs (integer floor division), so both engines agree
    bit-for-bit with no float summation anywhere.

    100 TB story: one map-side-combinable agg whose key space is the
    stratum count (dozens), then arithmetic on that tiny table against
    a broadcast one-row total — the corpus is scanned exactly once,
    pruned to (source, lang, text). BIGINT headroom: tokens*10^6 must
    stay < 2^63, i.e. total corpus tokens < ~9.2*10^12; past that a
    production run right-shifts both numerator and denominator by a
    common factor (tokens div 2^10) before the share division — same
    micro precision, the fixture-scale gate keeps the unshifted form
    because the shift floors tiny strata to 0."""
    from .textstats import TOKENS_SPARK

    docs = read_spread(spark, sf_dir, "documents")
    strata = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(f"cast(sum(size({TOKENS_SPARK})) as bigint)").alias(
            "tokens"
        ),
    )
    totals = strata.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("n_strata"),
    )
    return (
        strata.crossJoin(F.broadcast(totals))
        .select(
            "source", "lang", "n_docs", "tokens",
            F.expr(
                "cast(tokens * 1000000 div total_tokens as bigint)"
            ).alias("observed_micro"),
            F.expr(
                "cast(1000000 div n_strata as bigint)"
            ).alias("target_micro"),
            # Guard: a stratum under 1ppm of corpus token mass floors
            # observed_micro to 0; ANSI Spark would raise
            # DIVIDE_BY_ZERO while DuckDB yields NULL — emit NULL in
            # BOTH dialects so degenerate inputs neither crash nor
            # diverge.
            F.expr(
                "cast(case when tokens * 1000000 div total_tokens = 0"
                " then null"
                " else (1000000 div n_strata) * 1000000"
                " div (tokens * 1000000 div total_tokens) end"
                " as bigint)"
            ).alias("weight_micro"),
        )
    )


def sql_mixture_weights() -> str:
    return f"""
        WITH strata AS (
            SELECT source, lang,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(len({TOKENS_DUCK}))::BIGINT AS tokens
            FROM documents
            GROUP BY source, lang
        ),
        totals AS (
            SELECT SUM(tokens)::BIGINT AS total_tokens,
                   COUNT(*)::BIGINT AS n_strata
            FROM strata
        )
        SELECT source, lang, n_docs, tokens,
               (tokens * 1000000 // total_tokens)::BIGINT
                   AS observed_micro,
               (1000000 // n_strata)::BIGINT AS target_micro,
               (CASE WHEN tokens * 1000000 // total_tokens = 0
                     THEN NULL
                     ELSE (1000000 // n_strata) * 1000000
                          // (tokens * 1000000 // total_tokens)
                END)::BIGINT
                   AS weight_micro
        FROM strata CROSS JOIN totals
    """
