"""Composed corpus-curation decision: the end-to-end "keep or drop"
query a training-data pipeline runs before materializing a corpus —
exact-dedup canonicalization (first doc_id per content hash), language
identification, and quality gating in ONE pass.

Scale shape: everything except the canonical-rank window is a narrow
per-row JVM expression over a pruned (doc_id, lang, text) scan; the
single shuffle partitions by the uniformly-distributed content hash
(md5), so there is no skew and the plan is one Exchange regardless of
corpus size. The language/quality fragments are the same expressions as
`textstats` (shared constants), so both dialects stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import constants as C, read_spread
from .textstats import (
    TOKENS_DUCK,
    TOKENS_SPARK,
    _lang_case,
    _sw_array_spark,
    _sw_array_sql,
)

CURATION_MIN_QUALITY = 0.5

_QUALITY_EXPR = (
    "round("
    " least(n_tokens / 64.0, 1.0) * 0.25"
    " + least(n_stopwords / cast(n_tokens as double) * 4.0, 1.0) * 0.25"
    " + (1.0 - n_digits / cast(n_chars as double)) * 0.25"
    " + (n_distinct / cast(n_tokens as double)) * 0.25, 6)"
)


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_decide(read_spread(spark, sf_dir, "documents"))


def curation_decide(docs: DataFrame) -> DataFrame:
    """The per-document curation decision over any documents-shaped
    DataFrame (doc_id, text): dedup canonical = min doc_id per exact
    content hash, quality gate, predicted language. Factored out of
    q_corpus_curation so jobs/curation_job.py can run it per content-
    hash shard (all copies of a text share a shard, so the per-shard
    decision equals the corpus-global one — asserted in
    tests/test_curation_job.py)."""
    from pyspark.sql.window import Window

    en_sw = _sw_array_spark("en")
    base = docs.select(
        "doc_id",
        F.md5(F.encode("text", "UTF-8")).alias("text_hash"),
        F.expr(f"size({TOKENS_SPARK})").alias("n_tokens"),
        *[
            F.expr(
                f"size(filter({TOKENS_SPARK},"
                f" t -> array_contains({_sw_array_spark(lang)}, t)))"
            ).alias(f"s_{lang}")
            for lang in C.LANGS
        ],
        F.expr("length(regexp_replace(text, '[^0-9]', ''))").alias(
            "n_digits"
        ),
        F.expr(
            f"size(filter({TOKENS_SPARK},"
            f" t -> array_contains({en_sw}, t)))"
        ).alias("n_stopwords"),
        F.expr(f"size(array_distinct({TOKENS_SPARK}))").alias("n_distinct"),
        F.length("text").alias("n_chars"),
    )
    case = _lang_case(lambda lg: f"s_{lg}")
    scored = base.select(
        "doc_id",
        "text_hash",
        F.expr(case).alias("pred_lang"),
        F.expr(_QUALITY_EXPR).alias("quality_score"),
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    ranked = scored.withColumn("canon_rank", F.row_number().over(w))
    return ranked.select(
        "doc_id",
        "pred_lang",
        "quality_score",
        (F.col("canon_rank") == 1).alias("is_canonical"),
        (
            (F.col("canon_rank") == 1)
            & (F.col("quality_score") >= F.lit(CURATION_MIN_QUALITY))
        ).alias("keep"),
    )


def sql_corpus_curation() -> str:
    score_exprs = ",\n               ".join(
        f"len(list_filter({TOKENS_DUCK},"
        f" t -> list_contains({_sw_array_sql(lang)}, t))) AS s_{lang}"
        for lang in C.LANGS
    )
    case = _lang_case(lambda lg: f"s_{lg}")
    en_sw = _sw_array_sql("en")
    return f"""
        WITH base AS (
            SELECT doc_id, md5(text) AS text_hash,
               len({TOKENS_DUCK}) AS n_tokens,
               {score_exprs},
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
               len(list_filter({TOKENS_DUCK},
                   t -> list_contains({en_sw}, t))) AS n_stopwords,
               len(list_distinct({TOKENS_DUCK})) AS n_distinct,
               length(text) AS n_chars
            FROM documents
        ),
        scored AS (
            SELECT doc_id, text_hash, {case} AS pred_lang,
                   {_QUALITY_EXPR} AS quality_score
            FROM base
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY text_hash ORDER BY doc_id
            ) AS canon_rank FROM scored
        )
        SELECT doc_id, pred_lang, quality_score,
               canon_rank = 1 AS is_canonical,
               (canon_rank = 1
                AND quality_score >= {CURATION_MIN_QUALITY}) AS keep
        FROM ranked
    """


# ---------------------------------------------------------------------------
# curation funnel: the composed end-to-end keep/drop report
# ---------------------------------------------------------------------------

def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row cumulative funnel across the full curation chain —
    quality scoring -> benchmark decontamination -> near-dup
    canonicalization — the report a 100 TB curation run emits to show
    how much corpus each stage dropped and what token mass survives.
    (The quality stage is the corpus-calibrated score; the Gopher rule
    ladder is gate-verified separately as `gopher_quality`, whose
    50-word floor is inapplicable to this short-text fixture corpus.)

    Composition, not re-implementation: each stage IS the corresponding
    gate-verified operator (q_corpus_curation's quality score,
    filters.q_decontaminate, dedup.q_dedup_clusters), joined on uniform
    doc_id and collapsed by one global partial-aggregated agg. Eval
    docs (absent from the decontaminate output) count as dropped at the
    decontamination stage — they are held out of training by
    definition. The DuckDB oracle chains the same three oracle SQL
    bodies as CTEs, so both engines compose identically."""
    from .dedup import q_dedup_clusters
    from .filters import q_decontaminate

    base = read_spread(spark, sf_dir, "documents").select(
        "doc_id", F.expr(f"size({TOKENS_SPARK})").alias("n_words")
    )
    cur = q_corpus_curation(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    dec = q_decontaminate(spark, sf_dir).select("doc_id", "contaminated")
    cl = q_dedup_clusters(spark, sf_dir).select("doc_id", "is_canonical")
    j = (base.join(cur, "doc_id", "left")
         .join(dec, "doc_id", "left")
         .join(cl, "doc_id", "left"))
    pass_q = f"quality_score >= {CURATION_MIN_QUALITY}"
    pass_d = f"{pass_q} AND contaminated = false"
    pass_c = f"{pass_d} AND is_canonical"
    return j.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(f"sum(case when {pass_q} then 1 else 0 end)")
        .cast("bigint").alias("n_pass_quality"),
        F.expr(f"sum(case when {pass_d} then 1 else 0 end)")
        .cast("bigint").alias("n_pass_decontam"),
        F.expr(f"sum(case when {pass_c} then 1 else 0 end)")
        .cast("bigint").alias("n_final"),
        F.expr(f"sum(case when {pass_c} then n_words else 0 end)")
        .cast("bigint").alias("tokens_final"),
        F.sum("n_words").cast("bigint").alias("tokens_total"),
    )


def sql_curation_funnel() -> str:
    from .dedup import sql_dedup_clusters
    from .filters import sql_decontaminate

    pass_q = f"quality_score >= {CURATION_MIN_QUALITY}"
    pass_d = f"{pass_q} AND contaminated = false"
    pass_c = f"{pass_d} AND is_canonical"
    return f"""
        WITH base AS (
            SELECT doc_id, len({TOKENS_DUCK})::BIGINT AS n_words
            FROM documents
        ),
        cur AS (
            SELECT doc_id, quality_score
            FROM ({sql_corpus_curation()})
        ),
        dec AS (
            SELECT doc_id, contaminated FROM ({sql_decontaminate()})
        ),
        cl AS (
            SELECT doc_id, is_canonical FROM ({sql_dedup_clusters()})
        )
        SELECT count(*)::BIGINT AS n_docs,
               sum(CASE WHEN {pass_q} THEN 1 ELSE 0 END)::BIGINT
                   AS n_pass_quality,
               sum(CASE WHEN {pass_d} THEN 1 ELSE 0 END)::BIGINT
                   AS n_pass_decontam,
               sum(CASE WHEN {pass_c} THEN 1 ELSE 0 END)::BIGINT
                   AS n_final,
               sum(CASE WHEN {pass_c} THEN n_words ELSE 0 END)::BIGINT
                   AS tokens_final,
               sum(n_words)::BIGINT AS tokens_total
        FROM base
        LEFT JOIN cur USING (doc_id)
        LEFT JOIN dec USING (doc_id)
        LEFT JOIN cl USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Quality-score calibration against the near-dup ground truth
# ---------------------------------------------------------------------------

CALIB_BANDS = 10
_CALIB_STEP = 1_000_000 // CALIB_BANDS


def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the quality score predict redundancy? Per fixed quality
    band (10 bands of q_micro), the share of documents that are
    NON-CANONICAL members of a near-dup cluster (doc_id != cluster_id
    under the min-label convention). A well-behaved corpus shows dup
    mass concentrating in the low bands — if it doesn't, the quality
    filter and the dedup stage are pruning independent populations and
    the curation funnel's stage order is costing extra compute.

    100 TB story: rides the memoized cluster table (dedup machinery)
    and the zero-shuffle quality expressions; the join is on uniform
    doc_id; the rollup key is a 10-value band — map-side combined,
    output 10 rows."""
    from .dedup import q_dedup_clusters
    from .textstats import q_quality

    q = q_quality(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "cast(floor(quality_score * 1000000 + 0.5) as bigint)"
        ).alias("q_micro"),
    ).withColumn(
        "band",
        F.expr(
            f"least(cast({CALIB_BANDS - 1} as bigint),"
            f" q_micro div {_CALIB_STEP})"
        ),
    )
    cl = q_dedup_clusters(spark, sf_dir)
    return (
        q.join(cl, "doc_id")
        .groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(
                F.expr("cast(doc_id != cluster_id as bigint)")
            ).cast("bigint").alias("n_dup"),
        )
        .select(
            "band", "n_docs", "n_dup",
            F.expr(
                "cast(n_dup * 1000000 div n_docs as bigint)"
            ).alias("dup_ppm"),
        )
    )


def sql_quality_calibration() -> str:
    from .dedup import sql_dedup_clusters
    from .textstats import sql_quality

    return f"""
        WITH clusters AS ({sql_dedup_clusters()}),
        q AS (
            SELECT doc_id,
                   floor(quality_score * 1000000 + 0.5)::BIGINT
                       AS q_micro
            FROM ({sql_quality()})
        ),
        banded AS (
            SELECT q.doc_id,
                   least({CALIB_BANDS - 1},
                         q_micro // {_CALIB_STEP})::BIGINT AS band,
                   c.cluster_id
            FROM q JOIN clusters c USING (doc_id)
        )
        SELECT band,
               COUNT(*)::BIGINT AS n_docs,
               SUM((doc_id <> cluster_id)::BIGINT)::BIGINT AS n_dup,
               (SUM((doc_id <> cluster_id)::BIGINT) * 1000000
                // COUNT(*))::BIGINT AS dup_ppm
        FROM banded GROUP BY band
    """


# ---------------------------------------------------------------------------
# Quality-aware keeper election per near-dup cluster
# ---------------------------------------------------------------------------

def q_cluster_keeper_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical election: for every near-dup cluster with
    more than one member, elect the HIGHEST-QUALITY member (ties to the
    smallest doc_id) instead of the min-doc_id convention, and report
    the quality uplift that policy buys — the CCNet/RefinedWeb-style
    "keep the best copy" decision (Wenzek et al. 2020 keep the
    lowest-perplexity copy; here the corpus-calibrated quality score
    stands in for the LM). Quality is compared in exact micro integers
    (floor(q * 1e6 + 0.5)) so Spark and DuckDB elect identical keepers.

    100 TB story: NO window over cluster members (a boilerplate
    mega-cluster would make that partition the straggler) — argmax is
    two map-side-combinable groupBys on the uniform cluster_id key
    (max(q_micro), then min(doc_id) among members at the max) plus a
    cluster-count-sized join back; the baseline-quality lookup joins the
    cluster table to the quality table on unique doc_id = cluster_id.
    Rides the memoized cluster table, so an incremental run pays only
    the quality joins. Reference analog: none (SURVEY.md §2.8).
    """
    from .dedup import q_dedup_clusters
    from .textstats import q_quality

    q = q_quality(spark, sf_dir).select(
        "doc_id",
        F.expr(
            "cast(floor(quality_score * 1000000 + 0.5) as bigint)"
        ).alias("q_micro"),
    )
    cl = (
        q_dedup_clusters(spark, sf_dir)
        .where(F.col("cluster_size") > 1)
        .select("doc_id", "cluster_id", "cluster_size")
    )
    j = cl.join(q, "doc_id")
    m = j.groupBy("cluster_id", "cluster_size").agg(
        F.max("q_micro").alias("keeper_q_micro")
    )
    k = (
        j.join(m, "cluster_id")
        .where(F.col("q_micro") == F.col("keeper_q_micro"))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keeper_doc_id"))
    )
    return (
        m.join(k, "cluster_id")
        .join(
            q.select(
                F.col("doc_id").alias("cluster_id"),
                F.col("q_micro").alias("minid_q_micro"),
            ),
            "cluster_id",
        )
        .select(
            "cluster_id",
            "cluster_size",
            "keeper_doc_id",
            "keeper_q_micro",
            "minid_q_micro",
            (F.col("keeper_q_micro") - F.col("minid_q_micro"))
            .cast("bigint")
            .alias("uplift_micro"),
        )
    )


def sql_cluster_keeper_quality() -> str:
    from .dedup import sql_dedup_clusters
    from .textstats import sql_quality

    return f"""
        WITH clusters AS ({sql_dedup_clusters()}),
        q AS (
            SELECT doc_id,
                   floor(quality_score * 1000000 + 0.5)::BIGINT
                       AS q_micro
            FROM ({sql_quality()})
        ),
        cl AS (
            SELECT doc_id, cluster_id, cluster_size
            FROM clusters WHERE cluster_size > 1
        ),
        j AS (SELECT * FROM cl JOIN q USING (doc_id)),
        m AS (
            SELECT cluster_id, cluster_size,
                   MAX(q_micro) AS keeper_q_micro
            FROM j GROUP BY cluster_id, cluster_size
        ),
        k AS (
            SELECT j.cluster_id, MIN(j.doc_id) AS keeper_doc_id
            FROM j JOIN m ON j.cluster_id = m.cluster_id
                         AND j.q_micro = m.keeper_q_micro
            GROUP BY j.cluster_id
        )
        SELECT m.cluster_id, m.cluster_size, k.keeper_doc_id,
               m.keeper_q_micro, q2.q_micro AS minid_q_micro,
               (m.keeper_q_micro - q2.q_micro)::BIGINT AS uplift_micro
        FROM m
        JOIN k USING (cluster_id)
        JOIN q q2 ON q2.doc_id = m.cluster_id
    """


# ---------------------------------------------------------------------------
# Adaptive per-source quality threshold (bucketed quantile inversion)
# ---------------------------------------------------------------------------
# A fixed corpus-global quality cutoff (CURATION_MIN_QUALITY) is wrong
# for a mixed-source corpus: a cutoff that trims 5% of a clean source
# can erase a noisy-but-valuable one. The standard production recipe
# keeps quality RELATIVE per source — drop each source's bottom
# quartile — which needs a per-source quantile of the quality score.
# The exact per-group quantile would be a corpus-wide sort shuffle
# skewed by the biggest source; instead this uses the same bucketed
# cumulative-inversion shape as source_length_quantiles: integer
# q_micro -> fixed-width buckets -> per-(source, bucket) counts ->
# cumulative window over BUCKET rows (<= 1001 per source, never
# documents) -> threshold = the bucket upper bound where the
# cumulative count first reaches ceil(n * QA_DROP_PCT / 100). The
# keep rule (q_micro > threshold) is exact to one bucket width
# (0.001 quality); threshold-bucket ties drop deterministically.
#
# 100 TB story: two passes over the zero-shuffle quality expressions;
# one map-side-combined groupBy on (source, bucket); the threshold
# table is source-sized and broadcast back; final rollup is
# source-sized. No corpus-wide window anywhere.

QA_BUCKET_W = 1_000   # q_micro per bucket -> <= 1001 bucket rows/source
QA_DROP_PCT = 25      # drop the per-source bottom quartile


def q_adaptive_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive quality gate: threshold (micro units),
    kept/dropped counts, and kept ppm under the drop-bottom-quartile
    rule."""
    en_sw = _sw_array_spark("en")
    docs = read_spread(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        F.expr(f"size({TOKENS_SPARK})").alias("n_tokens"),
        F.expr("length(regexp_replace(text, '[^0-9]', ''))").alias(
            "n_digits"
        ),
        F.expr(
            f"size(filter({TOKENS_SPARK},"
            f" t -> array_contains({en_sw}, t)))"
        ).alias("n_stopwords"),
        F.expr(f"size(array_distinct({TOKENS_SPARK}))").alias("n_distinct"),
        F.length("text").alias("n_chars"),
    )
    perdoc = base.select(
        "source",
        F.expr(
            f"cast(floor({_QUALITY_EXPR} * 1000000 + 0.5) as bigint)"
        ).alias("q_micro"),
    ).withColumn("bucket", F.expr(f"q_micro div {QA_BUCKET_W}"))
    b = perdoc.groupBy("source", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("source")
    cum = b.select(
        "source", "bucket", "cnt",
        F.sum("cnt").over(w).cast("bigint").alias("cum"),
        F.sum("cnt").over(wt).cast("bigint").alias("total"),
    )
    thr = cum.groupBy("source").agg(
        F.max("total").cast("bigint").alias("n_docs"),
        F.min(
            F.expr(
                f"case when cum >= (total * {QA_DROP_PCT} + 99) div 100"
                f" then bucket * {QA_BUCKET_W} + {QA_BUCKET_W - 1} end"
            )
        ).cast("bigint").alias("thr_micro"),
    )
    return (
        perdoc.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").cast("bigint").alias("n_docs"),
            F.max("thr_micro").cast("bigint").alias("thr_micro"),
            F.sum(
                F.expr("cast(q_micro > thr_micro as bigint)")
            ).cast("bigint").alias("n_kept"),
            F.sum(
                F.expr("cast(q_micro <= thr_micro as bigint)")
            ).cast("bigint").alias("n_dropped"),
        )
        .select(
            "source", "n_docs", "thr_micro", "n_kept", "n_dropped",
            F.expr(
                "cast(n_kept * 1000000 div n_docs as bigint)"
            ).alias("kept_ppm"),
        )
    )


def sql_adaptive_quality() -> str:
    en_sw = _sw_array_sql("en")
    q_expr = (
        "round(least(n_tokens / 64.0, 1.0) * 0.25"
        " + least(n_stopwords / n_tokens::DOUBLE * 4.0, 1.0) * 0.25"
        " + (1.0 - n_digits / n_chars::DOUBLE) * 0.25"
        " + (n_distinct / n_tokens::DOUBLE) * 0.25, 6)"
    )
    return f"""
        WITH base AS (
            SELECT source,
                   len({TOKENS_DUCK}) AS n_tokens,
                   length(regexp_replace(text, '[^0-9]', '', 'g'))
                       AS n_digits,
                   len(list_filter({TOKENS_DUCK},
                       t -> list_contains({en_sw}, t))) AS n_stopwords,
                   len(list_distinct({TOKENS_DUCK})) AS n_distinct,
                   length(text) AS n_chars
            FROM documents
        ),
        perdoc AS (
            SELECT source,
                   floor({q_expr} * 1000000 + 0.5)::BIGINT AS q_micro,
                   (floor({q_expr} * 1000000 + 0.5)::BIGINT
                    // {QA_BUCKET_W}) AS bucket
            FROM base
        ),
        b AS (
            SELECT source, bucket, COUNT(*)::BIGINT AS cnt
            FROM perdoc GROUP BY source, bucket
        ),
        cum AS (
            SELECT source, bucket, cnt,
                   SUM(cnt) OVER (
                       PARTITION BY source ORDER BY bucket ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum,
                   SUM(cnt) OVER (PARTITION BY source)::BIGINT AS total
            FROM b
        ),
        thr AS (
            SELECT source,
                   MAX(total)::BIGINT AS n_docs,
                   MIN(CASE WHEN cum >= (total * {QA_DROP_PCT} + 99) // 100
                            THEN bucket * {QA_BUCKET_W} + {QA_BUCKET_W - 1}
                       END)::BIGINT AS thr_micro
            FROM cum GROUP BY source
        )
        SELECT p.source,
               MAX(t.n_docs)::BIGINT AS n_docs,
               MAX(t.thr_micro)::BIGINT AS thr_micro,
               SUM(CASE WHEN p.q_micro > t.thr_micro
                        THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               SUM(CASE WHEN p.q_micro <= t.thr_micro
                        THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
               (SUM(CASE WHEN p.q_micro > t.thr_micro THEN 1 ELSE 0 END)
                * 1000000 // MAX(t.n_docs))::BIGINT AS kept_ppm
        FROM perdoc p JOIN thr t USING (source)
        GROUP BY p.source
    """
