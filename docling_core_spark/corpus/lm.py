"""Language-model quality scoring (the CCNet recipe, unigram form):
score every document by its average token log-probability under a
model trained on the corpus itself, so off-distribution documents
(gibberish, boilerplate, wrong-language) surface at the tail.

CCNet (Wenzek et al. 2020) uses a KenLM 5-gram; the sandbox has no
KenLM, so the model here is the smoothed UNIGRAM LM — same training
pass (one vocabulary-sized aggregation), same scoring join, same
ranking semantics, with the n-gram order as the production upgrade
path.

Cross-engine float discipline (the part worth copying): a per-doc
SUM of double log-probs is summation-ORDER-dependent, and Spark and
DuckDB aggregate in different orders — so each token's log-prob is
integerised FIRST (floor(ln(p) * 1e6), micro-nats) and the engines sum
integers, which is order-independent and exact. The average converts
back to 6dp at the end.

100 TB story: training is one map-side-combined groupBy on the uniform
term key (vocabulary-sized output); scoring joins the probability
table back on term (sort-merge at prod vocab scale, broadcast when the
vocab is small) and aggregates per uniform doc_id. No floats cross an
exchange un-integerised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK

LM_SMOOTH_NUM = 1    # add-alpha smoothing: p = (c + 0.5) / (N + 0.5*V)
LM_SMOOTH_DEN = 2    # ... expressed as the exact rational 1/2


def _logp_spark_expr() -> str:
    """Smoothed unigram log-prob, integerised to micro-nats — the ONE
    definition of the scoring expression (lm_score + segment_ppl)."""
    return (
        f"cast(floor(ln((c + {LM_SMOOTH_NUM} / cast({LM_SMOOTH_DEN} as"
        f" double)) / (n_total + {LM_SMOOTH_NUM} * vocab"
        f" / cast({LM_SMOOTH_DEN} as double))) * 1000000) as bigint)"
    )


def _logp_duck_expr() -> str:
    return (
        f"floor(ln((c + {LM_SMOOTH_NUM} / {LM_SMOOTH_DEN}::DOUBLE)"
        f" / (n_total + {LM_SMOOTH_NUM} * vocab"
        f" / {LM_SMOOTH_DEN}::DOUBLE)) * 1000000)::BIGINT"
    )


def _unigram_fit(terms):
    """(counts, scalars) DataFrames from a terms DF with a `term`
    column — the one-pass unigram LM fit shared by every scorer."""
    counts = terms.groupBy("term").agg(
        F.count("*").cast("bigint").alias("c")
    )
    scalars = counts.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    return counts, scalars


_UNIGRAM_CTES_DUCK = """counts AS (
            SELECT term, COUNT(*)::BIGINT AS c FROM terms GROUP BY term
        ),
        scalars AS (
            SELECT sum(c)::BIGINT AS n_total, COUNT(*)::BIGINT AS vocab
            FROM counts
        )"""


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("term")
    )
    # train + score via the shared helpers: integerised micro-nat
    # log-prob per token occurrence, identical left-to-right float ops
    # in both dialects, then floor — every later aggregate is integer
    counts, scalars = _unigram_fit(terms)
    logp = _logp_spark_expr()
    scored = (
        terms.join(counts, "term")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", F.expr(logp).alias("logp_micro"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("logp_micro").cast("bigint").alias("sum_logp_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                "round(sum_logp_micro / cast(n_tokens as double)"
                " / 1000000.0, 6)"
            ).alias("avg_logprob"),
        )
    )


def sql_lm_score() -> str:
    logp = _logp_duck_expr()
    return f"""
        WITH terms AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS term FROM documents
        ),
        {_UNIGRAM_CTES_DUCK},
        scored AS (
            SELECT t.doc_id, {logp} AS logp_micro
            FROM terms t JOIN counts USING (term) CROSS JOIN scalars
        )
        SELECT doc_id,
               COUNT(*)::BIGINT AS n_tokens,
               round(sum(logp_micro) / COUNT(*)::DOUBLE / 1000000.0, 6)
                   AS avg_logprob
        FROM scored GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# CCNet head / middle / tail perplexity bucketing
# ---------------------------------------------------------------------------

# histogram bucket width for the per-lang score distribution, in
# micro-nats of average token log-prob: 0.05 nat per bucket. The avg
# log-prob is bounded below by -ln(N + V/2) (an unseen-vocab floor), so
# the per-lang histogram state is a few hundred buckets REGARDLESS of
# corpus size — the same bounded-state argument as hist_quantiles.
CCNET_BUCKET_MICRO = 50_000


def _logp_micro(duck: bool) -> str:
    """Integerised micro-nat unigram log-prob (identical float ops
    left-to-right in both dialects, then floor — the lm_score
    discipline)."""
    if duck:
        return (
            f"floor(ln((c + {LM_SMOOTH_NUM} / {LM_SMOOTH_DEN}::DOUBLE)"
            f" / (n_total + {LM_SMOOTH_NUM} * vocab"
            f" / {LM_SMOOTH_DEN}::DOUBLE)) * 1000000)::BIGINT"
        )
    return (
        f"cast(floor(ln((c + {LM_SMOOTH_NUM} / cast({LM_SMOOTH_DEN} as"
        f" double)) / (n_total + {LM_SMOOTH_NUM} * vocab"
        f" / cast({LM_SMOOTH_DEN} as double))) * 1000000) as bigint)"
    )


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): score
    every document under the LM, then cut each language's score
    distribution into terciles — head = the best-scoring third (lowest
    perplexity), tail = the worst. CCNet computes the cutoffs on a
    sample; here they come from a per-lang HISTOGRAM of 0.05-nat
    buckets (bounded state at any corpus size), so a document's label
    is exact given its bucket and the tercile boundary lands on a
    bucket edge — the one-bucket-granularity error hist_quantiles
    documents, applied to the classic CCNet dashboard.

    100 TB story: lm_score's shuffles (vocab-keyed train groupBy,
    term-keyed scoring join, doc_id-keyed per-doc agg) plus a
    lang+bucket groupBy whose output is O(langs x 300) rows; the
    cumulative window and the tercile reduction run on that tiny table
    and the cutoffs broadcast back onto the corpus. No corpus-wide
    window, no floats across exchanges."""
    from pyspark.sql import Window

    docs = read_spread(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", "lang", F.explode(F.expr(TOKENS_SPARK)).alias("term")
    )
    counts = terms.groupBy("term").agg(
        F.count("*").cast("bigint").alias("c")
    )
    scalars = counts.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    per_doc = (
        terms.join(counts, "term")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", "lang", F.expr(_logp_micro(False)).alias("lp"))
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lp").cast("bigint").alias("sum_lp"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr(
                "round(sum_lp / cast(n_tokens as double)"
                " / 1000000.0, 6)"
            ).alias("avg_logprob"),
            F.expr(
                "cast(floor(sum_lp / cast(n_tokens as double)"
                f" / {CCNET_BUCKET_MICRO}.0) as bigint)"
            ).alias("bucket"),
        )
    )
    hist = per_doc.groupBy("lang", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy("bucket")
    cum = hist.select(
        "lang",
        "bucket",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy("lang")
        ).alias("n_lang"),
    )
    cuts = cum.groupBy("lang").agg(
        F.min(F.when(F.expr("cum * 3 >= n_lang"), F.col("bucket"))).alias(
            "tail_ub"
        ),
        F.min(
            F.when(F.expr("cum * 3 >= 2 * n_lang"), F.col("bucket"))
        ).alias("middle_ub"),
    )
    return per_doc.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        "avg_logprob",
        "bucket",
        "tail_ub",
        "middle_ub",
        F.expr(
            "case when bucket <= tail_ub then 'tail'"
            " when bucket <= middle_ub then 'middle'"
            " else 'head' end"
        ).alias("ppl_bucket"),
    )


def sql_ccnet_buckets() -> str:
    return f"""
        WITH terms AS (
            SELECT doc_id, lang, unnest({TOKENS_DUCK}) AS term
            FROM documents
        ),
        counts AS (
            SELECT term, COUNT(*)::BIGINT AS c FROM terms GROUP BY term
        ),
        scalars AS (
            SELECT sum(c)::BIGINT AS n_total, COUNT(*)::BIGINT AS vocab
            FROM counts
        ),
        per_doc AS (
            SELECT doc_id, lang,
                   COUNT(*)::BIGINT AS n_tokens,
                   round(sum(lp) / COUNT(*)::DOUBLE / 1000000.0, 6)
                       AS avg_logprob,
                   floor(sum(lp) / COUNT(*)::DOUBLE
                         / {CCNET_BUCKET_MICRO}.0)::BIGINT AS bucket
            FROM (
                SELECT t.doc_id, t.lang, {_logp_micro(True)} AS lp
                FROM terms t JOIN counts USING (term)
                CROSS JOIN scalars
            ) GROUP BY doc_id, lang
        ),
        hist AS (
            SELECT lang, bucket, COUNT(*)::BIGINT AS cnt
            FROM per_doc GROUP BY lang, bucket
        ),
        cum AS (
            SELECT lang, bucket,
                   SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER (PARTITION BY lang) AS n_lang
            FROM hist
        ),
        cuts AS (
            SELECT lang,
                   MIN(CASE WHEN cum * 3 >= n_lang THEN bucket END)
                       AS tail_ub,
                   MIN(CASE WHEN cum * 3 >= 2 * n_lang THEN bucket END)
                       AS middle_ub
            FROM cum GROUP BY lang
        )
        SELECT doc_id, p.lang, n_tokens, avg_logprob, bucket,
               tail_ub, middle_ub,
               CASE WHEN bucket <= tail_ub THEN 'tail'
                    WHEN bucket <= middle_ub THEN 'middle'
                    ELSE 'head' END AS ppl_bucket
        FROM per_doc p JOIN cuts USING (lang)
    """


# ---------------------------------------------------------------------------
# segment_ppl: CCNet paragraph-level perplexity filtering signal
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2020 §4.4) scores PARAGRAPHS, not just whole
# documents — boilerplate or garbled spans hide inside documents whose
# overall score looks fine. This op scores every SEG_WORDS-word segment
# (the seg_dedup segmentation, one shared definition) with the corpus
# unigram LM and reports per document the worst / best segment average
# log-prob and how many segments fall below the bad-segment threshold —
# the keep/trim/drop signal a paragraph-level cleaner acts on.
#
# Integer discipline: segment averages use OFFSET integer division
# ((sum + OFF*n) div n - OFF) because segment log-prob sums are
# negative and Spark's `div` truncates toward zero while DuckDB's `//`
# floors. OFF = 40e6 micro-nats bounds any unigram logp down to
# corpora of ~e^40 tokens.

LM_SEG_OFF = 40_000_000
LM_SEG_BAD_MICRO = -9_500_000  # avg logp below -9.5 nats => bad segment


def q_segment_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _segments_spark

    docs = read_spread(spark, sf_dir, "documents")
    segs = docs.select(
        "doc_id", F.expr(TOKENS_SPARK).alias("toks")
    ).select(
        "doc_id", F.explode(F.expr(_segments_spark())).alias("s")
    ).select("doc_id", "s.ord", "s.seg")
    terms = segs.select(
        "doc_id", "ord", F.explode(F.expr("split(seg, ' ')")).alias("term")
    )
    counts, scalars = _unigram_fit(terms)
    logp = _logp_spark_expr()
    scored = (
        terms.join(counts, "term")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", "ord", F.expr(logp).alias("logp_micro"))
    )
    per_seg = scored.groupBy("doc_id", "ord").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("logp_micro").cast("bigint").alias("s_micro"),
    ).select(
        "doc_id",
        F.expr(
            f"cast((s_micro + {LM_SEG_OFF} * n) div n - {LM_SEG_OFF}"
            " as bigint)"
        ).alias("avg_micro"),
    )
    return per_seg.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_segs"),
        F.min("avg_micro").cast("bigint").alias("worst_avg_micro"),
        F.max("avg_micro").cast("bigint").alias("best_avg_micro"),
        F.expr(
            f"cast(sum(case when avg_micro < {LM_SEG_BAD_MICRO}"
            " then 1 else 0 end) as bigint)"
        ).alias("n_bad_segs"),
    )


def sql_segment_ppl() -> str:
    from .dedup import _segments_duck

    logp = _logp_duck_expr()
    return f"""
        WITH segs AS (
            SELECT doc_id, s.ord AS ord, s.seg AS seg FROM (
                SELECT doc_id,
                       unnest({_segments_duck()}) AS s
                FROM documents
            )
        ),
        terms AS (
            SELECT doc_id, ord,
                   unnest(string_split(seg, ' ')) AS term
            FROM segs
        ),
        {_UNIGRAM_CTES_DUCK},
        scored AS (
            SELECT t.doc_id, t.ord, {logp} AS logp_micro
            FROM terms t JOIN counts USING (term) CROSS JOIN scalars
        ),
        per_seg AS (
            SELECT doc_id,
                   ((sum(logp_micro) + {LM_SEG_OFF} * COUNT(*))
                    // COUNT(*) - {LM_SEG_OFF})::BIGINT AS avg_micro
            FROM scored GROUP BY doc_id, ord
        )
        SELECT doc_id,
               COUNT(*)::BIGINT AS n_segs,
               min(avg_micro)::BIGINT AS worst_avg_micro,
               max(avg_micro)::BIGINT AS best_avg_micro,
               sum(CASE WHEN avg_micro < {LM_SEG_BAD_MICRO}
                   THEN 1 ELSE 0 END)::BIGINT AS n_bad_segs
        FROM per_seg GROUP BY doc_id
    """
