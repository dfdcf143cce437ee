"""Held-out perplexity evaluation: train the unigram LM on the TRAIN
split only, score every split with it, and report per-split perplexity
and OOV rate — the eval-hygiene loop that closes data_split and the LM
family together (score-on-what-you-trained-on is the classic silent
mistake; this operator makes the train/heldout gap a first-class
oracle-checked number).

Model: the lm_score estimator fit on train tokens only —
P(w) = (c_train(w) + 0.5) / (N_train + V_train/2), with unseen words
(OOV at eval time) taking the smoothed zero-count mass. Per-token
log-probs are floored to micro-nats before aggregation (lm_score
discipline); perplexity = exp(-avg logprob) computed identically in
both engines at the very end.

The expected reading at healthy settings: train ppl < val/test ppl
(generalization gap), OOV ppm 0 on train by construction. On the
synthetic gate corpus the shared closed vocabulary makes heldout OOV
0 as well and the ppl gap small — the OOV path (LEFT join miss ->
smoothed zero-count mass) is exercised by the planted-OOV pytest
instead.

100 TB story: the model fit is one map-side-combined groupBy on the
uniform term key over ~90% of the corpus; scoring LEFT-joins the
vocabulary-sized count table on the same key (unseen eval terms keep
NULL -> smoothed zero-count mass, no second pass); the rollup is a
3-row aggregate. No window, no Python.

Reference analog: none (SURVEY.md §2.8). Wenzek et al. 2020; Chelba
et al. 2013 (the one-billion-word heldout-eval protocol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread
from .splits import _split_expr
from .textstats import TOKENS_DUCK, TOKENS_SPARK


def _logp_heldout(duck: bool) -> str:
    """Micro-nat log-prob given c (train count, NULL when OOV),
    n_total, vocab (train scalars). Explicit double casts on the Spark
    side (the bm25/lm2/drift decimal-literal rule)."""
    def d(col: str) -> str:
        return col if duck else f"cast({col} as double)"

    cz = "coalesce(c, 0)"
    p = f"(({d(cz)} + 0.5) / ({d('n_total')} + {d('vocab')} / 2.0))"
    if duck:
        return f"floor(ln({p}) * 1000000)::BIGINT"
    return f"cast(floor(ln({p}) * 1000000) as bigint)"


def q_heldout_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents")
    terms = docs.select(
        F.expr(_split_expr(False)).alias("split"),
        F.explode(F.expr(TOKENS_SPARK)).alias("term"),
    )
    counts = (
        terms.where("split = 'train'")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    scalars = counts.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    scored = (
        terms.join(counts, "term", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "split",
            F.expr("cast(c is null as bigint)").alias("oov"),
            F.expr(_logp_heldout(False)).alias("lp"),
        )
    )
    return scored.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        F.expr(
            "cast(sum(oov) * 1000000 div count(*) as bigint)"
        ).alias("oov_ppm"),
        F.sum("lp").cast("bigint").alias("sum_lp_micro"),
        F.expr(
            "round(exp(-(sum(lp) / cast(count(*) as double))"
            " / 1000000.0), 6)"
        ).alias("perplexity"),
    )


def sql_heldout_ppl() -> str:
    return f"""
        WITH terms AS (
            SELECT {_split_expr(True)} AS split,
                   unnest({TOKENS_DUCK}) AS term
            FROM documents
        ),
        counts AS (
            SELECT term, COUNT(*)::BIGINT AS c
            FROM terms WHERE split = 'train' GROUP BY term
        ),
        scalars AS (
            SELECT SUM(c)::BIGINT AS n_total, COUNT(*)::BIGINT AS vocab
            FROM counts
        ),
        scored AS (
            SELECT split,
                   (c IS NULL)::BIGINT AS oov,
                   {_logp_heldout(True)} AS lp
            FROM terms LEFT JOIN counts USING (term)
            CROSS JOIN scalars
        )
        SELECT split,
               COUNT(*)::BIGINT AS n_tokens,
               SUM(oov)::BIGINT AS n_oov,
               (SUM(oov) * 1000000 // COUNT(*))::BIGINT AS oov_ppm,
               SUM(lp)::BIGINT AS sum_lp_micro,
               round(exp(-(SUM(lp) / COUNT(*)::DOUBLE) / 1000000.0), 6)
                   AS perplexity
        FROM scored GROUP BY split
    """
