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


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("term")
    )
    # train: unigram counts + the two scalars (total tokens, vocab)
    counts = terms.groupBy("term").agg(
        F.count("*").cast("bigint").alias("c")
    )
    scalars = counts.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    # score: integerised micro-nat log-prob per token occurrence.
    # identical left-to-right float ops in both dialects, then floor —
    # every later aggregate is integer math
    logp = (
        f"cast(floor(ln((c + {LM_SMOOTH_NUM} / cast({LM_SMOOTH_DEN} as"
        f" double)) / (n_total + {LM_SMOOTH_NUM} * vocab"
        f" / cast({LM_SMOOTH_DEN} as double))) * 1000000) as bigint)"
    )
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
    logp = (
        f"floor(ln((c + {LM_SMOOTH_NUM} / {LM_SMOOTH_DEN}::DOUBLE)"
        f" / (n_total + {LM_SMOOTH_NUM} * vocab"
        f" / {LM_SMOOTH_DEN}::DOUBLE)) * 1000000)::BIGINT"
    )
    return f"""
        WITH terms AS (
            SELECT doc_id, unnest({TOKENS_DUCK}) AS term FROM documents
        ),
        counts AS (
            SELECT term, COUNT(*)::BIGINT AS c FROM terms GROUP BY term
        ),
        scalars AS (
            SELECT sum(c)::BIGINT AS n_total, COUNT(*)::BIGINT AS vocab
            FROM counts
        ),
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
