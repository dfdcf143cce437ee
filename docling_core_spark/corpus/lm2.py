"""Interpolated bigram LM quality scoring — the n-gram-order upgrade
of ``lm_score`` (whose docstring names it as the production path):
CCNet scores with a KenLM 5-gram; a bigram-with-backoff model is the
same estimator family one order up, and the plan shape below is
exactly what each further order adds (one more uniform-keyed count
table + one more scoring join).

Model: Jelinek-Mercer interpolation

    P(w2 | w1) = LAM * P_bi(w2|w1) + (1 - LAM) * P_uni(w2)
    P_bi(w2|w1) = (c2(w1 w2) + 0.5) / (c1(w1) + V/2)
    P_uni(w)    = (c1(w) + 0.5) / (N + V/2)

with the engine's standard +1/2 smoothing. A document's first token is
scored by the unigram term alone (no left context). Per-token
log-probs are floored to micro-nats BEFORE any aggregation (the
lm_score float discipline), so engines agree bit-for-bit.

100 TB story: the bigram model is one map-side-combined groupBy on the
uniform (w1, w2) key (model size = distinct bigrams, not corpus
tokens); the scoring join is keyed by the same uniform bigram
(sort-merge at prod vocab scale); the unigram join reuses the
vocabulary-sized table; the per-doc sum aggregates on uniform doc_id.
The gate row directly evidences the claim lm_score's docstring makes
about higher orders: same shuffles, one per order.

Reference analog: none (SURVEY.md §2.8). Wenzek et al. 2020 (CCNet);
Jelinek & Mercer 1980 (interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK

LM2_LAMBDA = 0.75  # interpolation weight on the bigram term


def _logp2(duck: bool, c2: str = "c2") -> str:
    """Micro-nat log-prob of one token occurrence given columns
    c2 (bigram count, NULL/0 for the doc-initial token), c1p (count of
    the PRECEDING token, NULL for doc-initial), c1 (count of the token
    itself), n_total, vocab. Identical left-to-right float ops in both
    dialects, then floor."""
    # explicit double casts on the Spark side (see bm25._score_micro:
    # bare `bigint + 0.5` is DECIMAL arithmetic in Spark SQL)
    def d(col: str) -> str:
        return col if duck else f"cast({col} as double)"

    puni = f"(({d('c1')} + 0.5) / ({d('n_total')} + {d('vocab')} / 2.0))"
    pbi = f"(({d(c2)} + 0.5) / ({d('c1p')} + {d('vocab')} / 2.0))"
    p = (
        f"CASE WHEN c1p IS NULL THEN {puni}"
        f" ELSE {LM2_LAMBDA} * {pbi}"
        f" + {1 - LM2_LAMBDA} * {puni} END"
    )
    if duck:
        return f"floor(ln({p}) * 1000000)::BIGINT"
    return f"cast(floor(ln({p}) * 1000000) as bigint)"


def q_lm2_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(TOKENS_SPARK).alias("t"))
    # one row per token occurrence with its left context (NULL for the
    # doc-initial token) — a zero-shuffle posexplode
    occ = toks.select(
        "doc_id",
        F.expr(
            "posexplode(transform(t, (w, i) -> named_struct("
            "'w', w, 'prev', CASE WHEN i = 0 THEN NULL"
            " ELSE element_at(t, i) END)))"
        ).alias("pos", "o"),
    ).select("doc_id", "o.w", "o.prev")
    uni = occ.groupBy("w").agg(F.count("*").cast("bigint").alias("c1"))
    bi = (
        occ.where("prev is not null")
        .groupBy("prev", "w")
        .agg(F.count("*").cast("bigint").alias("c2"))
    )
    scalars = uni.agg(
        F.sum("c1").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    scored = (
        occ.join(uni, "w")
        .join(
            uni.select(
                F.col("w").alias("prev"), F.col("c1").alias("c1p")
            ),
            "prev",
            "left",
        )
        .join(bi, ["prev", "w"], "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN prev IS NOT NULL AND c2 IS NULL"
                " THEN cast(0 as bigint) ELSE c2 END"
            ).alias("c2x"),
            "c1",
            "c1p",
            "n_total",
            "vocab",
        )
        .select(
            "doc_id",
            F.expr(_logp2(False, "c2x")).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lp").cast("bigint").alias("sum_lp_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(
                "round(sum_lp_micro / cast(n_tokens as double)"
                " / 1000000.0, 6)"
            ).alias("avg_logprob2"),
        )
    )


def sql_lm2_score() -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_DUCK} AS t FROM documents
        ),
        occ AS (
            SELECT doc_id,
                   t[i] AS w,
                   CASE WHEN i = 1 THEN NULL ELSE t[i - 1] END AS prev
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t))) AS i
                  FROM toks)
        ),
        uni AS (
            SELECT w, COUNT(*)::BIGINT AS c1 FROM occ GROUP BY w
        ),
        bi AS (
            SELECT prev, w, COUNT(*)::BIGINT AS c2
            FROM occ WHERE prev IS NOT NULL GROUP BY prev, w
        ),
        scalars AS (
            SELECT SUM(c1)::BIGINT AS n_total, COUNT(*)::BIGINT AS vocab
            FROM uni
        ),
        joined AS (
            SELECT o.doc_id,
                   CASE WHEN o.prev IS NOT NULL AND b.c2 IS NULL
                        THEN 0 ELSE b.c2 END AS c2x,
                   u.c1,
                   up.c1 AS c1p,
                   n_total, vocab
            FROM occ o
            JOIN uni u ON o.w = u.w
            LEFT JOIN uni up ON o.prev = up.w
            LEFT JOIN bi b ON o.prev = b.prev AND o.w = b.w
            CROSS JOIN scalars
        ),
        scored AS (
            SELECT doc_id, {_logp2(True, "c2x")} AS lp
            FROM joined
        )
        SELECT doc_id,
               COUNT(*)::BIGINT AS n_tokens,
               round(SUM(lp) / COUNT(*)::DOUBLE / 1000000.0, 6)
                   AS avg_logprob2
        FROM scored GROUP BY doc_id
    """
