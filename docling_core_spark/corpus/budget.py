"""Token-budget selection: the highest-quality subset of the corpus
that fits a training token budget.

"Train on the best 40% of tokens" is the standard curation endgame
(quality-pruned pretraining; the selection step behind quality-first
data recipes). Greedy by quality is the exact optimum here (uniform
per-token value within a document), so the semantics are: order docs by
(quality desc, doc_id asc), keep the prefix whose INCLUSIVE cumulative
token count fits floor(total_tokens * TOKEN_BUDGET_PPM / 1e6).

The cumulative count is a corpus-wide ordered prefix sum — the same
"doesn't fit one window" shape as pack_sequences, decomposed the same
way (two-level prefix sum), except the grouping key must respect the
ORDER: docs bucket by coarse quality band (q_micro div BAND_STEP), the
within-band running sum windows over the band key, the band totals
(64 rows) get the only global window, and band prefixes broadcast back.
Equal q_micro always lands in one band, so band-major order ==
(q desc, doc_id) global order exactly. Quality bands can skew where the
corpus quality distribution concentrates; a production run calibrates
band edges from hist_quantiles first (same plumbing, data-driven
edges).

Float discipline: quality_score is the gate-proven 6dp-rounded double
from textstats.q_quality; q_micro = floor(qs * 1e6 + 0.5) re-integerises
it identically in both dialects, and every sum/compare after that is
BIGINT. Reference analog: none (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textstats import q_quality, sql_quality

TOKEN_BUDGET_PPM = 400_000       # keep the best 40% of corpus tokens
BUDGET_BANDS = 64
_BAND_STEP = 1_000_000 // BUDGET_BANDS


def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = q_quality(spark, sf_dir).select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr(
            "cast(floor(quality_score * 1000000 + 0.5) as bigint)"
        ).alias("q_micro"),
    ).withColumn(
        "band",
        F.expr(
            f"least(cast({BUDGET_BANDS - 1} as bigint),"
            f" q_micro div {_BAND_STEP})"
        ),
    )
    w_in = (
        Window.partitionBy("band")
        .orderBy(F.desc("q_micro"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = q.withColumn(
        "cum_in_band", F.sum("n_tokens").over(w_in).cast("bigint")
    )
    totals = q.groupBy("band").agg(
        F.sum("n_tokens").cast("bigint").alias("band_total")
    )
    # the only global window: over the <=64-row band table, high
    # quality first (exclusive prefix)
    w_b = (
        Window.orderBy(F.desc("band"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = totals.withColumn(
        "band_prefix",
        (F.sum("band_total").over(w_b) - F.col("band_total"))
        .cast("bigint"),
    ).select("band", "band_prefix")
    budget = totals.agg(
        F.expr(
            f"cast(sum(band_total) * {TOKEN_BUDGET_PPM} div 1000000"
            " as bigint)"
        ).alias("budget_tokens")
    )
    return (
        within.join(F.broadcast(prefixes), "band")
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "cum_tokens",
            (F.col("band_prefix") + F.col("cum_in_band")).cast("bigint"),
        )
        .filter(F.col("cum_tokens") <= F.col("budget_tokens"))
        .select("doc_id", "n_tokens", "q_micro", "cum_tokens")
    )


def sql_token_budget_select() -> str:
    return f"""
        WITH q AS (
            SELECT doc_id, n_tokens::BIGINT AS n_tokens,
                   floor(quality_score * 1000000 + 0.5)::BIGINT
                       AS q_micro
            FROM ({sql_quality()})
        ),
        cum AS (
            SELECT doc_id, n_tokens, q_micro,
                   sum(n_tokens) OVER (
                       ORDER BY q_micro DESC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum_tokens
            FROM q
        ),
        tot AS (
            SELECT (sum(n_tokens) * {TOKEN_BUDGET_PPM}
                    // 1000000)::BIGINT AS budget_tokens
            FROM q
        )
        SELECT doc_id, n_tokens, q_micro, cum_tokens
        FROM cum CROSS JOIN tot
        WHERE cum_tokens <= budget_tokens
    """
