"""Per-source distribution drift: smoothed KL divergence of each
source's unigram distribution from the corpus-wide distribution — the
monitoring dashboard a continuously-ingesting corpus watches (a crawl
source whose token distribution walks away from the corpus signals a
template change, a language shift, or spam injection long before
per-doc filters catch it).

    KL(P_s || P_c) ~= sum_{w observed in s} P_s(w) * ln(P_s(w)/P_c(w))
    P_s(w) = (c_s(w) + 0.5) / (N_s + V/2)     (corpus-vocab smoothing)
    P_c(w) = (c(w) + 0.5) / (N + V/2)

The sum runs over the source's OBSERVED support (terms the source
actually uses): the unobserved-term remainder is a smoothing artifact
that shrinks with V and is identical across sources, so the observed-
support estimate preserves the ranking the dashboard exists for —
documented as the estimator, not hidden. Per-term contributions are
floored to micro-nat integers BEFORE summation (the lm_score
discipline), so engines agree bit-for-bit. Note the observed-support
sum can be slightly negative for a source that under-uses common
words — it is a truncated KL, not the full (always >= 0) divergence.

100 TB story: per-(source, term) counts are one map-side-combined
groupBy on a uniform composite key; the corpus count table joins on
the uniform term key (sort-merge at prod vocab scale); per-source
totals and the (N, V) scalars broadcast; the final rollup has
source-table-sized output.

Reference analog: none (SURVEY.md §2.8). Kullback & Leibler 1951.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK


def _contrib_micro(duck: bool) -> str:
    """Micro-nat KL contribution of one (source, term) row given
    columns cs, ns, c, n_total, vocab. Identical float ops
    left-to-right in both dialects, then floor. The Spark branch casts
    every integer operand to double explicitly: a bare `x + 0.5` /
    `x / 2.0` parses the literal as DECIMAL in Spark SQL, and decimal
    rounding diverges from DuckDB's double arithmetic by one micro-nat
    on a few terms (observed before this cast)."""
    def d(col: str) -> str:
        return col if duck else f"cast({col} as double)"

    ps = f"(({d('cs')} + 0.5) / ({d('ns')} + {d('vocab')} / 2.0))"
    pc = f"(({d('c')} + 0.5) / ({d('n_total')} + {d('vocab')} / 2.0))"
    e = f"{ps} * ln({ps} / {pc})"
    if duck:
        return f"floor(({e}) * 1000000)::BIGINT"
    return f"cast(floor(({e}) * 1000000) as bigint)"


def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents")
    terms = docs.select(
        "source", F.explode(F.expr(TOKENS_SPARK)).alias("term")
    )
    per_st = terms.groupBy("source", "term").agg(
        F.count("*").cast("bigint").alias("cs")
    )
    per_t = per_st.groupBy("term").agg(
        F.sum("cs").cast("bigint").alias("c")
    )
    per_s = per_st.groupBy("source").agg(
        F.sum("cs").cast("bigint").alias("ns")
    )
    scalars = per_t.agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("vocab"),
    )
    return (
        per_st.join(per_t, "term")
        .join(F.broadcast(per_s), "source")
        .crossJoin(F.broadcast(scalars))
        .select("source", "ns", F.expr(_contrib_micro(False)).alias("k"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.max("ns").alias("n_tokens"),
            F.sum("k").cast("bigint").alias("kl_micro"),
            F.expr("round(sum(k) / cast(1000000 as double), 6)").alias(
                "kl_nats"
            ),
        )
    )


def sql_source_drift() -> str:
    return f"""
        WITH terms AS (
            SELECT source, unnest({TOKENS_DUCK}) AS term FROM documents
        ),
        per_st AS (
            SELECT source, term, COUNT(*)::BIGINT AS cs
            FROM terms GROUP BY source, term
        ),
        per_t AS (
            SELECT term, SUM(cs)::BIGINT AS c FROM per_st GROUP BY term
        ),
        per_s AS (
            SELECT source, SUM(cs)::BIGINT AS ns
            FROM per_st GROUP BY source
        ),
        scalars AS (
            SELECT SUM(c)::BIGINT AS n_total, COUNT(*)::BIGINT AS vocab
            FROM per_t
        )
        SELECT source,
               COUNT(*)::BIGINT AS n_terms,
               MAX(ns) AS n_tokens,
               SUM(k)::BIGINT AS kl_micro,
               round(SUM(k) / 1000000.0, 6) AS kl_nats
        FROM (
            SELECT st.source, ns, {_contrib_micro(True)} AS k
            FROM per_st st
            JOIN per_t USING (term)
            JOIN per_s USING (source)
            CROSS JOIN scalars
        ) GROUP BY source
    """


# ---------------------------------------------------------------------------
# Per-source language-mix entropy
# ---------------------------------------------------------------------------


def q_source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (micro-nats) of each source's language mix plus
    its dominant language and purity ppm — the monolinguality dashboard
    an ingest feed is triaged with: a "news-en" source whose entropy
    jumps has started shipping mixed-language pages.

    Float discipline: p = cnt/total assembles in identical
    left-to-right double ops in both dialects; each -p*ln(p) term is
    floored to micro-nats BEFORE the per-source sum, so the aggregate
    is an exact BIGINT in any partition order (same contract as
    source_drift / lm_score).

    100 TB story: one map-side-combined groupBy on the tiny
    (source, lang) key; per-source totals join on the source key
    (sources are a small dimension); output is source-table-sized.
    Reference analog: none (SURVEY.md §2.8)."""
    docs = read_spread(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tot = sl.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    p = "(cast(cnt as double) / cast(total as double))"
    return (
        sl.join(tot, "source")
        .groupBy("source")
        .agg(
            F.max("total").cast("bigint").alias("n_docs"),
            F.max("n_langs").cast("bigint").alias("n_langs"),
            F.sum(
                F.expr(
                    f"cast(floor(-({p}) * ln({p}) * 1000000) as bigint)"
                )
            ).cast("bigint").alias("entropy_micronat"),
            # argmax as a sortable string (count zero-padded, then
            # lang) — MAX of this string is identical in both engines,
            # ties on count break toward the larger lang
            F.max(
                F.expr("concat(lpad(cast(cnt as string), 18, '0'),"
                       " '|', lang)")
            ).alias("top"),
        )
        .select(
            "source", "n_docs", "n_langs", "entropy_micronat",
            F.expr("element_at(split(top, '\\\\|'), 2)").alias("top_lang"),
            F.expr(
                "cast(cast(element_at(split(top, '\\\\|'), 1) as bigint)"
                " * 1000000 div n_docs as bigint)"
            ).alias("purity_ppm"),
        )
    )


def sql_source_lang_entropy() -> str:
    p = "(cnt::DOUBLE / total::DOUBLE)"
    return f"""
        WITH sl AS (
            SELECT source, lang, COUNT(*)::BIGINT AS cnt
            FROM documents GROUP BY source, lang
        ),
        tot AS (
            SELECT source, SUM(cnt)::BIGINT AS total,
                   COUNT(*)::BIGINT AS n_langs
            FROM sl GROUP BY source
        ),
        joined AS (
            SELECT sl.source, sl.lang, sl.cnt, tot.total, tot.n_langs
            FROM sl JOIN tot USING (source)
        )
        SELECT source,
               MAX(total)::BIGINT AS n_docs,
               MAX(n_langs)::BIGINT AS n_langs,
               SUM(floor(-({p}) * ln({p}) * 1000000)::BIGINT)::BIGINT
                   AS entropy_micronat,
               str_split(MAX(lpad(cnt::VARCHAR, 18, '0') || '|' || lang),
                         '|')[2] AS top_lang,
               (str_split(MAX(lpad(cnt::VARCHAR, 18, '0') || '|' || lang),
                          '|')[1]::BIGINT * 1000000
                // MAX(total))::BIGINT AS purity_ppm
        FROM joined GROUP BY source
    """
