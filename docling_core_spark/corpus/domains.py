"""Per-domain curation dashboard: quality keep-rate, token mass, and
dup-rate per registered domain — the table a crawl operator reads to
build domain blocklists (a domain whose pages overwhelmingly fail the
quality rules gets cut at the FRONTIER, saving every downstream fetch
and compute; the cheapest filter in the whole pipeline is the one that
prevents acquisition).

``domain_quality`` composes three gate-verified signals — the URL
table's registered domain, the Gopher keep verdict, and token counts —
into one per-domain row: page count, quality-keep ppm, token mass,
language spread, and the canonical-URL dup ppm from domain_stats.

100 TB story: both inputs are per-doc tables keyed by uniform doc_id
(one sort-merge join; on a doc_id-bucketed production table the
exchange vanishes — tests/test_bucketed_join.py asserts that plan
shape); the rollup is one map-side-combined groupBy on the uniform
registered-domain key with domain-table-sized output. Exact ppm
integers cross the exchange, never floats.

Reference analog: none (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .filters import q_gopher_quality, sql_gopher_quality
from .textstats import TOKENS_DUCK, TOKENS_SPARK
from .urls import _urls_cte, _urls_df
from . import read_spread


def q_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    urls = _urls_df(spark, sf_dir).select("doc_id", "domain", "url_canon")
    quality = q_gopher_quality(spark, sf_dir).select("doc_id", "keep")
    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("n_tokens"),
    )
    joined = urls.join(quality, "doc_id").join(docs, "doc_id")
    return joined.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.sum(F.expr("cast(keep as bigint)")).cast("bigint").alias(
            "n_keep"
        ),
        F.expr(
            "cast(sum(cast(keep as bigint)) * 1000000"
            " div count(*) as bigint)"
        ).alias("keep_ppm"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.expr(
            "cast((count(*) - count(distinct url_canon)) * 1000000"
            " div count(*) as bigint)"
        ).alias("dup_ppm"),
    )


def sql_domain_quality() -> str:
    return f"""
        WITH {_urls_cte()},
        quality AS ({sql_gopher_quality()}),
        docs AS (
            SELECT doc_id, lang,
                   len({TOKENS_DUCK})::BIGINT AS n_tokens
            FROM documents
        )
        SELECT domain,
               COUNT(*)::BIGINT AS n_pages,
               SUM(keep::BIGINT)::BIGINT AS n_keep,
               (SUM(keep::BIGINT) * 1000000 // COUNT(*))::BIGINT
                   AS keep_ppm,
               SUM(n_tokens)::BIGINT AS tokens_total,
               COUNT(DISTINCT lang)::BIGINT AS n_langs,
               ((COUNT(*) - COUNT(DISTINCT url_canon)) * 1000000
                // COUNT(*))::BIGINT AS dup_ppm
        FROM urls
        JOIN quality USING (doc_id)
        JOIN docs USING (doc_id)
        GROUP BY domain
    """
