"""Document outline (table-of-contents) extraction over the span
sequence: title + section_header_level_N spans with hierarchy links —
per header its level, its parent header's ord (the nearest preceding
header of a strictly shallower level), and its sibling index among
same-parent same-level headers. This is the TOC/outline table a
document viewer or navigation index consumes; the reference exposes
the same information through iterate_items' (item, level) tuples
(docling_core/types/doc/document.py iterate_items), here re-expressed
relationally.

Oracle strategy: the Spark side derives the outline from the ENGINE's
parsed tree (run_pipeline span_seq); the DuckDB oracle runs the SAME
derivation SQL over the reference-parity-checked golden span table —
so the gate asserts engine traversal == independent SQL derivation
chained to reference semantics, not a self-snapshot.

100 TB story: headers filter to a tiny fraction of spans; every window
partitions by doc_id (uniform, bounded spans/doc). The parent link
uses six fixed "last header at level <= k" running-max columns (levels
are bounded at 6) — no self-join, no recursion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MAX_LEVEL = 6

_LEVEL = (
    "CASE WHEN kind = 'title' THEN 0"
    " ELSE CAST(substring(kind, 22) AS INT) END"
)


def toc_sql(src: str) -> str:
    """Dialect-identical outline derivation over a span table
    (doc_id, ord, kind, text, media_ref)."""
    last_cols = ", ".join(
        f"max(CASE WHEN level <= {k} THEN ord END) OVER ("
        f" PARTITION BY doc_id ORDER BY ord"
        f" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        f" AS last_le_{k}"
        for k in range(0, MAX_LEVEL)
    )
    parent = "CASE level " + " ".join(
        f"WHEN {lv} THEN last_le_{lv - 1}" for lv in range(1, MAX_LEVEL + 1)
    ) + " ELSE NULL END"
    return f"""
        WITH hdrs AS (
            SELECT doc_id, ord, text, {_LEVEL} AS level
            FROM {src}
            WHERE kind = 'title' OR kind LIKE 'section_header_level_%'
        ),
        linked AS (
            SELECT doc_id, ord, text, level, {last_cols}
            FROM hdrs
        ),
        parented AS (
            SELECT doc_id, ord, text, level,
                   CAST({parent} AS BIGINT) AS parent_ord
            FROM linked
        )
        SELECT doc_id, CAST(ord AS BIGINT) AS ord,
               CAST(level AS BIGINT) AS level, parent_ord,
               CAST(row_number() OVER (
                   PARTITION BY doc_id, level,
                                coalesce(parent_ord, -1)
                   ORDER BY ord) AS BIGINT) AS sib_idx,
               text
        FROM parented
    """


def q_pipeline_toc(spark: SparkSession, span_seq: DataFrame) -> DataFrame:
    span_seq.createOrReplaceTempView("toc_spans_src")
    return spark.sql(toc_sql("toc_spans_src"))
