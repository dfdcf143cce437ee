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

def _level(col: str) -> str:
    """Header level from the span kind. The reference's span kind for
    section headers is the flat DocItemLabel value 'section_header'
    (document.py DocItemLabel) — the SectionHeaderItem level attribute
    does not survive into the (kind, text, media_ref, order) span
    tuple, so every section header enters the outline at level 1 under
    the title; a leveled 'section_header_level_N' kind (future parse
    variants) parses its suffix."""
    return (
        f"CASE WHEN {col} = 'title' THEN 0"
        f" WHEN {col} = 'section_header' THEN 1"
        f" ELSE CAST(substring({col}, 22) AS INT) END"
    )


_LEVEL = _level("kind")

_IS_HDR = (
    "kind = 'title' OR kind = 'section_header'"
    " OR kind LIKE 'section_header_level_%'"
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
            WHERE {_IS_HDR}
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


def sections_sql(src: str) -> str:
    """Dialect-identical section segmentation over a span table: every
    span is assigned to its governing section (the nearest preceding
    header span, title or section_header); per (doc, section) the
    table reports span counts, text mass and the ord range — the
    section-boundary table a RAG splitter or section-aware chunk
    budgeter consumes. Preamble spans before any header form section
    -1.

    100 TB story: one running-max window per doc (uniform doc_id
    partitions, bounded spans/doc), one map-side-combinable groupBy,
    and a header-info join keyed by (doc_id, ord) at section-count
    size. No self-join, no recursion."""
    return f"""
        WITH spans AS (
            SELECT doc_id, ord, kind, text FROM {src}
        ),
        assigned AS (
            SELECT doc_id, ord, kind, text,
                   max(CASE WHEN {_IS_HDR} THEN ord END) OVER (
                       PARTITION BY doc_id ORDER BY ord
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sec_ord
            FROM spans
        ),
        agg AS (
            SELECT doc_id,
                   CAST(coalesce(sec_ord, -1) AS BIGINT) AS section_ord,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(CASE WHEN kind = 'text'
                                   OR kind = 'paragraph'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_text_spans,
                   CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                       AS sum_chars,
                   CAST(min(ord) AS BIGINT) AS first_ord,
                   CAST(max(ord) AS BIGINT) AS last_ord
            FROM assigned
            GROUP BY doc_id, coalesce(sec_ord, -1)
        )
        SELECT a.doc_id, a.section_ord,
               CAST(CASE WHEN a.section_ord = -1 THEN -1
                         ELSE {_level('h.kind')} END AS BIGINT) AS level,
               a.n_spans, a.n_text_spans, a.sum_chars,
               a.first_ord, a.last_ord
        FROM agg a
        LEFT JOIN spans h
          ON h.doc_id = a.doc_id AND h.ord = a.section_ord
    """


def q_pipeline_sections(
    spark: SparkSession, span_seq: DataFrame
) -> DataFrame:
    span_seq.createOrReplaceTempView("sections_spans_src")
    return spark.sql(sections_sql("sections_spans_src"))
