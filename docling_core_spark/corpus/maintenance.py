"""Table-maintenance planning: the small-file compaction plan an
Iceberg/Delta table needs after streaming ingest (many under-sized data
files per partition degrade scan parallelism and planning time — the
problem `rewrite_data_files` exists to solve).

The planner consumes the table's FILE MANIFEST — metadata-scale input
(one row per data file; ~1e6-1e8 rows for a 100 TB table), never the
data — and emits one row per output bin: which contiguous run of files
each compaction task rewrites. Binning is greedy sequential WITHIN each
(source, lang) partition, matching how real table formats compact
(cross-partition merges would break partition pruning).

In this sandbox the manifest is synthesized deterministically from the
documents table (a "file" = a 256-doc_id-wide chunk of a partition,
bytes = its exact char mass); a production run reads the real manifest
and keeps everything below identical.

Reference analog: none (docling-core has no table layer; SURVEY.md
§2.8 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread

COMPACT_TARGET_BYTES = 1 << 19  # 512 KiB target bin at test scale
_FILE_CHUNK = 256               # doc_ids per synthesized "file"


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) greedy sequential bin packing of the file
    manifest: files ordered by chunk id, cumulative byte mass BEFORE
    each file decides its bin (floor(cum_before / target) — a file
    larger than the target gets its own bin and the next file starts
    fresh, the standard greedy-FFD-on-sorted-order compromise that
    keeps every bin a CONTIGUOUS file run, so each compaction task
    reads sequentially).

    100 TB story: the input is the manifest, not the data; the only
    window partitions by (source, lang) over that partition's file
    rows — bounded by files-per-partition (what the compactor itself
    bounds), never by document mass; the rollup is a map-side-combined
    groupBy on the (source, lang, bin) key. No global window, no
    corpus-sized shuffle."""
    docs = read_spread(spark, sf_dir, "documents")
    files = docs.groupBy(
        "source",
        "lang",
        F.expr(f"doc_id div {_FILE_CHUNK}").alias("chunk"),
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bytes"),
    )
    binned = files.select(
        "source",
        "lang",
        "chunk",
        "n_docs",
        "bytes",
        # integer div on the BIGINT cumulative mass — matches DuckDB's
        # // exactly (all values non-negative, no float step at all)
        F.expr(
            f"coalesce(sum(bytes) over (partition by source, lang"
            f" order by chunk rows between unbounded preceding"
            f" and 1 preceding), 0) div {COMPACT_TARGET_BYTES}"
        ).cast("bigint").alias("bin"),
    )
    return binned.groupBy("source", "lang", "bin").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.min("chunk").cast("bigint").alias("first_chunk"),
        F.max("chunk").cast("bigint").alias("last_chunk"),
    )


def sql_compaction_plan() -> str:
    return f"""
        WITH files AS (
            SELECT source, lang, doc_id // {_FILE_CHUNK} AS chunk,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(n_chars)::BIGINT AS bytes
            FROM documents GROUP BY 1, 2, 3
        ),
        binned AS (
            SELECT source, lang, chunk, n_docs, bytes,
                   (COALESCE(SUM(bytes) OVER (
                        PARTITION BY source, lang ORDER BY chunk
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0)
                    // {COMPACT_TARGET_BYTES})::BIGINT AS bin
            FROM files
        )
        SELECT source, lang, bin,
               COUNT(*)::BIGINT AS n_files,
               SUM(n_docs)::BIGINT AS n_docs,
               SUM(bytes)::BIGINT AS total_bytes,
               MIN(chunk)::BIGINT AS first_chunk,
               MAX(chunk)::BIGINT AS last_chunk
        FROM binned GROUP BY 1, 2, 3
    """
