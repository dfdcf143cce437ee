"""JSONL (newline-delimited JSON) source path with an EXPLICIT schema.

JSONL is the interchange format most crawl/annotation pipelines emit
before anything lands in a table format. Two scale rules enforced here:

 1. NEVER infer the schema. spark.read.json's inference is a full extra
    pass over the data (and samples at best), silently widens types
    between drops, and turns a malformed producer into a schema change
    instead of an error. The schema is declared once (StructType) and
    malformed lines surface in the `_corrupt_record` column instead of
    poisoning the table (PERMISSIVE + explicit corrupt column).
 2. Round-trip losslessly. The gate query stages the documents table as
    JSONL, reads it back through this path, and must reproduce the
    parquet source bit-for-bit (per-row md5 over every column) — the
    invariant that makes JSONL safe as an ingest hop at all.

Reference analog: docling-core loads JSON documents one file at a time
(docling_core/types/doc/document.py `load_from_json`); this is the
table-scale twin for span corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Documents table from JSONL with the declared schema; malformed
    lines land in `_corrupt_record` (count them, don't crash — a 100 TB
    ingest quarantines bad producers, it doesn't abort on line 1)."""
    return (
        spark.read.schema(DOCS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the documents table as JSONL, read it back through the
    explicit-schema path, and emit the per-row digest the parquet
    source must equal: (doc_id, md5 over every column, corrupt flag).
    The DuckDB oracle computes the same digests from the parquet view
    directly, so a gate MATCH proves the JSONL hop is lossless.

    100 TB story: the stage-out is this sandbox's stand-in for the
    upstream producer; the read side is one narrow scan — the digest is
    a per-row expression, no shuffle at all beyond the staging write.
    """
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="jsonl-roundtrip-")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs.write.mode("overwrite").json(f"{base}/docs")
        back = read_documents_jsonl(spark, f"{base}/docs")
        # Null-safe field encoding: concat_ws silently SKIPS nulls (which
        # would both break positional discrimination and diverge from the
        # oracle's || chain, whose result is NULL if any field is). Every
        # field is coalesced to a \x00 sentinel on BOTH sides so a legal
        # JSONL line with a missing/null field still digests losslessly.
        nul = F.lit("\x00")
        out = back.select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.coalesce(F.col("doc_id").cast("string"), nul),
                    F.coalesce(F.col("text"), nul),
                    F.coalesce(F.col("lang"), nul),
                    F.coalesce(F.col("source"), nul),
                    F.coalesce(F.col("n_chars").cast("string"), nul),
                )
            ).alias("row_md5"),
            F.col("_corrupt_record").isNotNull().alias("corrupt"),
        )
        # the staged dir is deleted on return: pin the digest rows
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sql_jsonl_roundtrip() -> str:
    return r"""
        SELECT doc_id,
               md5(coalesce(doc_id::VARCHAR, chr(0)) || chr(31)
                   || coalesce(text, chr(0)) || chr(31)
                   || coalesce(lang, chr(0)) || chr(31)
                   || coalesce(source, chr(0)) || chr(31)
                   || coalesce(n_chars::VARCHAR, chr(0))) AS row_md5,
               FALSE AS corrupt
        FROM documents
    """
