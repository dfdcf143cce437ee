"""Spark StructTypes for the engine's tables (SURVEY.md §1.7)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),
    ]
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

OUT_SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("order", IntegerType(), False),
    ]
)

# flattened item row (relational surface; the hot path keeps items nested)
ITEM_TYPE = StructType(
    [
        StructField("self_ref", StringType(), False),
        StructField("parent_ref", StringType(), True),
        StructField("kind", StringType(), False),
        StructField("label", StringType(), True),
        StructField("content_layer", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("level", IntegerType(), True),
        StructField("enumerated", BooleanType(), True),
        StructField("marker", StringType(), True),
        StructField("page_no", IntegerType(), True),
        StructField("n_children", IntegerType(), True),
    ]
)

PIPELINE_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_seq", ArrayType(OUT_SPAN_TYPE), False),
        StructField("markdown", StringType(), False),
        StructField("doctags", StringType(), False),
        StructField("html", StringType(), False),
        StructField("etree", StringType(), False),
        StructField("n_items", IntegerType(), False),
        StructField("n_pages", IntegerType(), False),
        StructField("tree_valid", BooleanType(), False),
        StructField("n_violations", IntegerType(), False),
        # vectorized constraint-checker breakdown (model/validate.py);
        # map keeps the category set extensible without schema churn
        StructField(
            "violations", MapType(StringType(), IntegerType()), False
        ),
        StructField("n_normalized_lists", IntegerType(), False),
        StructField("n_spans_in", IntegerType(), False),
        StructField("parse_anomalies", IntegerType(), False),
    ]
)

CHUNK_TYPE = StructType(
    [
        StructField("text", StringType(), False),
        StructField("headings", ArrayType(StringType()), True),
        StructField("item_refs", ArrayType(StringType()), False),
        StructField("chunk_idx", IntegerType(), False),
    ]
)

LEDGER_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("run_id", StringType(), False),
        StructField("doc_count", LongType(), False),
        StructField("fail_count", LongType(), False),
        StructField("span_count", LongType(), False),
        StructField("wall_sec", DoubleType(), False),
        StructField("status", StringType(), False),
        StructField("input_signature", StringType(), False),
    ]
)
