"""Vectorized constraint checker: clean docs validate to zero; each
corruption category is detected independently."""

from docling_core_spark.fixtures import gen_spans
from docling_core_spark.model import doc as D
from docling_core_spark.model.validate import validate_doc, violations_total
from docling_core_spark.parse.spans import parse_span_doc


def _doc(did="doc-00000003"):
    doc, _ = parse_span_doc(did, gen_spans(did))
    return doc


def test_clean_docs_validate_to_zero():
    for i in range(12):
        doc = _doc(f"doc-{i:08d}")
        v = validate_doc(doc)
        assert violations_total(v) == 0, (f"doc-{i:08d}", v)


def test_broken_tree_detected():
    doc = _doc()
    doc["texts"][0]["parent"] = "#/texts/1"  # parent doesn't list it
    v = validate_doc(doc)
    assert v["broken_tree"] >= 1


def test_dangling_ref_detected():
    doc = _doc()
    doc["body"]["children"].append("#/texts/9999")
    doc["texts"][0]["children"] = ["#/texts/9999"]
    v = validate_doc(doc)
    assert v["dangling_ref"] >= 1


def test_bad_label_detected():
    doc = _doc()
    doc["texts"][0]["label"] = "not_a_label"
    assert validate_doc(doc)["bad_label"] == 1


def test_bad_layer_detected():
    doc = _doc()
    doc["texts"][0]["content_layer"] = "mezzanine"
    assert validate_doc(doc)["bad_layer"] == 1


def test_bad_graph_link_detected():
    doc = _doc()
    D.add_key_values(
        doc,
        {
            "cells": [
                {"label": "key", "cell_id": 0, "text": "k", "orig": "k"}
            ],
            "links": [
                {"label": "to_value", "source_cell_id": 0,
                 "target_cell_id": 99}
            ],
        },
    )
    assert validate_doc(doc)["bad_graph_link"] == 1


def test_bad_table_shape_detected():
    from docling_core_spark.model import table as T

    doc = _doc()
    data = T.new_table_data(
        [T.new_cell("x", start_row=0, end_row=5, start_col=0, end_col=1)],
        num_rows=2, num_cols=2,
    )
    D.add_table(doc, data)
    assert validate_doc(doc)["bad_table_shape"] == 1


def test_bad_prov_detected():
    doc = _doc()
    doc["texts"][0]["prov"] = [
        {"page_no": 999, "l": 0, "t": 0, "r": 1, "b": 1,
         "coord_origin": "TOPLEFT", "charspan": (0, 1)}
    ]
    assert validate_doc(doc)["bad_prov"] == 1


def test_bad_version_detected():
    doc = _doc()
    doc["version"] = "9.0.0"
    assert validate_doc(doc)["bad_version"] == 1


def test_bad_caption_ref_detected():
    doc = _doc()
    pic = D.add_picture(doc)
    pic["captions"].append("#/texts/0")  # texts/0 is not a caption
    assert validate_doc(doc)["bad_caption_ref"] >= 1


def test_pipeline_emits_violation_map(spark):
    from pyspark.sql import functions as F

    from docling_core_spark.pipeline import run_pipeline, synth_docs

    out = run_pipeline(synth_docs(spark, 8, partitions=2))
    row = out.agg(
        F.sum(F.element_at("violations", F.lit("broken_tree"))).alias("bt"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row["bt"] == 0
    assert row["n"] > 0
