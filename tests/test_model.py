"""Unit tests for the dict document model: tree ops, mutations,
normalization, OTSL, version gates."""

import pytest

from docling_core_spark.model import doc as D
from docling_core_spark.model import labels as L
from docling_core_spark.model import table as T


def _mini_doc():
    doc = D.new_doc("t")
    D.add_title(doc, "Title")
    D.add_heading(doc, "H1", level=1)
    D.add_text(doc, L.TEXT, "para one")
    g = D.add_list_group(doc)
    D.add_list_item(doc, "a", parent=g)
    D.add_list_item(doc, "b", parent=g)
    return doc


def test_iterate_reading_order():
    doc = _mini_doc()
    labels = [i["label"] for i, _ in D.iterate_items(doc)]
    assert labels == ["title", "section_header", "text", "list_item",
                      "list_item"]
    with_groups = [i["self_ref"] for i, _ in D.iterate_items(doc,
                                                             with_groups=True)]
    assert with_groups[0] == "#/body"
    assert "#/groups/0" in with_groups


def test_validate_tree_rejects_bad_parent():
    doc = _mini_doc()
    assert D.validate_tree(doc, doc["body"])
    # corrupt: child points elsewhere (parity: _construct_bad_doc,
    # test_docling_doc.py:736-750)
    doc["texts"][1]["parent"] = "#/texts/0"
    assert not D.validate_tree(doc, doc["body"])


def test_delete_items_renumbers_refs():
    doc = _mini_doc()
    D.delete_items(doc, ["#/texts/1"])  # delete the heading
    assert len(doc["texts"]) == 4
    # remaining refs are dense and tree-consistent
    assert [t["self_ref"] for t in doc["texts"]] == [
        f"#/texts/{i}" for i in range(4)
    ]
    assert D.validate_tree(doc, doc["body"])
    labels = [i["label"] for i, _ in D.iterate_items(doc)]
    assert labels == ["title", "text", "list_item", "list_item"]


def test_delete_group_deletes_descendants():
    doc = _mini_doc()
    D.delete_items(doc, ["#/groups/0"])
    assert len(doc["groups"]) == 0
    assert all(t["label"] != "list_item" for t in doc["texts"])
    assert D.validate_tree(doc, doc["body"])


def test_misplaced_list_normalization():
    doc = D.new_doc("t")
    D.add_text(doc, L.TEXT, "before")
    D.add_list_item(doc, "m1")
    D.add_list_item(doc, "m2")
    D.add_text(doc, L.TEXT, "after")
    n = D.normalize_misplaced_list_items(doc)
    assert n == 1
    assert len(doc["groups"]) == 1
    assert doc["groups"][0]["label"] == L.GROUP_LIST
    order = [
        (i.get("label"), i.get("text", "")) for i, _ in D.iterate_items(doc)
    ]
    assert order == [
        ("text", "before"), ("list_item", "m1"), ("list_item", "m2"),
        ("text", "after"),
    ]
    assert D.validate_tree(doc, doc["body"])


def test_misplaced_ordered_items_get_ordered_group():
    doc = D.new_doc("t")
    D.add_list_item(doc, "one", enumerated=True, marker="1.")
    D.normalize_misplaced_list_items(doc)
    assert doc["groups"][0]["label"] == L.GROUP_ORDERED_LIST


def test_version_gate():
    assert D.check_version_compatible("1.4.0")
    assert D.check_version_compatible("1.0.0")
    assert not D.check_version_compatible("2.0.0")
    assert not D.check_version_compatible("1.5.0")
    assert not D.check_version_compatible("garbage")


def test_content_layer_upgrade():
    doc = D.new_doc("t", version="1.0.0")
    D.add_text(doc, L.PAGE_HEADER, "h", content_layer=L.LAYER_BODY)
    D.upgrade_content_layer(doc)
    assert doc["texts"][0]["content_layer"] == L.LAYER_FURNITURE
    assert doc["version"] == D.CURRENT_VERSION


def test_grid_painting_with_spans():
    data = T.new_table_data(
        [
            T.new_cell("A", 0, 2, 0, 1),  # 2-row vertical span
            T.new_cell("B", 0, 1, 1, 3),  # 2-col horizontal span
            T.new_cell("C", 1, 2, 1, 2),
        ],
        num_rows=2,
        num_cols=3,
    )
    g = T.grid(data)
    assert g[0][0]["text"] == "A" and g[1][0]["text"] == "A"
    assert g[0][1]["text"] == "B" and g[0][2]["text"] == "B"
    assert g[1][1]["text"] == "C"
    assert g[1][2]["text"] == ""  # untouched cell stays empty


def test_otsl_roundtrip():
    data = T.new_table_data(
        [
            T.new_cell("h1", 0, 1, 0, 1, column_header=True),
            T.new_cell("h2", 0, 1, 1, 2, column_header=True),
            T.new_cell("v", 1, 3, 0, 1),
            T.new_cell("x", 1, 2, 1, 2),
            T.new_cell("y", 2, 3, 1, 2),
        ],
        num_rows=3,
        num_cols=2,
    )
    otsl = T.export_otsl(data)
    back = T.parse_otsl(otsl)
    assert back["num_rows"] == 3 and back["num_cols"] == 2
    texts = {
        (c["start_row_offset_idx"], c["start_col_offset_idx"]): c["text"]
        for c in back["table_cells"]
    }
    assert texts[(0, 0)] == "h1" and texts[(1, 0)] == "v"
    spans = {
        (c["start_row_offset_idx"], c["start_col_offset_idx"]):
        (c["row_span"], c["col_span"])
        for c in back["table_cells"]
    }
    assert spans[(1, 0)] == (2, 1)


def test_pipe_table_format():
    data = T.new_table_data(
        [
            T.new_cell("h", 0, 1, 0, 1, column_header=True),
            T.new_cell("longer cell", 1, 2, 0, 1),
        ],
        num_rows=2,
        num_cols=1,
    )
    md = T.to_pipe_table(data)
    lines = md.splitlines()
    assert lines[0] == "| h           |"
    assert lines[1] == "|-------------|"
    assert lines[2] == "| longer cell |"
