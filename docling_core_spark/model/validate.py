"""Vectorized constraint checker: the reference's Pydantic validator
semantics as a pure function producing violation COUNTS, not exceptions.

Reference validators mirrored (SURVEY.md §1.5):
  - tree consistency: every child's parent ref points back
    (validate_tree, document.py:2669-2678) + every ref resolves;
  - label allowlists per array (the discriminated unions,
    document.py:1591-1604 — e.g. a group label on a text item is a
    schema violation);
  - content_layer enum (document.py:621-629);
  - GraphData link integrity: every link endpoint is a known cell_id
    (document.py:1518-1536);
  - TableData shape: cell offsets within num_rows/num_cols and
    start < end (document.py:291-373);
  - provenance sanity: page_no exists in pages, charspan start <= end;
  - version compatibility (document.py:4261-4277);
  - caption refs resolve to caption-labeled texts (document.py:767-798).

At 10^12 docs bad documents are DATA: the checker's output feeds the
pipeline's metric columns and the quarantine split
(`violations_total > 0`), never a Python exception.
"""

from __future__ import annotations

from typing import Dict

from . import doc as D
from . import labels as L

_ARRAY_LABELS = {
    "texts": L.DOC_ITEM_LABELS,
    "groups": L.GROUP_LABELS,
    "tables": frozenset({L.TABLE, L.DOCUMENT_INDEX}),
    "pictures": frozenset({L.PICTURE, L.CHART}),
    "key_value_items": frozenset({L.KEY_VALUE_REGION}),
    "form_items": frozenset({L.FORM}),
}

_ITEM_ARRAYS = tuple(_ARRAY_LABELS)


def validate_doc(doc: dict) -> Dict[str, int]:
    """Return violation counts by category (all zero = valid)."""
    v = {
        "bad_version": 0,
        "broken_tree": 0,
        "dangling_ref": 0,
        "bad_label": 0,
        "bad_layer": 0,
        "bad_graph_link": 0,
        "bad_table_shape": 0,
        "bad_prov": 0,
        "bad_caption_ref": 0,
    }

    if not D.check_version_compatible(doc.get("version", "0.0.0")):
        v["bad_version"] += 1

    if not D.validate_tree(doc, doc["body"]):
        v["broken_tree"] += 1
    if not D.validate_tree(doc, doc["furniture"]):
        v["broken_tree"] += 1

    pages = doc.get("pages", {})

    for arr in _ITEM_ARRAYS:
        allow = _ARRAY_LABELS[arr]
        for item in doc[arr]:
            if item.get("label") not in allow:
                v["bad_label"] += 1
            if item.get("content_layer") not in L.CONTENT_LAYERS:
                v["bad_layer"] += 1
            parent = item.get("parent")
            if parent is not None and D.resolve(doc, parent) is None:
                v["dangling_ref"] += 1
            for c in item.get("children", []):
                if D.resolve(doc, c) is None:
                    v["dangling_ref"] += 1
            for cap_ref in item.get("captions", []) or []:
                cap = D.resolve(doc, cap_ref)
                if cap is None or cap.get("label") != L.CAPTION:
                    v["bad_caption_ref"] += 1
            for prov in item.get("prov", []) or []:
                cs = prov.get("charspan", (0, 0))
                if prov.get("page_no") not in pages or cs[0] > cs[1]:
                    v["bad_prov"] += 1

    for arr in ("key_value_items", "form_items"):
        for item in doc[arr]:
            graph = item.get("graph") or {}
            cell_ids = {
                c.get("cell_id") for c in graph.get("cells", [])
            }
            for link in graph.get("links", []):
                if (
                    link.get("source_cell_id") not in cell_ids
                    or link.get("target_cell_id") not in cell_ids
                ):
                    v["bad_graph_link"] += 1

    for item in doc["tables"]:
        data = item.get("data") or {}
        nr, nc = data.get("num_rows", 0), data.get("num_cols", 0)
        for cell in data.get("table_cells", []):
            if not (
                0 <= cell["start_row_offset_idx"]
                < cell["end_row_offset_idx"] <= nr
                and 0 <= cell["start_col_offset_idx"]
                < cell["end_col_offset_idx"] <= nc
            ):
                v["bad_table_shape"] += 1

    return v


def violations_total(v: Dict[str, int]) -> int:
    return sum(v.values())
