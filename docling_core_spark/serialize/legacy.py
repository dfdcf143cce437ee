"""Legacy DsDocument (ExportedCCSDocument) JSON writer.

Semantic mirror of `docling_document_to_legacy`
(docling_core/utils/legacy.py:108-351), producing the legacy dict
exactly as the reference's
`model_dump(mode="json", by_alias=True, exclude_none=True)` renders it.

Mirrored behaviors, including the reference's quirks:
  - body iterated in reading order, groups skipped; key-value / form
    items silently dropped (no isinstance branch in the reference);
  - captions embedded in floating items are STILL emitted in main-text
    (the reference's `continue` guard sits at the end of the text
    branch and is dead code, legacy.py:185-187);
  - list items render "marker text" but the prov charspan length uses
    the UNprefixed text;
  - tables serialize a dense grid: plain body cells where nothing is
    painted, GLM cells (with row/col spans and header flags) where a
    sparse cell covers the position; the same GLM cell is painted over
    every covered grid position;
  - figure prov charspan = [0, len(caption)]; caption text is the
    concatenation of caption texts with NO delimiter
    (document.py:993-998);
  - document hash = sha256 of str(binary_hash) when origin exists, else
    sha256 of a fresh uuid4 (nondeterministic — same as the reference);
    page hashes = sha256(f"{document_hash}:{page_no-1}").
"""

from __future__ import annotations

import hashlib
import uuid
from typing import List, Optional

from ..model import doc as D
from ..model import labels as L

_LEGACY_TYPE = {
    L.TITLE: "title",
    L.DOCUMENT_INDEX: "table-of-contents",
    L.SECTION_HEADER: "subtitle-level-1",
    L.CHECKBOX_SELECTED: "checkbox-selected",
    L.CHECKBOX_UNSELECTED: "checkbox-unselected",
    L.CAPTION: "caption",
    L.PAGE_HEADER: "page-header",
    L.PAGE_FOOTER: "page-footer",
    L.FOOTNOTE: "footnote",
    L.TABLE: "table",
    L.FORMULA: "equation",
    L.LIST_ITEM: "paragraph",
    L.CODE: "paragraph",
    L.PICTURE: "figure",
    L.TEXT: "paragraph",
    "paragraph": "paragraph",
}

_LEGACY_NAME = {
    L.CAPTION: "Caption",
    L.FOOTNOTE: "Footnote",
    L.FORMULA: "Formula",
    L.LIST_ITEM: "List-item",
    L.PAGE_FOOTER: "Page-footer",
    L.PAGE_HEADER: "Page-header",
    L.PICTURE: "Picture",
    L.SECTION_HEADER: "Section-header",
    L.TABLE: "Table",
    L.TEXT: "Text",
    L.TITLE: "Title",
    L.DOCUMENT_INDEX: "Document Index",
    L.CODE: "Code",
    L.CHECKBOX_SELECTED: "Checkbox-Selected",
    L.CHECKBOX_UNSELECTED: "Checkbox-Unselected",
    "form": "Form",
    "key_value_region": "Key-Value Region",
    "paragraph": "paragraph",
}


def _ltype(label: str) -> str:
    return _LEGACY_TYPE.get(label, label)


def _lname(label: str) -> str:
    return _LEGACY_NAME.get(label, label)


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8"), usedforsecurity=False).hexdigest()


def _bbox_tuple(box: dict) -> List[float]:
    """BoundingBox.as_tuple parity (base.py:330-345): BOTTOMLEFT swaps
    t/b so the tuple is (l, b, r, t). Accepts the engine's flat bbox
    keys (l/t/r/b/coord_origin) as used in prov dicts and table cells."""
    if box.get("coord_origin") == L.COORD_BOTTOMLEFT:
        return [box["l"], box["b"], box["r"], box["t"]]
    return [box["l"], box["t"], box["r"], box["b"]]


def _provs(item: dict, span_len: int) -> List[dict]:
    return [
        {
            "bbox": _bbox_tuple(p),
            "page": p["page_no"],
            "span": [0, span_len],
        }
        for p in item.get("prov", [])
    ]


def _caption_text(doc: dict, item: dict) -> str:
    text = ""
    for ref in item.get("captions", []):
        cap = D.resolve(doc, ref)
        if cap is not None:
            text += cap.get("text", "")
    return text


def _legacy_table(doc: dict, item: dict) -> dict:
    data = item["data"]
    nrows, ncols = data["num_rows"], data["num_cols"]
    grid = [
        [
            {"spans": [[i, j]], "text": "", "type": "body"}
            for j in range(ncols)
        ]
        for i in range(nrows)
    ]
    for cell in data["table_cells"]:
        r0 = min(cell["start_row_offset_idx"], nrows)
        r1 = min(cell["end_row_offset_idx"], nrows)
        c0 = min(cell["start_col_offset_idx"], ncols)
        c1 = min(cell["end_col_offset_idx"], ncols)
        celltype = "body"
        if cell.get("column_header"):
            celltype = "col_header"
        elif cell.get("row_header"):
            celltype = "row_header"
        elif cell.get("row_section"):
            celltype = "row_section"
        spans = [[r, c] for r in range(r0, r1) for c in range(c0, c1)]
        for i in range(r0, r1):
            for j in range(c0, c1):
                glm = {
                    "spans": spans,
                    "text": cell.get("text", ""),
                    "type": celltype,
                    "col": j,
                    "col-header": bool(cell.get("column_header")),
                    "col-span": [
                        cell["start_col_offset_idx"],
                        cell["end_col_offset_idx"],
                    ],
                    "row": i,
                    "row-header": bool(cell.get("row_header")),
                    # GlmTableCell silently drops the row_section kwarg
                    # (no such field on the legacy model)
                    "row-span": [
                        cell["start_row_offset_idx"],
                        cell["end_row_offset_idx"],
                    ],
                }
                if cell.get("bbox") is not None:
                    glm["bbox"] = _bbox_tuple(cell["bbox"])
                grid[i][j] = glm
    caption = _caption_text(doc, item)
    return {
        "prov": [
            {
                "bbox": _bbox_tuple(p),
                "page": p["page_no"],
                "span": [0, 0],
            }
            for p in item.get("prov", [])
        ],
        "text": caption,
        "type": _ltype(item["label"]),
        "#-cols": ncols,
        "#-rows": nrows,
        "data": grid,
    }


def doc_to_legacy(doc: dict, fallback_filename: str = "file") -> dict:
    """Convert the engine document dict to the legacy JSON dict."""
    origin = doc.get("origin")
    if origin is not None:
        document_hash = _sha(str(origin["binary_hash"]))
        filename = origin["filename"]
    else:
        document_hash = _sha(str(uuid.uuid4()))
        filename = fallback_filename

    pages = list(doc.get("pages", {}).values())
    page_hashes = [
        {
            "hash": _sha(f"{document_hash}:{p['page_no'] - 1}"),
            "model": "default",
            "page": p["page_no"],
        }
        for p in pages
    ]

    main_text: List[dict] = []
    tables: List[dict] = []
    figures: List[dict] = []

    for item, _level in D.iterate_items(doc):
        kind = item.get("kind")
        label = item.get("label")
        if kind == "texts":
            marker = item.get("marker") or ""
            raw = item.get("text", "")
            text = f"{marker} {raw}" if (
                label == L.LIST_ITEM and marker
            ) else raw
            main_text.append(
                {
                    "prov": _provs(item, len(raw)),
                    "text": text,
                    "type": _ltype(label),
                    "name": _lname(label),
                }
            )
        elif kind == "tables" and item.get("data"):
            main_text.append(
                {
                    "name": _lname(label),
                    "type": _ltype(label),
                    "$ref": f"#/tables/{len(tables)}",
                }
            )
            tables.append(_legacy_table(doc, item))
        elif kind == "pictures":
            main_text.append(
                {
                    "name": _lname(label),
                    "type": _ltype(label),
                    "$ref": f"#/figures/{len(figures)}",
                }
            )
            caption = _caption_text(doc, item)
            figures.append(
                {
                    "prov": _provs(item, len(caption)),
                    "text": caption,
                    "type": _ltype(label),
                }
            )

    return {
        "_name": "",
        "type": "pdf-document",
        "description": {"logs": []},
        "file-info": {
            "filename": filename,
            "document-hash": document_hash,
            "#-pages": len(pages),
            "page-hashes": page_hashes,
        },
        "main-text": main_text,
        "equations": [],
        "footnotes": [],
        "page-headers": [],
        "page-footers": [],
        "tables": tables,
        "figures": figures,
        "page-dimensions": [
            {
                "height": p["height"],
                "page": p["page_no"],
                "width": p["width"],
            }
            for p in pages
        ],
    }
