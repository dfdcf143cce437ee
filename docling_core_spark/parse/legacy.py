"""Legacy DsDocument (ExportedCCSDocument) JSON reader.

Semantic mirror of `legacy_to_docling_document`
(docling_core/utils/legacy.py:352-633) operating directly on the raw
legacy JSON dict (keys: `_name`, `main-text`, `figures`, `tables`,
`equations`, `footnotes`, `page-headers`, `page-footers`,
`page-dimensions`, `file-info`), producing our dict document model.

Mirrored behaviors, including the reference's quirks:
  - only the FIRST legacy prov entry survives, bbox parsed BOTTOMLEFT
    with the from_tuple corner normalization (base.py:111-135);
  - captions embedded in figure/table objects (matched by TEXT
    equality) are suppressed in the main flow and re-attached to their
    floating item by main-text index;
  - the list-grouping condition uses the reference's literal substring
    test `item_type in "list-item-level-1"` (so e.g. "list-item"
    matches as a substring) plus name in {list, list-item};
  - page headers/footers lose their provenance (the reference computes
    `prov` then never passes it, legacy.py:396-417);
  - subtitle-level-1 -> level-1 heading; unknown text types fall back
    to DocItemLabel by normalized name else TEXT;
  - table cells: per-grid-position cells unless `spans` are present, in
    which case the span envelope is used and repeated spans are
    emitted once;
  - origin: mimetype application/pdf, binary hash = uint64 mask of the
    hex document-hash (document.py:432-446).

The writer direction (docling -> legacy) lives in
`serialize/legacy.py` (round-trip parity with the reference's
`docling_document_to_legacy`, tests/test_legacy_write.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ..model import doc as D
from ..model import labels as L
from ..model import table as T


def _bbox_bl_from_tuple(coord) -> dict:
    l, b, r, t = coord[0], coord[1], coord[2], coord[3]
    if r < l:
        l, r = r, l
    if b > t:
        b, t = t, b
    return {"l": l, "t": t, "r": r, "b": b,
            "coord_origin": L.COORD_BOTTOMLEFT}


def _prov(item: dict) -> Optional[List[dict]]:
    provs = item.get("prov") or []
    if not provs:
        return None
    p = provs[0]
    bb = _bbox_bl_from_tuple(tuple(p["bbox"]))
    return [
        {
            "page_no": int(p["page"]),
            "charspan": tuple(p.get("span") or (0, 0)),
            **bb,
        }
    ]


def _resolve_ref(legacy: dict, item: dict):
    """legacy_doc._resolve_ref (legacy_doc/document.py:402-425).

    Returns (resolved_item, collection): collection is None for inline
    BaseText entries, else the name of the array the ref resolved into.
    The reference discriminates by Pydantic CLASS of the resolved object
    (a `figures[]` entry is a Figure whatever its `type` string says —
    resolved figures carry type "picture"); the collection plays that
    role here."""
    ref = item.get("$ref") or item.get("__ref")
    if ref is None:
        return item, None  # inline BaseText
    obj_type = item.get("type")
    coll = {
        "table": "tables",
        "figure": "figures",
        "equation": "equations",
        "footnote": "footnotes",
    }.get(obj_type)
    arr = legacy.get(coll) if coll else None
    if not arr:
        return None, None
    try:
        return arr[int(ref.split("/")[2])], coll
    except (IndexError, ValueError):
        return None, None


def legacy_to_doc(legacy: dict) -> dict:
    """Raw legacy JSON dict -> engine document dict."""
    file_info = legacy.get("file-info") or {}
    filename = file_info.get("filename", "file")
    doc_name = filename.rsplit(".", 1)[0] if "." in filename else filename
    doc = D.new_doc(name=doc_name)
    doc_hash = file_info.get("document-hash")
    doc["origin"] = {
        "mimetype": "application/pdf",
        "filename": filename,
        "binary_hash": (
            int(doc_hash, 16) & 0xFFFFFFFFFFFFFFFF if doc_hash else 0
        ),
    }

    for page_dim in legacy.get("page-dimensions") or []:
        D.add_page(
            doc, int(page_dim["page"]), page_dim["width"],
            page_dim["height"],
        )

    # page headers/footers: furniture, provenance dropped (reference
    # computes but never passes it, legacy.py:396-417)
    for text_item in legacy.get("page-headers") or []:
        if text_item.get("text") is None:
            continue
        D.add_text(doc, L.PAGE_HEADER, text_item["text"],
                   content_layer=L.LAYER_FURNITURE)
    for text_item in legacy.get("page-footers") or []:
        if text_item.get("text") is None:
            continue
        D.add_text(doc, L.PAGE_FOOTER, text_item["text"],
                   content_layer=L.LAYER_FURNITURE)
    for text_item in legacy.get("footnotes") or []:
        if text_item.get("text") is None:
            continue
        D.add_text(doc, L.FOOTNOTE, text_item["text"],
                   parent=doc["furniture"], prov=_prov(text_item))

    main_text = legacy.get("main-text") or []

    # captions embedded in floating objects, by text equality
    embedded_captions: Dict[str, int] = {}
    for ix, orig in enumerate(main_text):
        item, coll = _resolve_ref(legacy, orig)
        if item is None:
            continue
        if coll in ("tables", "figures") and item.get("text"):
            embedded_captions[item["text"]] = ix

    floating_to_caption: Dict[int, dict] = {}
    for ix, orig in enumerate(main_text):
        item, coll = _resolve_ref(legacy, orig)
        if item is None:
            continue
        item_type = (item.get("type") or "").lower()
        name = item.get("name")
        if (
            coll in (None, "footnotes")
            and (
                item_type == "caption"
                or (name is not None and name.lower() == "caption")
            )
            and item.get("text") in embedded_captions
        ):
            floating_to_caption[embedded_captions[item["text"]]] = item

    current_list: Optional[dict] = None
    for ix, orig in enumerate(main_text):
        item, coll = _resolve_ref(legacy, orig)
        if item is None:
            continue
        prov = _prov(item)
        item_type = (item.get("type") or "").lower()
        label_name = item.get("name") or "text"

        is_text = coll in (None, "footnotes")
        if is_text and (
            item_type in "list-item-level-1"
            or item.get("name") in {"list", "list-item"}
        ):
            if current_list is None:
                current_list = D.add_group(
                    doc, label=L.GROUP_LIST, name="list"
                )
        else:
            current_list = None

        if is_text:
            text = item.get("text") or ""

            if item_type == "caption":
                if text in embedded_captions:
                    continue
                D.add_text(doc, L.TEXT, text, prov=prov)

            if item_type == "title":
                D.add_title(doc, text, prov=prov)
            elif item_type in {"subtitle-level-1"}:
                D.add_heading(doc, text, prov=prov)
            elif item_type in "list-item-level-1" or label_name in {
                "list", "list-item",
            }:
                D.add_list_item(
                    doc, text, enumerated=False, prov=prov,
                    parent=current_list, marker="-",
                )
            else:
                label = L.TEXT
                normalized = label_name.replace("-", "_")
                if normalized in L.DOC_ITEM_LABELS:
                    label = normalized
                # reference add_text defaults content_layer to BODY even
                # for page_header/footer labels here (legacy.py:536)
                D.add_text(doc, label, text, prov=prov,
                           content_layer=L.LAYER_BODY)

        elif coll == "tables":
            data = T.new_table_data(
                [], item.get("#-rows", 0), item.get("#-cols", 0)
            )
            if item.get("data") is not None:
                seen_spans = set()
                for row_ix, row in enumerate(item["data"]):
                    for col_ix, cdata in enumerate(row):
                        cell = T.new_cell(
                            text=cdata.get("text", ""),
                            start_row=row_ix, end_row=row_ix + 1,
                            start_col=col_ix, end_col=col_ix + 1,
                            column_header=cdata.get("type") == "col_header",
                            row_header=cdata.get("type") == "row_header",
                            row_section=cdata.get("type") == "row_section",
                            bbox=(
                                _bbox_bl_from_tuple(tuple(cdata["bbox"]))
                                if cdata.get("bbox") is not None
                                else None
                            ),
                        )
                        if cdata.get("spans") is not None:
                            spans_tuple = tuple(
                                tuple(s) for s in cdata["spans"]
                            )
                            if spans_tuple in seen_spans:
                                continue
                            seen_spans.add(spans_tuple)
                            sr = min(s[0] for s in spans_tuple)
                            er = max(s[0] for s in spans_tuple) + 1
                            sc = min(s[1] for s in spans_tuple)
                            ec = max(s[1] for s in spans_tuple) + 1
                            cell.update(
                                start_row_offset_idx=sr,
                                end_row_offset_idx=er,
                                start_col_offset_idx=sc,
                                end_col_offset_idx=ec,
                                row_span=er - sr,
                                col_span=ec - sc,
                            )
                        data["table_cells"].append(cell)
            new_item = D.add_table(doc, data, prov=prov)
            _attach_caption(doc, new_item, floating_to_caption.get(ix))

        elif coll == "figures":
            new_item = D.add_picture(doc, prov=prov)
            _attach_caption(doc, new_item, floating_to_caption.get(ix))

        elif coll == "equations" and item.get("text") is not None and \
                item_type in ("formula", "equation"):
            D.add_text(doc, L.FORMULA, item["text"], prov=prov)

    return doc


def _attach_caption(doc: dict, owner: dict, caption_item) -> None:
    if caption_item is None or caption_item.get("text") is None:
        return
    cap = D.add_text(
        doc, L.CAPTION, caption_item["text"], prov=_prov(caption_item),
        parent=owner,
    )
    owner["captions"].append(cap["self_ref"])
