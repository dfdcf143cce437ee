"""DocTags serializer (parity: transforms/serializer/doctags.py +
types/doc/tokens.py).

Emits the `<doctag>...</doctag>` token stream with `<loc_*>` location
quantization (round(rnorm * x / page_w) clamped to [0, rnorm-1],
tokens.py:264-295).
"""

from __future__ import annotations

from typing import List, Optional, Set

from ..model import doc as D
from ..model import labels as L
from ..model import table as T
from .common import (
    DocSerializerState,
    SerParams,
    SerResult,
    ser_result,
    substitute_page_breaks,
)

_CHART_CLASSES = {
    "pie_chart", "bar_chart", "stacked_bar_chart", "line_chart",
    "flow_chart", "scatter_chart", "heatmap",
}

_TOKEN_BY_LABEL = {
    L.CAPTION: "caption",
    L.FOOTNOTE: "footnote",
    L.FORMULA: "formula",
    L.LIST_ITEM: "list_item",
    L.PAGE_FOOTER: "page_footer",
    L.PAGE_HEADER: "page_header",
    L.PICTURE: "picture",
    L.TABLE: "table",
    L.TEXT: "text",
    L.TITLE: "title",
    L.DOCUMENT_INDEX: "document_index",
    L.CODE: "code",
    L.CHECKBOX_SELECTED: "checkbox_selected",
    L.CHECKBOX_UNSELECTED: "checkbox_unselected",
    L.FORM: "form",
    L.KEY_VALUE_REGION: "key_value_region",
    L.PARAGRAPH: "paragraph",
    L.REFERENCE: "reference",
    L.CHART: "chart",
}


def _wrap(text: str, tag: str) -> str:
    return f"<{tag}>{text}</{tag}>"


def _loc_token(val: float, rnorm: int = 500) -> str:
    v = round(rnorm * val)
    v = max(0, min(v, rnorm - 1))
    return f"<loc_{v}>"


def _location_from_bbox(
    l: float, t: float, r: float, b: float, page_w: float, page_h: float
) -> str:
    x0, y0, x1, y1 = l / page_w, t / page_h, r / page_w, b / page_h
    return (
        _loc_token(min(x0, x1))
        + _loc_token(min(y0, y1))
        + _loc_token(max(x0, x1))
        + _loc_token(max(y0, y1))
    )


def _to_top_left(p: dict, page_h: float):
    """bbox to top-left origin (base.py:205-222)."""
    if p.get("coord_origin") == L.COORD_BOTTOMLEFT:
        return p["l"], page_h - p["t"], p["r"], page_h - p["b"]
    return p["l"], p["t"], p["r"], p["b"]


def _get_location_tokens(state: DocSerializerState, item: dict) -> str:
    """Parity: DocItem.get_location_tokens (document.py:775-799)."""
    out = ""
    for prov in item.get("prov", []) or []:
        page = state.doc["pages"].get(prov["page_no"])
        if page is None:
            continue
        l, t, r, b = _to_top_left(prov, page["height"])
        out += _location_from_bbox(
            l, t, r, b, page["width"], page["height"]
        )
    return out


def _delim(state: DocSerializerState) -> str:
    return "" if state.params.minified else "\n"


def _serialize_captions_dt(state: DocSerializerState, item: dict) -> SerResult:
    """DocTags caption wrapper with per-caption locations
    (doctags.py:557-583)."""
    if not item.get("captions"):
        return SerResult()
    cap_res = state.serialize_captions(item)
    if not cap_res.text:
        return SerResult()
    results: List[SerResult] = []
    if state.params.add_location:
        for cap_ref in item["captions"]:
            if cap_ref not in state.excluded:
                cap = (
                    state.shared.resolve(cap_ref)
                    if state.shared is not None
                    else D.resolve(state.doc, cap_ref)
                )
                if cap is not None and D.is_doc_item(cap):
                    results.append(
                        SerResult(text=_get_location_tokens(state, cap))
                    )
    results.append(cap_res)
    text = "".join(r.text for r in results)
    return ser_result(text=_wrap(text, "caption"), span_source=results)


def _text_ser(state: DocSerializerState, item: dict, is_inline_scope: bool) -> SerResult:
    p = state.params
    label = item["label"]
    if label == L.SECTION_HEADER:
        wrap_tag: Optional[str] = f"section_header_level_{item.get('level', 1)}"
    else:
        wrap_tag = _TOKEN_BY_LABEL.get(label, label)
    parts: List[str] = []
    if p.add_location:
        loc = _get_location_tokens(state, item)
        if loc:
            parts.append(loc)
    if p.add_content:
        text_part = item["text"]
        if label == L.CODE:
            lang = item.get("code_language", "unknown")
            text_part = f"<_{lang}_>{text_part}"
        else:
            text_part = text_part.strip()
            if label == L.LIST_ITEM:
                wrap_tag = None  # list handling wraps instead
        if text_part:
            parts.append(text_part)
    if label == L.CODE and item.get("captions"):
        cap_text = _serialize_captions_dt(state, item).text
        if cap_text:
            parts.append(cap_text)
    text = "".join(parts)
    if wrap_tag is not None:
        text = _wrap(text, wrap_tag)
    return ser_result(text=text, span_source=item)


def _table_ser(state: DocSerializerState, item: dict) -> SerResult:
    p = state.params
    res_parts: List[SerResult] = []
    if item["self_ref"] not in state.excluded:
        if p.add_location:
            res_parts.append(
                ser_result(
                    text=_get_location_tokens(state, item), span_source=item
                )
            )
        otsl = T.export_otsl(item["data"], add_cell_text=p.add_content)
        res_parts.append(ser_result(text=otsl, span_source=item))
    cap_res = _serialize_captions_dt(state, item)
    if cap_res.text:
        res_parts.append(cap_res)
    text = "".join(r.text for r in res_parts)
    if text:
        text = _wrap(text, "otsl")
    return ser_result(text=text, span_source=res_parts)


def _picture_ser(state: DocSerializerState, item: dict, visited: Set[str]) -> SerResult:
    p = state.params
    res_parts: List[SerResult] = []
    is_chart = False
    if item["self_ref"] not in state.excluded:
        body = ""
        if p.add_location:
            body += _get_location_tokens(state, item)
        anns = item.get("annotations", []) or []
        classifications = [a for a in anns if a.get("kind") == "classification"]
        if classifications:
            classes = classifications[0].get("predicted_classes") or []
            if classes:
                predicted = classes[0].get("class_name", "")
                if predicted in _CHART_CLASSES:
                    is_chart = True
                body += f"<{predicted}>"
        smiles = [a for a in anns if a.get("kind") == "molecule_data"]
        if smiles:
            body += _wrap(smiles[0].get("smi", ""), "smiles")
        charts = [
            a for a in anns
            if a.get("kind") in ("tabular_chart_data", "tabular_chart")
        ]
        if charts and (charts[0].get("chart_data") or charts[0].get("data")):
            body += T.export_otsl(
                charts[0].get("chart_data") or charts[0]["data"]
            )
        res_parts.append(ser_result(text=body, span_source=item))
    cap_res = _serialize_captions_dt(state, item)
    if cap_res.text:
        res_parts.append(cap_res)
    text = "".join(r.text for r in res_parts)
    if text:
        text = _wrap(text, "chart" if is_chart else "picture")
    return ser_result(text=text, span_source=res_parts)


def _kv_ser(state: DocSerializerState, item: dict) -> SerResult:
    p = state.params
    body = ""
    results: List[SerResult] = []
    page_no = 1
    if item.get("prov"):
        page_no = item["prov"][0]["page_no"]
    if p.add_location:
        body += _get_location_tokens(state, item)
    graph = item.get("graph") or {"cells": [], "links": []}
    source_to_targets = {}
    for link in graph.get("links", []):
        source_to_targets.setdefault(link["source_cell_id"], []).append(
            link["target_cell_id"]
        )
    for cell in graph.get("cells", []):
        cell_txt = ""
        # per-cell location from GraphCell.prov (reference-JSON nested
        # bbox shape; doctags.py DocTagsKeyValueSerializer)
        cprov = cell.get("prov")
        if cprov is not None and state.doc["pages"]:
            page = state.doc["pages"].get(page_no)
            if page is not None:
                bb = cprov["bbox"]
                l, t, r, b = _to_top_left(
                    {
                        "l": bb["l"], "t": bb["t"], "r": bb["r"],
                        "b": bb["b"],
                        "coord_origin": bb.get(
                            "coord_origin", L.COORD_TOPLEFT
                        ),
                    },
                    page["height"],
                )
                cell_txt += _location_from_bbox(
                    l, t, r, b, page["width"], page["height"]
                )
        if p.add_content:
            cell_txt += cell.get("text", "").strip()
        for target in source_to_targets.get(cell["cell_id"], []):
            cell_txt += f"<link_{target}>"
        tok = f"{cell['label']}_{cell['cell_id']}"
        body += _wrap(cell_txt, tok)
    results.append(ser_result(text=body, span_source=item))
    cap_res = _serialize_captions_dt(state, item)
    if cap_res.text:
        results.append(cap_res)
    text = "".join(r.text for r in results)
    text = _wrap(text, "key_value_region")
    return ser_result(text=text, span_source=results)


def _form_ser(state: DocSerializerState, item: dict) -> SerResult:
    return SerResult()  # parity: DocTagsFormSerializer TODO stub


def _list_ser(
    state: DocSerializerState,
    item: dict,
    list_level: int,
    is_inline_scope: bool,
    visited: Set[str],
) -> SerResult:
    parts = state.get_parts(
        item=item,
        list_level=list_level + 1,
        is_inline_scope=is_inline_scope,
        visited=visited,
    )
    delim = _delim(state)
    if not parts:
        return ser_result(text="", span_source=parts)
    text = delim.join(_wrap(part.text, "list_item") for part in parts)
    text = f"{text}{delim}"
    wrap_tag = (
        "ordered_list"
        if item.get("label") == L.GROUP_ORDERED_LIST
        else "unordered_list"
    )
    return ser_result(text=_wrap(text, wrap_tag), span_source=parts)


def _inline_ser(
    state: DocSerializerState, item: dict, list_level: int, visited: Set[str]
) -> SerResult:
    p = state.params
    parts: List[SerResult] = []
    suppressed = False
    if p.add_location:
        # enclosing bbox over the group's doc items (doctags.py:420-455)
        boxes = []
        items = []
        last_prov = None
        for it, _ in D.iterate_items(state.doc, root=item, shared=state.shared):
            if D.is_doc_item(it):
                for prov in it.get("prov", []) or []:
                    boxes.append(prov)
                    items.append(it)
                    last_prov = prov
        if last_prov is not None:
            page = state.doc["pages"].get(last_prov["page_no"])
            if page is not None:
                tl = [_to_top_left(b, page["height"]) for b in boxes]
                l = min(b[0] for b in tl)
                t = min(b[1] for b in tl)
                r = max(b[2] for b in tl)
                b_ = max(b[3] for b in tl)
                parts.append(
                    SerResult(
                        text=_location_from_bbox(
                            l, t, r, b_, page["width"], page["height"]
                        ),
                        spans=list(items),
                    )
                )
        # suppress child locations
        saved = p.add_location
        p.add_location = False
        suppressed = True
    try:
        parts.extend(
            state.get_parts(
                item=item,
                list_level=list_level,
                is_inline_scope=True,
                visited=visited,
            )
        )
    finally:
        if suppressed:
            p.add_location = saved
    delim = _delim(state)
    text = delim.join(part.text for part in parts if part.text)
    if text:
        text = _wrap(f"{text}{delim}", "inline")
    return ser_result(text=text, span_source=parts)


def _fallback_ser(state: DocSerializerState, item: dict) -> SerResult:
    return SerResult()


def _doc_ser(state: DocSerializerState, parts: List[SerResult]) -> SerResult:
    delim = _delim(state)
    text = delim.join(p.text for p in parts if p.text)
    text = substitute_page_breaks(text, "<page_break>")
    text = f"<doctag>{text}{delim}</doctag>"
    return ser_result(text=text, span_source=parts)


DOCTAGS_VTABLE = {
    "text": _text_ser,
    "table": _table_ser,
    "picture": _picture_ser,
    "key_value": _kv_ser,
    "form": _form_ser,
    "list": _list_ser,
    "inline": _inline_ser,
    "fallback": _fallback_ser,
    "doc": _doc_ser,
    "requires_page_break": lambda p: True,  # add_page_break default True
}


def serialize_doctags(
    doc: dict, params: Optional[SerParams] = None, shared=None
) -> SerResult:
    # DocTags default layers = ALL content layers (common.py:57,185) — page
    # headers/footers (furniture) are included, unlike markdown.
    p = params or SerParams(
        labels=L.DOCUMENT_TOKENS_EXPORT_LABELS,
        layers=L.CONTENT_LAYERS,
    )
    state = DocSerializerState(doc, p, DOCTAGS_VTABLE, shared=shared)
    return state.serialize_doc()


def export_to_doctags(doc: dict, minified: bool = False, shared=None) -> str:
    p = SerParams(
        labels=L.DOCUMENT_TOKENS_EXPORT_LABELS,
        layers=L.CONTENT_LAYERS,
        minified=minified,
    )
    return serialize_doctags(doc, p, shared=shared).text
