"""DocTags string parser: `<doctag>` token stream -> document dict.

Semantic mirror of the reference's `DoclingDocument.load_from_doctags`
(document.py:3323-3993) for the no-page-images case (pg_width =
pg_height = 1; bboxes are the raw `<loc_*>`/500 values):

  - root-level tag scan in document order with the same alternation and
    the same unclosed-tag-at-EOF recovery (document.py:3763-3793);
  - `<otsl>` tables via the OTSL parser, caption extraction with
    caption-own bbox (document.py:3794-3813);
  - `<picture>`/`<chart>` with chart-type classification and tabular
    chart data (document.py:3833-3932). NOTE: the reference itself
    crashes on `<chart>` with image=None (UnboundLocalError `pic_title`,
    document.py:3926 — the no-image branch never binds it); we implement
    the evident intent instead (classification + tabular data attached);
  - `<key_value_region>` graph with all links coerced to to_value and
    dangling targets dropped (document.py:3598-3685);
  - ordered/unordered lists FLATTENED one level with regenerated
    enumeration markers, item bboxes dropped when no image
    (document.py:3939-3979);
  - `<inline>` groups re-dispatch their children with the group's
    common bbox (document.py:3815-3831);
  - everything else as text with layer routing for page_header/footer
    and section-header levels (document.py:3687-3732);
  - one page per `<page_break>` segment, size 1x1 (document.py:3734-3755).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..model import doc as D
from ..model import labels as L
from ..model import table as T

_TAG_ALTERNATION = (
    "title|document_index|checkbox_unselected|checkbox_selected|text|"
    "page_header|inline|page_footer|formula|caption|picture|footnote|code|"
    "section_header_level_[1-6]|ordered_list|unordered_list|"
    "key_value_region|chart|otsl"
)
_TAG_RE = re.compile(
    rf"<(?P<tag>{_TAG_ALTERNATION})>"
    rf"(?P<content>.*?)"
    rf"(?:(?P<closed></(?P=tag)>)|(?P<eof>$))",
    re.DOTALL,
)
_LOC_RE = re.compile(r"<loc_(\d+)>")
_CAPTION_RE = re.compile(r"<caption>(.*?)</caption>", re.DOTALL)
_LIST_ITEM_RE = re.compile(r"<(?P<tag>list_item)>.*?</(?P=tag)>", re.DOTALL)
_KV_CELL_RE = re.compile(
    r"<(?P<label>key|value)_(?P<id>\d+)>(?P<content>.*?)</(?P=label)_(?P=id)>",
    re.DOTALL,
)
_LINK_RE = re.compile(r"<link_(\d+)>")
_ANY_TAG_RE = re.compile(r"<.*?>", re.DOTALL)

_TEXTISH_LABELS = {
    "title": L.TITLE,
    "document_index": L.DOCUMENT_INDEX,
    "checkbox_selected": L.CHECKBOX_SELECTED,
    "checkbox_unselected": L.CHECKBOX_UNSELECTED,
    "text": L.TEXT,
    "page_header": L.PAGE_HEADER,
    "page_footer": L.PAGE_FOOTER,
    "formula": L.FORMULA,
    "caption": L.CAPTION,
    "footnote": L.FOOTNOTE,
    "code": L.CODE,
}

_CHART_CLASSES = [
    "pie_chart", "bar_chart", "stacked_bar_chart", "line_chart",
    "flow_chart", "scatter_chart", "heatmap",
    "line", "dot_line", "vbar_categorical", "hbar_categorical",
]
_CHART_CLASS_MAP = {
    "line": "line_chart",
    "dot_line": "line_chart",
    "vbar_categorical": "bar_chart",
    "hbar_categorical": "bar_chart",
}


def _extract_bbox(chunk: str) -> Optional[Tuple[float, float, float, float]]:
    coords = _LOC_RE.findall(chunk)[:4]
    if len(coords) == 4:
        l, t, r, b = (float(c) / 500.0 for c in coords)
        return (l, t, r, b)
    return None


def _inner_text(chunk: str) -> str:
    return _ANY_TAG_RE.sub("", chunk).strip()


def _prov(bbox, charspan, page_no: int) -> dict:
    l, t, r, b = bbox
    return {
        "page_no": page_no,
        "l": l, "t": t, "r": r, "b": b,
        "coord_origin": L.COORD_TOPLEFT,
        "charspan": charspan,
    }


def _extract_chart_type(chunk: str) -> Optional[str]:
    for cls in _CHART_CLASSES:
        if f"<{cls}>" in chunk:
            return _CHART_CLASS_MAP.get(cls, cls)
    return None


def _strip_to_otsl(chunk: str) -> str:
    """Remove caption sections and non-OTSL tokens, keeping structural
    tokens + cell text, matching otsl_extract_tokens_and_text filtering
    (document.py:3514-3562)."""
    chunk = _CAPTION_RE.sub("", chunk)
    keep = {
        "<fcel>", "<ecel>", "<lcel>", "<ucel>", "<xcel>", "<nl>",
        "<ched>", "<rhed>", "<srow>",
    }
    parts = re.split(r"(<[^>]+>)", chunk)
    out = []
    for p in parts:
        if p.startswith("<") and p.endswith(">"):
            if p in keep:
                out.append(p)
        else:
            out.append(p)
    return "".join(out)


def _extract_caption(doc: dict, chunk: str, page_no: int):
    """Parity: extract_caption (document.py:3370-3387) + prov append when
    the caption carries its own bbox (document.py:3801-3808)."""
    m = _CAPTION_RE.search(chunk)
    if m is None:
        return None
    content = m.group(1)
    bbox = _extract_bbox(content)
    text = _inner_text(content)
    cap = D.add_text(doc, L.CAPTION, text, parent=doc["body"])
    if bbox is not None:
        cap["prov"] = [_prov(bbox, (0, len(text)), page_no)]
    return cap


def _add_textish(
    doc: dict, tag: str, chunk: str, bbox, page_no: int, parent
) -> None:
    text = _inner_text(chunk)
    prov = [_prov(bbox, (0, len(text)), page_no)] if bbox else None
    if tag.startswith("section_header_level_"):
        D.add_heading(
            doc, text, level=int(tag.rsplit("_", 1)[1]), parent=parent,
            prov=prov,
        )
        return
    label = _TEXTISH_LABELS.get(tag, L.TEXT)
    if label == L.CODE:
        D.add_code(doc, text, parent=parent, prov=prov)
    else:
        D.add_text(doc, label, text, parent=parent, prov=prov)


def parse_doctags_page(doc: dict, page_doctags: str, page_no: int) -> None:
    """Parse one page's token stream into `doc` (body appends)."""
    for match in _TAG_RE.finditer(page_doctags):
        full_chunk = match.group(0)
        tag = match.group("tag")
        bbox = _extract_bbox(full_chunk)
        if not match.group("closed"):
            full_chunk = f"<{tag}></{tag}>"

        if tag == "otsl":
            try:
                data = T.parse_otsl(_strip_to_otsl(full_chunk))
            except Exception:
                data = T.new_table_data([], 0, 0)
            cap = _extract_caption(doc, full_chunk, page_no)
            tbl = D.add_table(
                doc, data, parent=None,
                prov=[_prov(bbox, (0, 0), page_no)] if bbox else None,
            )
            if cap is not None and cap.get("prov"):
                tbl["captions"].append(cap["self_ref"])

        elif tag == "inline":
            group = D.add_inline_group(doc, parent=None)
            content = match.group("content")
            common_bbox = _extract_bbox(content)
            for im in _TAG_RE.finditer(content):
                _add_textish(
                    doc, im.group("tag"), im.group(0), common_bbox,
                    page_no, group,
                )

        elif tag in ("picture", "chart"):
            cap = _extract_caption(doc, full_chunk, page_no)
            annotations: List[dict] = []
            if tag == "chart":
                chart_type = _extract_chart_type(full_chunk)
                if chart_type is not None:
                    annotations.append(
                        {
                            "kind": "classification",
                            "provenance": "load_from_doctags",
                            "predicted_classes": [
                                {"class_name": chart_type, "confidence": 1.0}
                            ],
                        }
                    )
                try:
                    chart_data = T.parse_otsl(_strip_to_otsl(full_chunk))
                except Exception:
                    chart_data = T.new_table_data([], 0, 0)
                if chart_data["table_cells"]:
                    annotations.append(
                        {
                            "kind": "tabular_chart_data",
                            "title": chart_type or "picture",
                            "chart_data": chart_data,
                        }
                    )
            if bbox:
                pic = D.add_picture(
                    doc, parent=None, media_ref="",
                    annotations=annotations,
                    prov=[_prov(bbox, (0, 0), page_no)],
                )
                if cap is not None and cap.get("prov"):
                    pic["captions"].append(cap["self_ref"])

        elif tag == "key_value_region":
            cells: List[dict] = []
            links: List[dict] = []
            raw_links: List[Tuple[int, int]] = []
            for cm in _KV_CELL_RE.finditer(full_chunk):
                cid = int(cm.group("id"))
                raw = cm.group("content")
                for target in _LINK_RE.findall(raw):
                    raw_links.append((cid, int(target)))
                cleaned = _LOC_RE.sub("", raw)
                cleaned = _LINK_RE.sub("", cleaned).strip()
                cells.append(
                    {
                        "label": cm.group("label"),
                        "cell_id": cid,
                        "text": cleaned,
                        "orig": cleaned,
                    }
                )
            cell_ids = {c["cell_id"] for c in cells}
            for src, tgt in raw_links:
                if tgt in cell_ids:
                    # parity: every link label is to_value on load
                    links.append(
                        {
                            "label": L.GRAPH_LINK_TO_VALUE,
                            "source_cell_id": src,
                            "target_cell_id": tgt,
                        }
                    )
            D.add_key_values(
                doc, {"cells": cells, "links": links}, parent=None
            )

        elif tag in ("ordered_list", "unordered_list"):
            ordered = tag == "ordered_list"
            group = D.add_list_group(doc, ordered=ordered, parent=None)
            enum_value = 0
            for li in _LIST_ITEM_RE.finditer(full_chunk):
                enum_value += 1
                text = _inner_text(li.group(0))
                D.add_list_item(
                    doc, text, enumerated=ordered,
                    marker=f"{enum_value}." if ordered else "",
                    parent=group, prov=None,
                )

        else:
            _add_textish(doc, tag, full_chunk, bbox, page_no, None)


def parse_doctags(doctags: str, name: str = "Document") -> dict:
    """Full document parse: strip the `<doctag>` wrapper, split pages on
    `<page_break>` (parity: DocTagsDocument.from_multipage_doctags_and_
    images, document.py:593-610), then scan each page."""
    doc = D.new_doc(name=name)
    body = doctags
    body = re.sub(r"</?doctag>", "", body)
    pages = body.split("<page_break>")
    for idx, page in enumerate(pages):
        page_no = idx + 1
        D.add_page(doc, page_no, 1.0, 1.0)
        parse_doctags_page(doc, page, page_no)
    D.normalize_misplaced_list_items(doc)
    return doc
