"""HTML serializer (parity: transforms/serializer/html.py, body content).

The <head> section uses this engine's own minimal CSS (the reference's
stylesheet is not reproduced); parity tests therefore compare from <body>
onward. MathML conversion requires latex2mathml on executors — gated behind
an import-try with the reference's own `<pre>` fallback semantics
(html.py:220-280).
"""

from __future__ import annotations

import html as _html
import os
import re
import unicodedata
from typing import List, Optional, Set

from ..model import doc as D
from ..model import labels as L
from ..model import table as T
from .common import (
    DocSerializerState,
    SerParams,
    SerResult,
    ser_result,
)

try:  # pragma: no cover - optional executor-side dep
    import latex2mathml.converter as _l2m
except ImportError:
    _l2m = None


def _text_direction(text: str) -> str:
    """LTR/RTL detection (types/doc/utils.py:62-75)."""
    if not text or text.isascii():
        # no ASCII codepoint has bidirectional class R/AL — C-speed
        # shortcut for the dominant case, same answer as the full scan
        return "ltr"
    rtl = {"R", "AL"}
    rtl_chars = sum(unicodedata.bidirectional(c) in rtl for c in text)
    return (
        "rtl"
        if unicodedata.bidirectional(text[0]) in rtl or rtl_chars > len(text) / 2
        else "ltr"
    )


def _tag_with_dir(tag: str, text: str) -> str:
    d = _text_direction(text)
    if d == "ltr":
        return f"<{tag}>{text}</{tag}>"
    return f'<{tag} dir="{d}">{text}</{tag}>'


def _prepare(text: str, esc: bool = True, nl: bool = True) -> str:
    if esc:
        text = _html.escape(text, quote=False)
    if nl:
        text = text.replace("\n", "<br>")
    return text


def _post_process(state: DocSerializerState, text: str, item: dict) -> str:
    p = state.params
    res = text
    fmt = item.get("formatting")
    if p.include_formatting and fmt:
        if fmt.get("bold"):
            res = f"<strong>{res}</strong>"
        if fmt.get("italic"):
            res = f"<em>{res}</em>"
        if fmt.get("underline"):
            res = f"<u>{res}</u>"
        if fmt.get("strikethrough"):
            res = f"<del>{res}</del>"
        script = fmt.get("script")
        if script == "sub":
            res = f"<sub>{res}</sub>"
        elif script == "super":
            res = f"<sup>{res}</sup>"
    if p.include_hyperlinks and item.get("hyperlink"):
        res = f'<a href="{item["hyperlink"]}">{res}</a>'
    return res


def _formula_html(item: dict, is_inline_scope: bool) -> str:
    math_formula = _prepare(item.get("text", ""), esc=False, nl=False)
    if math_formula and _l2m is not None:
        try:
            from xml.etree.ElementTree import SubElement, tostring
            from xml.sax.saxutils import unescape

            el = _l2m.convert_to_element(
                math_formula,
                display="inline" if is_inline_scope else "block",
            )
            ann = SubElement(el, "annotation", dict(encoding="TeX"))
            ann.text = math_formula
            mathml = unescape(tostring(el, encoding="unicode"))
            return mathml if is_inline_scope else f"<div>{mathml}</div>"
        except Exception:
            pass
    if math_formula:
        return f"<pre>{math_formula}</pre>"
    if is_inline_scope:
        return '<span class="formula-not-decoded">Formula not decoded</span>'
    return '<div class="formula-not-decoded">Formula not decoded</div>'


def _serialize_annotations(state: DocSerializerState, item: dict) -> SerResult:
    from .markdown import _annotation_text

    parts: List[str] = []
    for ann in item.get("annotations", []) or []:
        ann_text = _annotation_text(ann)
        if ann_text:
            d = _text_direction(ann_text)
            dir_str = f' dir="{d}"' if d == "rtl" else ""
            parts.append(
                f'<div data-annotation-kind="{ann.get("kind")}"{dir_str}>'
                f"{_html.escape(ann_text)}</div>"
            )
    return ser_result(text=" ".join(p for p in parts if p), span_source=item)


def _serialize_captions_html(
    state: DocSerializerState, item: dict, tag: str = "figcaption"
) -> SerResult:
    """HTML caption override (html.py:985-1030): div.caption wrappers +
    annotations folded in, wrapped by `tag`."""
    p = state.params
    results: List[SerResult] = []
    if L.CAPTION in p.labels:
        for cap_ref in item.get("captions", []) or []:
            cap = (
                state.shared.resolve(cap_ref)
                if state.shared is not None
                else D.resolve(state.doc, cap_ref)
            )
            if (
                cap is not None
                and cap.get("kind") == "texts"
                and cap_ref not in state.excluded
            ):
                text_cap = cap.get("text", "")
                d = _text_direction(text_cap)
                dir_str = f' dir="{d}"' if d == "rtl" else ""
                results.append(
                    SerResult(
                        text=(
                            f'<div class="caption"{dir_str}>'
                            f"{_html.escape(text_cap)}</div>"
                        ),
                        spans=[cap],
                    )
                )
    if p.include_annotations and item["self_ref"] not in state.excluded:
        if item.get("kind") in ("pictures", "tables"):
            ann_res = _serialize_annotations(state, item)
            if ann_res.text:
                results.append(ann_res)
    text = p.caption_delim.join(r.text for r in results)
    if text:
        text = f"<{tag}>{text}</{tag}>"
    return ser_result(text=text, span_source=results)


def _text_ser(state: DocSerializerState, item: dict, is_inline_scope: bool) -> SerResult:
    label = item.get("label")
    if label == L.TITLE:
        text = _tag_with_dir("h1", _prepare(item["text"]))
    elif label == L.SECTION_HEADER:
        lvl = min(item.get("level", 1) + 1, 6)
        text = _tag_with_dir(f"h{lvl}", _prepare(item["text"]))
    elif label == L.FORMULA:
        text = _formula_html(item, is_inline_scope)
    elif label == L.CODE:
        code = _prepare(item["text"], esc=False, nl=False)
        text = (
            f"<code>{code}</code>"
            if is_inline_scope
            else f"<pre><code>{code}</code></pre>"
        )
    elif label == L.LIST_ITEM:
        text = _tag_with_dir("li", _prepare(item["text"]))
    elif is_inline_scope:
        text = _prepare(item["text"])
    else:
        text = _tag_with_dir("p", _prepare(item["text"]))
    text = _post_process(state, text, item)
    res_parts = []
    if text:
        res_parts.append(ser_result(text=text, span_source=item))
    if label == L.CODE and item.get("captions"):
        cap_res = _serialize_captions_html(state, item)
        if cap_res.text:
            res_parts.append(cap_res)
    # parity quirk: reference returns `text` (not joined parts) as the
    # final text but spans from all parts (html.py:186-191)
    return ser_result(text=text, span_source=res_parts)


def _table_ser(state: DocSerializerState, item: dict) -> SerResult:
    res_parts: List[SerResult] = []
    cap_res = _serialize_captions_html(state, item, tag="caption")
    if cap_res.text:
        res_parts.append(cap_res)
    if item["self_ref"] not in state.excluded:
        data = item["data"]
        g = T.grid(data)
        body = ""
        for i in range(data["num_rows"]):
            body += "<tr>"
            for j in range(data["num_cols"]):
                cell = g[i][j]
                if cell["start_row_offset_idx"] != i:
                    continue
                if cell["start_col_offset_idx"] != j:
                    continue
                content = _html.escape(cell["text"].strip())
                celltag = "th" if cell["column_header"] else "td"
                opening = celltag
                if cell["row_span"] > 1:
                    opening += f' rowspan="{cell["row_span"]}"'
                if cell["col_span"] > 1:
                    opening += f' colspan="{cell["col_span"]}"'
                # (reference has a dir-attr bug here writing
                # ' dir="<built-in function dir>"'; we add none for ltr,
                # matching behavior for all-ltr content)
                body += f"<{opening}>{content}</{celltag}>"
            body += "</tr>"
        if body:
            res_parts.append(
                ser_result(text=f"<tbody>{body}</tbody>", span_source=item)
            )
    text = "".join(r.text for r in res_parts)
    if text:
        text = f"<table>{text}</table>"
    return ser_result(text=text, span_source=res_parts)


def _image_part_html(item: dict, p) -> str:
    """HTMLPictureSerializer image part parity (html.py:403-445):
    PLACEHOLDER emits nothing; EMBEDDED inlines data: URIs (the engine
    holds no bytes, so non-data refs take the reference's
    get_image()->None path — which still emits the empty wrapper table
    for multi-provenance pictures); REFERENCED url-quotes the ref."""
    from urllib.parse import quote

    ref = item.get("media_ref", "") or ""
    if p.image_mode == "embedded":
        if ref.startswith("data:"):
            return f'<img src="{ref}">'
        if len(item.get("prov") or []) > 1:
            return (
                '<table style="border-collapse: collapse; width: 100%;">\n'
                "</table>\n"
            )
        return ""
    if p.image_mode == "referenced":
        if ref and not ref.startswith("data:"):
            return f'<img src="{quote(ref)}">'
        return ""
    return ""


def _picture_ser(state: DocSerializerState, item: dict, visited: Set[str]) -> SerResult:
    p = state.params
    res_parts: List[SerResult] = []
    cap_res = _serialize_captions_html(state, item, tag="figcaption")
    if cap_res.text:
        res_parts.append(cap_res)
    if item["self_ref"] not in state.excluded:
        img_text = _image_part_html(item, p)
        if img_text:
            res_parts.append(ser_result(text=img_text, span_source=item))
    if p.enable_chart_tables:
        for ann in item.get("annotations", []) or []:
            if ann.get("kind") in (
                "tabular_chart_data", "tabular_chart"
            ) and (ann.get("chart_data") or ann.get("data")):
                tbl = T.to_html_table(ann.get("chart_data") or ann["data"])
                if tbl:
                    res_parts.append(ser_result(text=tbl, span_source=item))
                break
    text = "".join(r.text for r in res_parts)
    if text:
        text = f"<figure>{text}</figure>"
    return ser_result(text=text, span_source=res_parts)


def _graph_html(item: dict, graph: dict, class_name: str) -> SerResult:
    """Nested <ul> tree or <dl> fallback (html.py:473-600)."""
    cell_map = {c["cell_id"]: c for c in graph.get("cells", [])}
    child_links: dict = {}
    value_links: dict = {}
    parents: Set[int] = set()
    for link in graph.get("links", []):
        if (
            link["source_cell_id"] not in cell_map
            or link["target_cell_id"] not in cell_map
        ):
            continue
        if link["label"] == L.GRAPH_LINK_TO_CHILD:
            child_links.setdefault(link["source_cell_id"], []).append(
                link["target_cell_id"]
            )
            parents.add(link["target_cell_id"])
        elif link["label"] == L.GRAPH_LINK_TO_VALUE:
            value_links.setdefault(link["source_cell_id"], []).append(
                link["target_cell_id"]
            )

    root_ids = [cid for cid in cell_map if cid not in parents]
    parts = [f'<div class="{class_name}">']

    def render(cid: int) -> str:
        cell = cell_map[cid]
        cell_text = _html.escape(cell.get("text", ""))
        if cid in value_links:
            values = [
                _html.escape(cell_map[v].get("text", ""))
                for v in value_links[cid]
                if v in cell_map
            ]
            cell_text = f"<strong>{cell_text}</strong>: {', '.join(values)}"
        if child_links.get(cid):
            out = [f"<li>{cell_text}</li>", "<ul>"]
            out.extend(render(ch) for ch in child_links[cid])
            out.append("</ul>")
            return "\n".join(out)
        if cid in value_links:
            return f"<li>{cell_text}</li>"
        return ""

    if root_ids:
        parts.append(f'<ul class="{class_name}">')
        parts.extend(render(r) for r in root_ids)
        parts.append("</ul>")
    else:
        parts.append(f'<dl class="{class_name}">')
        for key_id, value_ids in value_links.items():
            parts.append(f"<dt>{_html.escape(cell_map[key_id].get('text', ''))}</dt>")
            for vid in value_ids:
                parts.append(f"<dd>{_html.escape(cell_map[vid].get('text', ''))}</dd>")
        parts.append("</dl>")
    parts.append("</div>")
    return ser_result(text="\n".join(parts), span_source=item)


def _kv_ser(state: DocSerializerState, item: dict) -> SerResult:
    res_parts: List[SerResult] = []
    if item["self_ref"] not in state.excluded:
        kv_res = _graph_html(item, item.get("graph") or {}, "key-value-region")
        if kv_res.text:
            res_parts.append(kv_res)
    cap_res = _serialize_captions_html(state, item)
    if cap_res.text:
        res_parts.append(cap_res)
    return ser_result(
        text="\n".join(r.text for r in res_parts), span_source=res_parts
    )


def _form_ser(state: DocSerializerState, item: dict) -> SerResult:
    res_parts: List[SerResult] = []
    if item["self_ref"] not in state.excluded:
        form_res = _graph_html(item, item.get("graph") or {}, "form-container")
        if form_res.text:
            res_parts.append(form_res)
    cap_res = _serialize_captions_html(state, item)
    if cap_res.text:
        res_parts.append(cap_res)
    return ser_result(
        text="\n".join(r.text for r in res_parts), span_source=res_parts
    )


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
    texts = []
    for part in parts:
        t = part.text
        if (
            (t.startswith("<li>") and t.endswith("</li>"))
            or (t.startswith("<ol>") and t.endswith("</ol>"))
            or (t.startswith("<ul>") and t.endswith("</ul>"))
        ):
            texts.append(t)
        else:
            texts.append(f"<li>{t}</li>")
    text = "\n".join(texts)
    if text:
        tag = "ol" if item.get("label") == L.GROUP_ORDERED_LIST else "ul"
        text = f"<{tag}>\n{text}\n</{tag}>"
    return ser_result(text=text, span_source=parts)


def _inline_ser(
    state: DocSerializerState, item: dict, list_level: int, visited: Set[str]
) -> SerResult:
    parts = state.get_parts(
        item=item, list_level=list_level, is_inline_scope=True, visited=visited
    )
    text = " ".join(p.text for p in parts if p.text)
    if text:
        text = f"<span class='inline-group'>{text}</span>"
    return ser_result(text=text, span_source=parts)


def _fallback_ser(state: DocSerializerState, item: dict) -> SerResult:
    if D.is_doc_item(item):
        return ser_result(
            text=f"<!-- Unhandled item type: {item.get('label')} -->",
            span_source=item,
        )
    return SerResult()


def _load_css(fname: str) -> str:
    """Stylesheet data assets extracted from the reference's OWN
    exported HTML (tools/extract_ref_css.py): the CSS is part of the
    reference's observable output bytes, and full-document parity
    (pipeline_exports html_full_md5) requires reproducing it exactly.
    Loaded via importlib.resources so it works when the package ships
    to executors as a spark-submit --py-files ZIP (plain open() on a
    __file__-relative path raises NotADirectoryError inside a zip —
    caught by tests/test_spark_submit.py)."""
    from importlib import resources

    return (
        resources.files(__package__).joinpath("assets").joinpath(fname)
        .read_text(encoding="utf-8")
    )


_CSS_SINGLE_COLUMN = _load_css("html_single_column.css")
_CSS_SPLIT_PAGE = _load_css("html_split_page.css")


def _generate_head(state: DocSerializerState) -> str:
    """Head parity with the reference serializer (html.py:1029-1069
    defaults: add_document_metadata=True, prettify=True): charset,
    title (doc name or the 'Docling Document' fallback), generator
    meta, per-output-style stylesheet."""
    doc = state.doc
    head_parts = ["<head>", '<meta charset="UTF-8">']
    name = doc.get("name")
    if name:
        head_parts.append(f"<title>{_html.escape(name)}</title>")
    else:
        head_parts.append("<title>Docling Document</title>")
    head_parts.append(
        '<meta name="generator" content="Docling HTML Serializer">'
    )
    if state.params.html_output_style == "split_page":
        head_parts.append(_CSS_SPLIT_PAGE)
    else:
        head_parts.append(_CSS_SINGLE_COLUMN)
    head_parts.append("</head>")
    return "\n".join(head_parts)


_PAGE_BREAK_RE = re.compile(r"#_#_DOCLING_DOC_PAGE_BREAK_(\d+)_(\d+)_#_#")


def _applicable_pages(state: DocSerializerState) -> Optional[List[int]]:
    """_get_applicable_pages parity (common.py:542-564): ordered set of
    page numbers of in-scope DocItems with provenance."""
    p = state.params
    pages: dict = {}
    for ix, (item, _lvl) in enumerate(
        D.iterate_items(
            state.doc, with_groups=True, traverse_pictures=True,
            included_content_layers=p.layers, shared=state.shared,
        )
    ):
        prov = item.get("prov")
        if (
            D.is_doc_item(item)
            and prov
            and (p.pages is None or prov[0]["page_no"] in p.pages)
            and p.start_idx <= ix < p.stop_idx
        ):
            pages[prov[0]["page_no"]] = None
    return list(pages) or None


def _split_page_body(state: DocSerializerState, content: str) -> List[str]:
    """SPLIT_PAGE assembly parity (html.py:898-966): content split at
    page-break sentinels; one table row per page with the page image
    (data: URI shortcut; the engine holds no decodable bytes, matching
    the reference's _pil=None fallback) beside the page content."""
    applicable = _applicable_pages(state)
    pages: dict = {}
    next_page: Optional[int] = None
    prev_end = 0
    for m in _PAGE_BREAK_RE.finditer(content):
        full = m.group(0)
        prev_page, next_page = int(m.group(1)), int(m.group(2))
        start = content.find(full)
        pages[prev_page] = content[prev_end:start]
        prev_end = start + len(full)
    if next_page is not None:
        pages[next_page] = content[prev_end:]
    elif applicable is not None and len(applicable) == 1:
        pages[applicable[0]] = content

    out = ["<table>", "<tbody>"]
    for page_no, page in pages.items():
        if applicable is not None and page_no not in applicable:
            continue
        page_ref = (state.doc.get("pages", {}).get(page_no) or {}).get(
            "media_ref", ""
        )
        out.append("<tr>")
        out.append("<td>")
        if page_ref.startswith("data:"):
            out.append(f'<figure><img src="{page_ref}"></figure>')
        else:
            out.append("<figure>no page-image found</figure>")
        out.append("</td>")
        out.append("<td>")
        out.append(f"<div class='page'>\n{page}\n</div>")
        out.append("</td>")
        out.append("</tr>")
    out.extend(["</tbody>", "</table>"])
    return out


def _doc_ser(state: DocSerializerState, parts: List[SerResult]) -> SerResult:
    html_parts = ["<!DOCTYPE html>", "<html>", _generate_head(state), "<body>"]
    content = "\n".join(p.text for p in parts if p.text)
    if state.params.html_output_style == "split_page":
        html_parts.extend(_split_page_body(state, content))
    else:
        html_parts.append(f"<div class='page'>\n{content}\n</div>")
    html_parts.extend(["</body>", "</html>"])
    return ser_result(text="\n".join(html_parts), span_source=parts)


HTML_VTABLE = {
    "text": _text_ser,
    "table": _table_ser,
    "picture": _picture_ser,
    "key_value": _kv_ser,
    "form": _form_ser,
    "list": _list_ser,
    "inline": _inline_ser,
    "fallback": _fallback_ser,
    "doc": _doc_ser,
    # split-page view needs the page-break sentinels (html.py:1076-1078)
    "requires_page_break": lambda p: p.html_output_style == "split_page",
}


def serialize_html(
    doc: dict, params: Optional[SerParams] = None, shared=None
) -> SerResult:
    p = params or SerParams()
    state = DocSerializerState(doc, p, HTML_VTABLE, shared=shared)
    return state.serialize_doc()


def export_to_html(doc: dict, shared=None, **kw) -> str:
    return serialize_html(
        doc, SerParams(**kw) if kw else None, shared=shared
    ).text


def html_body(html_text: str) -> str:
    """Body-only view for parity comparison (head CSS is engine-specific)."""
    idx = html_text.find("<body>")
    return html_text[idx:] if idx >= 0 else html_text
