"""Markdown serializer (parity: transforms/serializer/markdown.py).

Pure function over the dict document model; returns (text, ordered span
sequence). Table formatting pinned by the reference goldens (see
model/table.py). No code copied — semantics mirrored from
markdown.py:98-631.
"""

from __future__ import annotations

import html as _html
import re
import textwrap
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

_URL_IMG_RE = re.compile(r"!\[.*?\]\((.*?)\)")
_UNDERSCORE_RE = re.compile(r"(?<!\\)_")


def _escape_underscores(text: str) -> str:
    """Escape `_` outside markdown image URLs (markdown.py:568-591)."""
    parts: List[str] = []
    last_end = 0
    for m in _URL_IMG_RE.finditer(text):
        parts.append(_UNDERSCORE_RE.sub(r"\\_", text[last_end:m.start()]))
        parts.append(m.group(0))
        last_end = m.end()
    if last_end < len(text):
        parts.append(_UNDERSCORE_RE.sub(r"\\_", text[last_end:]))
    return "".join(parts)


def _post_process(
    state: DocSerializerState,
    text: str,
    escape_html: bool = True,
    escape_underscores: bool = True,
    formatting: Optional[dict] = None,
    hyperlink: Optional[str] = None,
) -> str:
    p = state.params
    res = text
    if escape_underscores and p.escape_underscores:
        res = _escape_underscores(text)
    if escape_html and p.escape_html:
        res = _html.escape(res, quote=False)
    if p.include_formatting and formatting:
        if formatting.get("bold"):
            res = f"**{res}**"
        if formatting.get("italic"):
            res = f"*{res}*"
        # underline / sub / super: identity in markdown (common.py:478-495,
        # not overridden by the markdown serializer)
        if formatting.get("strikethrough"):
            res = f"~~{res}~~"
    if p.include_hyperlinks and hyperlink:
        res = f"[{res}]({hyperlink})"
    return res


def _annotation_text(ann: dict) -> Optional[str]:
    """common.py:128-144 parity."""
    kind = ann.get("kind")
    if kind == "classification":
        classes = ann.get("predicted_classes") or []
        if classes:
            return str(classes[0].get("class_name", "")).replace("_", " ")
        return None
    if kind == "description":
        return ann.get("text")
    if kind == "molecule_data":
        return ann.get("smi")
    return None


def _serialize_annotations(state: DocSerializerState, item: dict) -> SerResult:
    p = state.params
    parts: List[str] = []
    for ann in item.get("annotations", []) or []:
        ann_text = _annotation_text(ann)
        if ann_text:
            if p.mark_annotations:
                parts.append(
                    f'<!--<annotation kind="{ann.get("kind")}">-->'
                    f"{ann_text}<!--<annotation/>-->"
                )
            else:
                parts.append(ann_text)
    return ser_result(text="\n\n".join(parts), span_source=item)


def _text_ser(state: DocSerializerState, item: dict, is_inline_scope: bool) -> SerResult:
    p = state.params
    label = item.get("label")
    escape_html = True
    escape_underscores = True
    res_parts: List[SerResult] = []
    if label == L.TITLE:
        text_part = f"# {item['text']}"
    elif label == L.SECTION_HEADER:
        text_part = f"{(item.get('level', 1) + 1) * '#'} {item['text']}"
    elif label == L.CODE:
        text_part = (
            f"`{item['text']}`" if is_inline_scope else f"```\n{item['text']}\n```"
        )
        escape_html = False
        escape_underscores = False
    elif label == L.FORMULA:
        if item.get("text"):
            text_part = (
                f"${item['text']}$" if is_inline_scope else f"$${item['text']}$$"
            )
        elif item.get("orig"):
            text_part = "<!-- formula-not-decoded -->"
        else:
            text_part = ""
        escape_html = False
        escape_underscores = False
    elif p.wrap_width:
        text_part = textwrap.fill(item["text"], width=p.wrap_width)
    else:
        text_part = item["text"]

    if text_part:
        res_parts.append(ser_result(text=text_part, span_source=item))

    # FloatingItem captions (CodeItem is also floating: document.py:1017)
    if item.get("captions") is not None and label == L.CODE:
        cap_res = state.serialize_captions(item)
        if cap_res.text:
            res_parts.append(cap_res)

    text = (" " if is_inline_scope else "\n\n").join(r.text for r in res_parts)
    text = _post_process(
        state,
        text,
        escape_html=escape_html,
        escape_underscores=escape_underscores,
        formatting=item.get("formatting"),
        hyperlink=item.get("hyperlink"),
    )
    return ser_result(text=text, span_source=res_parts)


def _table_ser(state: DocSerializerState, item: dict) -> SerResult:
    p = state.params
    res_parts: List[SerResult] = []
    cap_res = state.serialize_captions(item)
    if cap_res.text:
        res_parts.append(cap_res)
    if item["self_ref"] not in state.excluded:
        if p.include_annotations:
            ann_res = _serialize_annotations(state, item)
            if ann_res.text:
                res_parts.append(ann_res)
        table_text = T.to_pipe_table(item["data"])
        if table_text:
            res_parts.append(ser_result(text=table_text, span_source=item))
    text = "\n\n".join(r.text for r in res_parts)
    return ser_result(text=text, span_source=res_parts)


_MD_IMAGE_ERROR = (
    "<!-- 🖼️❌ Image not available. "
    "Please use `PdfPipelineOptions(generate_picture_images=True)` -->"
)


def _image_part_md(item: dict, p) -> str:
    """_serialize_image_part parity (markdown.py:329-374)."""
    ref = item.get("media_ref", "") or ""
    if p.image_mode == "embedded":
        if ref.startswith("data:"):
            return f"![Image]({ref})"
        # no bytes in the engine: the reference's get_image()->None path
        return _MD_IMAGE_ERROR
    if p.image_mode == "referenced":
        if not ref or ref.startswith("data:"):
            return p.image_placeholder
        return f"![Image]({ref})"
    return p.image_placeholder


def _picture_ser(state: DocSerializerState, item: dict, visited: Set[str]) -> SerResult:
    p = state.params
    res_parts: List[SerResult] = []
    cap_res = state.serialize_captions(item)
    if cap_res.text:
        res_parts.append(cap_res)
    if item["self_ref"] not in state.excluded:
        if p.include_annotations:
            ann_res = _serialize_annotations(state, item)
            if ann_res.text:
                res_parts.append(ann_res)
        # image part per ImageRefMode (markdown.py:329-374): the engine
        # has no image bytes, so EMBEDDED inlines data: URIs and
        # otherwise takes the reference's get_image()->None error path
        img_res = ser_result(
            text=_image_part_md(item, p), span_source=item
        )
        if img_res.text:
            res_parts.append(img_res)
        # chart tabular data -> pipe table (markdown.py:330-366)
        if p.enable_chart_tables:
            for ann in item.get("annotations", []) or []:
                if ann.get("kind") in (
                    "tabular_chart_data", "tabular_chart"
                ) and (ann.get("chart_data") or ann.get("data")):
                    tbl = T.to_pipe_table(
                        ann.get("chart_data") or ann["data"]
                    )
                    if tbl:
                        res_parts.append(ser_result(text=tbl, span_source=item))
                    break
    text = "\n\n".join(r.text for r in res_parts)
    return ser_result(text=text, span_source=res_parts)


def _kv_ser(state: DocSerializerState, item: dict) -> SerResult:
    if item["self_ref"] not in state.excluded:
        return ser_result(
            text="<!-- missing-key-value-item -->", span_source=item
        )
    return SerResult()


def _form_ser(state: DocSerializerState, item: dict) -> SerResult:
    if item["self_ref"] not in state.excluded:
        return ser_result(text="<!-- missing-form-item -->", span_source=item)
    return SerResult()


def _list_ser(
    state: DocSerializerState,
    item: dict,
    list_level: int,
    is_inline_scope: bool,
    visited: Set[str],
) -> SerResult:
    p = state.params
    parts = state.get_parts(
        item=item,
        list_level=list_level + 1,
        is_inline_scope=is_inline_scope,
        visited=visited,
    )
    sep = "\n"
    my_parts: List[SerResult] = []
    for part in parts:
        if part.text and part.text[0] == " " and my_parts:
            # merge already-indented sublist into previous item
            prev = my_parts[-1]
            prev.text = sep.join([prev.text, part.text])
            prev.spans.extend(part.spans)
        else:
            my_parts.append(part)
    indent_str = list_level * p.indent * " "
    is_ol = item.get("label") == L.GROUP_ORDERED_LIST
    texts = []
    for i, c in enumerate(my_parts):
        if c.text and c.text[0] == " ":
            texts.append(c.text)
        else:
            marker = "" if c.is_page_break else (f"{i + 1}. " if is_ol else "- ")
            texts.append(f"{indent_str}{marker}{c.text}")
    return ser_result(text=sep.join(texts), span_source=my_parts)


def _inline_ser(
    state: DocSerializerState, item: dict, list_level: int, visited: Set[str]
) -> SerResult:
    parts = state.get_parts(
        item=item, list_level=list_level, is_inline_scope=True, visited=visited
    )
    text = " ".join(p.text for p in parts if p.text)
    return ser_result(text=text, span_source=parts)


def _fallback_ser(state: DocSerializerState, item: dict) -> SerResult:
    if D.is_doc_item(item):
        return ser_result(text="<!-- missing-text -->", span_source=item)
    return SerResult()


def _doc_ser(state: DocSerializerState, parts: List[SerResult]) -> SerResult:
    text = "\n\n".join(p.text for p in parts if p.text)
    if state.requires_page_break:
        text = substitute_page_breaks(
            text, state.params.page_break_placeholder or ""
        )
    return ser_result(text=text, span_source=parts)


def _post_caption(state: DocSerializerState, text: str) -> str:
    # captions go through the full markdown post-process (common.py:524)
    return _post_process(state, text) if text else text


MARKDOWN_VTABLE = {
    "post_caption": _post_caption,
    "text": _text_ser,
    "table": _table_ser,
    "picture": _picture_ser,
    "key_value": _kv_ser,
    "form": _form_ser,
    "list": _list_ser,
    "inline": _inline_ser,
    "fallback": _fallback_ser,
    "doc": _doc_ser,
    "requires_page_break": lambda p: p.page_break_placeholder is not None,
}


def serialize_markdown(
    doc: dict, params: Optional[SerParams] = None, shared=None
) -> SerResult:
    """doc dict -> markdown SerResult (text + north-rule span sequence)."""
    state = DocSerializerState(
        doc, params or SerParams(), MARKDOWN_VTABLE, shared=shared
    )
    return state.serialize_doc()


def export_to_markdown(doc: dict, **kw) -> str:
    return serialize_markdown(doc, SerParams(**kw) if kw else None).text


def export_to_text(doc: dict) -> str:
    """Plain-text preset (document.py:3164-3182): markdown with no
    underscore escaping, empty image placeholder, 10^6 element cap."""
    return serialize_markdown(
        doc,
        SerParams(
            escape_underscores=False,
            image_placeholder="",
            stop_idx=1_000_000,
        ),
    ).text
