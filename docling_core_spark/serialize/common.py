"""Shared serializer driver: DFS with page-break injection, exclusion masks,
caption suppression, span-sequence assembly.

Parity: transforms/serializer/common.py (DocSerializer, _iterate_items,
create_ser_result). The reference's strategy-object architecture becomes a
pair of plain functions parameterized by a per-format vtable — same
semantics, no Pydantic, safe to call millions of times per executor.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, List, Optional, Set, Tuple

from ..model import doc as D
from ..model import labels as L

PAGE_BREAK_SENTINEL = "#_#_DOCLING_DOC_PAGE_BREAK_{}_{}_#_#"  # common.py:565-575


@dataclass
class SerResult:
    """Text + ordered deduped span sources (common.py:147-176)."""

    text: str = ""
    spans: List[dict] = field(default_factory=list)  # item dicts
    is_page_break: bool = False


def ser_result(
    text: str = "",
    span_source=None,
) -> SerResult:
    """Create a SerResult, deduping spans by self_ref, first-seen order."""
    if span_source is None:
        return SerResult(text=text)
    if isinstance(span_source, dict):  # single item
        return SerResult(text=text, spans=[span_source])
    spans: List[dict] = []
    seen: Set[str] = set()
    for res in span_source:
        for item in res.spans:
            ref = item["self_ref"]
            if ref not in seen:
                seen.add(ref)
                spans.append(item)
    return SerResult(text=text, spans=spans)


@dataclass
class SerParams:
    """CommonParams parity (common.py:179-199) + markdown/doctags extras."""

    labels: frozenset = L.DOCUMENT_TOKENS_EXPORT_LABELS
    layers: frozenset = frozenset({L.LAYER_BODY})
    pages: Optional[frozenset] = None
    start_idx: int = 0
    stop_idx: int = 2**62
    include_formatting: bool = True
    include_hyperlinks: bool = True
    caption_delim: str = " "
    # html output style (HTMLOutputStyle parity, html.py:108-118)
    html_output_style: str = "single_column"  # single_column | split_page
    # image handling (ImageRefMode parity, base.py:9-14): the engine
    # carries media_ref URI strings, never image bytes, so "embedded"
    # can only inline data: URIs — exactly the reference's behavior in a
    # PIL-less environment (get_image()->None fallback paths)
    image_mode: str = "placeholder"  # placeholder | embedded | referenced
    # markdown
    image_placeholder: str = "<!-- image -->"
    enable_chart_tables: bool = True
    indent: int = 4
    wrap_width: Optional[int] = None
    page_break_placeholder: Optional[str] = None
    escape_underscores: bool = True
    escape_html: bool = True
    include_annotations: bool = True
    mark_annotations: bool = False
    # doctags
    add_location: bool = True
    add_content: bool = True
    add_table_cell_location: bool = False
    minified: bool = False
    # text mode
    strict_text: bool = False


def iterate_with_page_breaks(
    doc: dict,
    layers: frozenset,
    node: Optional[dict] = None,
    add_page_breaks: bool = False,
    visited: Optional[Set[str]] = None,
    traverse_pictures: bool = False,
    shared: Optional[D.SharedDocContext] = None,
) -> Iterator[dict]:
    """DFS (with groups) interleaving synthetic page-break nodes.

    Parity: serializer/common.py:73-125 — a page break is emitted *before* a
    list/inline group node when the group's first DocItem starts a new page,
    and between consecutive DocItems whose first-prov page increases.

    Exact-parity notes: `prev_page` and the pb counter are *frame-local*
    (each recursive call restarts them), the group-peek pb does NOT advance
    the counter, and downstream dedup of the resulting duplicate
    ``#/pb/{i}`` refs happens in the caller's visited set — this ref
    collision is what prevents double page-break emission in the reference.
    """
    if not add_page_breaks:
        # pure pass-through: identical item sequence, no pb logic to run
        for item, _lvl in D.iterate_items(
            doc, root=node, with_groups=True, included_content_layers=layers,
            traverse_pictures=traverse_pictures, shared=shared,
        ):
            yield item
        return

    my_visited: Set[str] = visited if visited is not None else set()
    prev_page: Optional[int] = None
    page_break_i = 0

    for item, _lvl in D.iterate_items(
        doc, root=node, with_groups=True, included_content_layers=layers,
        traverse_pictures=traverse_pictures, shared=shared,
    ):
        if add_page_breaks:
            if (
                item.get("kind") == "groups"
                and item.get("label")
                in (L.GROUP_LIST, L.GROUP_ORDERED_LIST, L.GROUP_INLINE)
                and item["self_ref"] not in my_visited
            ):
                # if the group starts on a new page, yield pb before it
                my_visited.add(item["self_ref"])
                for it in iterate_with_page_breaks(
                    doc,
                    layers=layers,
                    node=item,
                    add_page_breaks=add_page_breaks,
                    visited=my_visited,
                    traverse_pictures=traverse_pictures,
                    shared=shared,
                ):
                    if D.is_doc_item(it) and it.get("prov"):
                        page_no = it["prov"][0]["page_no"]
                        if prev_page is not None and page_no > prev_page:
                            yield {
                                "self_ref": f"#/pb/{page_break_i}",
                                "kind": "_page_break",
                                "prev_page": prev_page,
                                "next_page": page_no,
                            }
                        break
            elif D.is_doc_item(item) and item.get("prov"):
                page_no = item["prov"][0]["page_no"]
                if prev_page is None or page_no > prev_page:
                    if prev_page is not None:
                        yield {
                            "self_ref": f"#/pb/{page_break_i}",
                            "kind": "_page_break",
                            "prev_page": prev_page,
                            "next_page": page_no,
                        }
                        page_break_i += 1
                    prev_page = page_no
        yield item


def captions_of_some_item(
    doc: dict, shared: Optional[D.SharedDocContext] = None
) -> Set[str]:
    """Refs that are captions of a floating item (common.py:225-238)."""
    if shared is not None and shared.captions is not None:
        return shared.captions
    refs: Set[str] = set()
    for item, _ in D.iterate_items(
        doc,
        with_groups=True,
        traverse_pictures=True,
        included_content_layers=L.CONTENT_LAYERS,
        shared=shared,
    ):
        for cap in item.get("captions", []) or []:
            refs.add(cap)
    if shared is not None:
        shared.captions = refs
    return refs


def _excl_key(params: SerParams):
    return (
        params.start_idx,
        params.stop_idx,
        params.labels if isinstance(params.labels, frozenset)
        else frozenset(params.labels),
        params.layers,
        None if params.pages is None else frozenset(params.pages),
    )


def excluded_refs(
    doc: dict, params: SerParams,
    shared: Optional[D.SharedDocContext] = None,
) -> Set[str]:
    """Slice/label/layer/page exclusion set (common.py:240-275)."""
    if shared is not None:
        memo_key = _excl_key(params)
        cached = shared.excluded.get(memo_key)
        if cached is not None:
            return cached
    out: Set[str] = set()
    for ix, item in enumerate(
        iterate_with_page_breaks(
            doc, layers=params.layers, traverse_pictures=True, shared=shared
        )
    ):
        excl = ix < params.start_idx or ix >= params.stop_idx
        if not excl and D.is_doc_item(item):
            excl = (
                item.get("label") not in params.labels
                or item.get("content_layer", L.LAYER_BODY) not in params.layers
                or (
                    params.pages is not None
                    and (
                        not item.get("prov")
                        or item["prov"][0]["page_no"] not in params.pages
                    )
                )
            )
        if excl:
            out.add(item["self_ref"])
    if shared is not None:
        shared.excluded[memo_key] = out
    return out


class DocSerializerState:
    """Per-document serialization context shared by all formats."""

    def __init__(
        self,
        doc: dict,
        params: SerParams,
        vtable: Dict[str, Callable],
        shared: Optional[D.SharedDocContext] = None,
    ):
        self.doc = doc
        self.params = params
        self.vtable = vtable
        self.shared = shared
        self.captions = captions_of_some_item(doc, shared=shared)
        self.excluded = excluded_refs(doc, params, shared=shared)
        self.requires_page_break = vtable.get("requires_page_break", lambda p: False)(
            params
        )

    # -- driver (parity: DocSerializer.serialize / get_parts) --------------

    def serialize_item(
        self,
        item: dict,
        list_level: int = 0,
        is_inline_scope: bool = False,
        visited: Optional[Set[str]] = None,
    ) -> SerResult:
        my_visited = visited if visited is not None else set()
        my_visited.add(item["self_ref"])
        kind = item.get("kind")
        label = item.get("label")
        vt = self.vtable
        if kind == "_page_break":
            txt = PAGE_BREAK_SENTINEL.format(item["prev_page"], item["next_page"])
            r = SerResult(text=txt, is_page_break=True)
            return r
        if kind == "groups":
            if label in (L.GROUP_LIST, L.GROUP_ORDERED_LIST):
                return vt["list"](self, item, list_level, is_inline_scope, my_visited)
            if label == L.GROUP_INLINE:
                return vt["inline"](self, item, list_level, my_visited)
            return SerResult()
        if kind == "texts":
            if item["self_ref"] in self.captions:
                return SerResult()  # handled by owner floating item
            if item["self_ref"] in self.excluded:
                return SerResult()
            return vt["text"](self, item, is_inline_scope)
        if kind == "tables":
            return vt["table"](self, item)
        if kind == "pictures":
            return vt["picture"](self, item, my_visited)
        if kind == "key_value_items":
            return vt["key_value"](self, item)
        if kind == "form_items":
            return vt["form"](self, item)
        return vt.get("fallback", lambda *a: SerResult())(self, item)

    def get_parts(
        self,
        item: Optional[dict] = None,
        list_level: int = 0,
        is_inline_scope: bool = False,
        visited: Optional[Set[str]] = None,
    ) -> List[SerResult]:
        parts: List[SerResult] = []
        my_visited: Set[str] = visited if visited is not None else set()
        for node in iterate_with_page_breaks(
            self.doc,
            layers=self.params.layers,
            node=item,
            add_page_breaks=self.requires_page_break,
            shared=self.shared,
        ):
            if node["self_ref"] in my_visited:
                continue
            my_visited.add(node["self_ref"])
            part = self.serialize_item(
                node,
                list_level=list_level,
                is_inline_scope=is_inline_scope,
                visited=my_visited,
            )
            if part.text:
                parts.append(part)
        return parts

    def serialize_doc(self) -> SerResult:
        parts = self.get_parts()
        return self.vtable["doc"](self, parts)

    # -- captions (common.py:507-527) --------------------------------------

    def serialize_captions(self, item: dict) -> SerResult:
        if L.CAPTION not in self.params.labels:
            return ser_result(text="")
        results: List[SerResult] = []
        for cap_ref in item.get("captions", []) or []:
            cap = (
                self.shared.resolve(cap_ref)
                if self.shared is not None
                else D.resolve(self.doc, cap_ref)
            )
            if (
                cap is not None
                and cap.get("kind") == "texts"
                and cap_ref not in self.excluded
            ):
                results.append(SerResult(text=cap.get("text", ""), spans=[cap]))
        text = self.params.caption_delim.join(r.text for r in results)
        post = self.vtable.get("post_caption")
        if post is not None:
            text = post(self, text)
        return ser_result(text=text, span_source=results)


def substitute_page_breaks(text: str, placeholder: str) -> str:
    """Replace sentinel markers with the format's placeholder."""
    import re

    pattern = re.compile(
        r"#_#_DOCLING_DOC_PAGE_BREAK_(\d+)_(\d+)_#_#"
    )
    return pattern.sub(lambda m: placeholder, text)
