"""Hierarchical (structure-aware) chunker.

Parity target: HierarchicalChunker.chunk
(transforms/chunker/hierarchical_chunker.py:212-262) with
ChunkingDocSerializer (:175-193): markdown serialization with triplet
tables, empty image placeholder and no markdown escaping.

Semantics:
  - pre-order DFS with groups over the body layer;
  - Title/SectionHeader items update the running `heading_by_level`
    context (Title -> level 0; deeper levels are dropped when a new
    heading at a shallower level appears) and do NOT emit chunks;
  - each list group, inline group or doc item (not yet visited) is
    serialized into one chunk; the serializer's span list becomes
    `doc_items` metadata;
  - empty serializations are skipped; headings are the sorted-by-level
    context snapshot at emission time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Set

from ..model import doc as D
from ..model import labels as L
from ..model import table as T
from ..serialize.common import DocSerializerState, SerParams, SerResult, ser_result
from ..serialize.markdown import MARKDOWN_VTABLE


@dataclass
class Chunk:
    """DocChunk analog (hierarchical_chunker.py:120-124)."""

    text: str
    doc_items: List[dict] = field(default_factory=list)  # item dicts
    headings: Optional[List[str]] = None

    @property
    def doc_item_refs(self) -> List[str]:
        return [it["self_ref"] for it in self.doc_items]


def _triplet_table_ser(state: DocSerializerState, item: dict) -> SerResult:
    """TripletTableSerializer (hierarchical_chunker.py:126-172): caption
    part first, then 'row, col = value' triplets; tables with <1 body
    row or <2 cols contribute no table text."""
    res_parts: List[SerResult] = []
    cap_res = state.serialize_captions(item)
    if cap_res.text:
        res_parts.append(cap_res)
    if item["self_ref"] not in state.excluded:
        table_text = T.to_triplets(item["data"])
        if table_text:
            res_parts.append(ser_result(text=table_text, span_source=item))
    text = "\n\n".join(r.text for r in res_parts)
    return ser_result(text=text, span_source=res_parts)


CHUNKING_VTABLE = dict(MARKDOWN_VTABLE, table=_triplet_table_ser)


def chunking_params() -> SerParams:
    """ChunkingDocSerializer params (hierarchical_chunker.py:175-193)."""
    return SerParams(
        layers=L.CONTENT_LAYERS,
        image_placeholder="",
        escape_underscores=False,
        escape_html=False,
    )


def chunk_doc(doc: dict, delim: str = "\n") -> List[Chunk]:
    """Yield chunks in reading order (hierarchical_chunker.py:225-262)."""
    state = DocSerializerState(doc, chunking_params(), CHUNKING_VTABLE)
    heading_by_level: dict = {}
    visited: Set[str] = set()
    chunks: List[Chunk] = []
    for item, _level in D.iterate_items(doc, with_groups=True):
        ref = item["self_ref"]
        if ref in state.excluded:
            continue
        label = item.get("label")
        if item.get("kind") == "texts" and label in (
            L.TITLE, L.SECTION_HEADER,
        ):
            lvl = item.get("level", 1) if label == L.SECTION_HEADER else 0
            heading_by_level[lvl] = item["text"]
            for k in [k for k in heading_by_level if k > lvl]:
                heading_by_level.pop(k, None)
            continue
        if item.get("kind") == "groups":
            if label not in (
                L.GROUP_LIST, L.GROUP_ORDERED_LIST, L.GROUP_INLINE,
            ):
                continue
            if ref in visited:
                continue
            res = state.serialize_item(item, visited=visited)
        elif D.is_doc_item(item) and ref not in visited:
            res = state.serialize_item(item, visited=visited)
        else:
            continue
        if not res.text:
            continue
        if res.spans:
            chunks.append(
                Chunk(
                    text=res.text,
                    doc_items=list(res.spans),
                    headings=(
                        [
                            heading_by_level[k]
                            for k in sorted(heading_by_level)
                        ]
                        or None
                    ),
                )
            )
    return chunks


def contextualize(chunk: Chunk, delim: str = "\n") -> str:
    """Embedding-targeted context text (chunker/base.py:69-96): headings
    then the chunk text, delim-joined."""
    items: List[str] = []
    if chunk.headings:
        items.append(delim.join(chunk.headings))
    items.append(chunk.text)
    return delim.join(items)
