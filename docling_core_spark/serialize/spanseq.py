"""North-rule span sequence: the ordered deduped DocItems of a document
serialization, projected to (kind, text, media_ref, order).

Parity: SerializationResult.spans (serializer/common.py:147-176) — the
per-document invariant payload `(kind, text, media_ref, order)` of
BASELINE.json.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .common import SerParams, SerResult
from .markdown import serialize_markdown


def span_seq_from_result(res: SerResult) -> List[Tuple[str, str, str, int]]:
    out = []
    for i, item in enumerate(res.spans):
        out.append(
            (
                item.get("label", ""),
                item.get("text", "") or "",
                item.get("media_ref", "") or "",
                i,
            )
        )
    return out


def doc_span_seq(
    doc: dict, params: Optional[SerParams] = None
) -> List[Tuple[str, str, str, int]]:
    return span_seq_from_result(serialize_markdown(doc, params))
