"""Deterministic synthetic corpus generator.

Every document's span stream is a pure function of its ``doc_id`` (stable
64-bit FNV hash -> seeded ``random.Random``), so any row can be regenerated
independently on any executor — no broadcast state, no wall clock, no
external data (FIXTURES.md §6).

Shapes covered (FIXTURES.md §5): minimal docs, multi-page papers with
nested lists / tables / pictures+captions / charts / formulas / code /
key-value regions, furniture (page header/footer), misplaced list items,
inline groups, checkboxes, and a skew adversary (``shape:skew``) with ~1e4
spans to exercise salting and Arrow batch bounds.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List

from .model import table as T

_WORDS = (
    "the quick brown fox jumps over lazy dog data spark engine document "
    "span tree table figure chart analysis result method model value_x "
    "pipeline batch arrow schema partition shuffle skew &amp entropy "
    "alpha beta gamma delta under_score sample text corpus token"
).split()

_KINDS_SECTION = [f"section_header_level_{i}" for i in range(1, 7)]


def _seed(doc_id: str) -> int:
    h = 0xCBF29CE484222325
    for ch in str(doc_id).encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _words(rng: random.Random, lo: int, hi: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


def _mk_span(kind: str, text: str = "", media_ref: str = "") -> Dict:
    return {"kind": kind, "text": text, "media_ref": media_ref}


def _random_otsl(rng: random.Random) -> str:
    """Random valid OTSL: build a sparse TableData, export with the grammar
    of document.py:1338-1428 (validated against the reference's parser in
    tests)."""
    nrows = rng.randint(2, 5)
    ncols = rng.randint(2, 4)
    cells = []
    occupied = [[False] * ncols for _ in range(nrows)]
    for i in range(nrows):
        for j in range(ncols):
            if occupied[i][j]:
                continue
            rs = cs = 1
            if rng.random() < 0.15 and i + 1 < nrows and not occupied[i + 1][j]:
                rs = 2
            if rng.random() < 0.15 and j + 1 < ncols and not occupied[i][j + 1]:
                cs = 2
            for di in range(rs):
                for dj in range(cs):
                    if i + di < nrows and j + dj < ncols:
                        occupied[i + di][j + dj] = True
            empty = rng.random() < 0.1
            cells.append(
                T.new_cell(
                    text="" if empty else _words(rng, 1, 2),
                    start_row=i, end_row=i + rs,
                    start_col=j, end_col=j + cs,
                    column_header=(i == 0 and not empty),
                )
            )
    return T.export_otsl(T.new_table_data(cells, nrows, ncols))


def gen_spans(doc_id: str) -> List[Dict]:
    """Generate the span stream for one document (offset added at the end)."""
    sid = str(doc_id)
    if sid.startswith("shape:"):
        out = _gen_shape(sid)
    else:
        out = _gen_random(sid)
    for i, s in enumerate(out):
        s["offset"] = i
    return out


def _gen_random(doc_id: str) -> List[Dict]:
    rng = random.Random(_seed(doc_id))
    out: List[Dict] = []
    out.append(_mk_span("page_header", f"running head {doc_id}"))
    out.append(_mk_span("title", _words(rng, 2, 6).title()))
    n_blocks = rng.randint(3, 14)
    fig_i = 0
    for _ in range(n_blocks):
        r = rng.random()
        if r < 0.30:
            out.append(_mk_span(rng.choice(["text", "paragraph"]),
                                _words(rng, 5, 30)))
        elif r < 0.42:
            out.append(_mk_span(rng.choice(_KINDS_SECTION[:3]),
                                _words(rng, 2, 5).title()))
        elif r < 0.56:
            out.extend(_gen_list(rng, depth=0))
        elif r < 0.64:
            kind = rng.choice(["picture", "chart"])
            fig_i += 1
            if rng.random() < 0.35:
                # inline data URI (deterministic fake payload): exercises
                # embedded-mode serialization and media externalization
                payload = "".join(
                    rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdef0123456789+/")
                    for _ in range(24)
                )
                ref = f"data:image/png;base64,{payload}=="
            else:
                ref = f"img://{doc_id}/{fig_i}"
            out.append(_mk_span(kind, "", ref))
            if rng.random() < 0.7:
                out.append(_mk_span("caption",
                                    f"Figure {fig_i}: {_words(rng, 3, 8)}"))
        elif r < 0.72:
            out.append(_mk_span("table_otsl", _random_otsl(rng)))
            if rng.random() < 0.5:
                out.append(_mk_span("caption", f"Table: {_words(rng, 3, 6)}"))
        elif r < 0.78:
            out.append(_mk_span("code", f"def f_{rng.randint(0, 99)}():\n"
                                        f"    return {rng.randint(0, 9)}"))
        elif r < 0.84:
            out.append(_mk_span("formula", f"x_{rng.randint(1, 9)} = "
                                           f"{rng.randint(1, 99)}"))
        elif r < 0.88:
            out.append(_mk_span("footnote", _words(rng, 4, 10)))
        elif r < 0.92:
            kv = ";".join(
                f"{rng.choice(_WORDS)}={rng.choice(_WORDS)}"
                for _ in range(rng.randint(1, 4))
            )
            out.append(_mk_span("key_value_region", kv))
        elif r < 0.95:
            out.append(_mk_span(rng.choice(
                ["checkbox_selected", "checkbox_unselected"]),
                _words(rng, 2, 5)))
        elif r < 0.975:
            # misplaced list items (normalization path)
            for _ in range(rng.randint(1, 3)):
                out.append(_mk_span("list_item", _words(rng, 2, 6)))
        else:
            out.append(_mk_span("inline_open"))
            for _ in range(rng.randint(2, 4)):
                out.append(_mk_span("text", _words(rng, 1, 3)))
            out.append(_mk_span("inline_close"))
        if rng.random() < 0.12:
            out.append(_mk_span("page_break"))
    out.append(_mk_span("page_footer", f"page footer {doc_id}"))
    return out


def _gen_list(rng: random.Random, depth: int) -> List[Dict]:
    ordered = rng.random() < 0.4
    out = [_mk_span("ordered_list_open" if ordered else "unordered_list_open")]
    for _ in range(rng.randint(2, 5)):
        out.append(_mk_span("list_item", _words(rng, 2, 8)))
        if depth < 2 and rng.random() < 0.2:
            out.extend(_gen_list(rng, depth + 1))
    out.append(_mk_span("ordered_list_close" if ordered
                        else "unordered_list_close"))
    return out


def _gen_shape(sid: str) -> List[Dict]:
    shape = sid.split(":", 1)[1]
    if shape == "minimal":
        return [
            _mk_span("page_header", "header"),
            _mk_span("title", "Minimal Doc"),
            _mk_span("text", "A paragraph."),
            _mk_span("picture", "", "img://minimal/1"),
            _mk_span("caption", "Figure 1: a duck"),
            _mk_span("page_footer", "footer"),
        ]
    if shape == "skew":
        rng = random.Random(_seed(sid))
        out = [_mk_span("title", "Skew Adversary")]
        for i in range(10000):
            out.append(_mk_span("text", _words(rng, 3, 8)))
            if i % 500 == 499:
                out.append(_mk_span("page_break"))
        return out
    if shape == "empty":
        return []
    if shape == "badclose":
        return [
            _mk_span("title", "Bad closes"),
            _mk_span("unordered_list_close"),
            _mk_span("text", "after"),
        ]
    # default: deterministic pseudo-random
    return _gen_random(sid)


SHAPE_IDS = ["shape:minimal", "shape:empty", "shape:badclose"]


def gen_corpus(n: int, prefix: str = "doc") -> Iterator[Dict]:
    """n synthetic docs + the fixed shapes (skew excluded; add explicitly)."""
    for sid in SHAPE_IDS:
        yield {"doc_id": sid, "spans": gen_spans(sid)}
    for i in range(n):
        did = f"{prefix}-{i:08d}"
        yield {"doc_id": did, "spans": gen_spans(did)}
