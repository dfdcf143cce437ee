"""Media-ref externalization: the Spark transform() expression and the
independent pure-Python twin must agree exactly (dual-implementation
check), and the doc-level rewrite mirrors the reference's
image_{count:06}_{hash}.png naming (document.py:2821-2868 — the
reference path itself is byte-dependent and PIL-less-untestable, so the
naming contract is pinned here)."""

import pandas as pd
import pytest

from docling_core_spark.fixtures import SHAPE_IDS, gen_spans
from docling_core_spark.ops.media import (
    externalize_media,
    externalize_spans_py,
    media_manifest,
    with_externalized_media,
)
from docling_core_spark.parse.spans import parse_span_doc

DOC_IDS = list(SHAPE_IDS) + [f"doc-{i:08d}" for i in range(24)]


@pytest.fixture(scope="module")
def spans_df(spark):
    from docling_core_spark import schema as S

    rows = [{"doc_id": d, "spans": gen_spans(d)} for d in DOC_IDS]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "spans"]), schema=S.DOCS_SCHEMA
    )


def test_sql_matches_python_twin(spans_df):
    got = {
        (r["doc_id"], r["pic_idx"]): (r["old_ref"], r["new_ref"])
        for r in media_manifest(spans_df).collect()
    }
    want = {}
    n_data = 0
    for d in DOC_IDS:
        _, manifest = externalize_spans_py(gen_spans(d))
        for m in manifest:
            want[(d, m["pic_idx"])] = (m["old_ref"], m["new_ref"])
            n_data += 1
    assert got == want
    assert n_data > 0, "fixtures must contain data: URI pictures"


def test_rewritten_spans_roundtrip(spans_df):
    """Externalized spans keep kind/text/offset and only rewrite data:
    refs; non-media spans are untouched."""
    out = {r["doc_id"]: list(r["spans"]) for r in
           externalize_media(spans_df).collect()}
    for d in DOC_IDS:
        orig = gen_spans(d)
        rewritten, _ = externalize_spans_py(orig)
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in out[d]
        ]
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in rewritten
        ]
        assert got == want, d


def test_doc_level_rewrite_naming():
    did = next(
        d for d in DOC_IDS
        if any(
            s["kind"] in ("picture", "chart")
            and (s["media_ref"] or "").startswith("data:")
            for s in gen_spans(d)
        )
    )
    doc, _ = parse_span_doc(did, gen_spans(did))
    out = with_externalized_media(doc, image_dir="art")
    rewritten = [
        (i, p["media_ref"])
        for i, p in enumerate(out["pictures"])
        if p["media_ref"].startswith("art/")
    ]
    assert rewritten
    for i, ref in rewritten:
        assert ref.startswith(f"art/image_{i:06d}_") and ref.endswith(".png")
    # non-data refs untouched
    for a, b in zip(doc["pictures"], out["pictures"]):
        if not (a["media_ref"] or "").startswith("data:"):
            assert a["media_ref"] == b["media_ref"]


def test_caption_pairs_sql_matches_python_twin(spans_df):
    from docling_core_spark.ops.media import (
        caption_pairs_py,
        media_captions,
    )

    got = {
        (r["doc_id"], r["pic_idx"]):
            (r["kind"], r["media_ref"], r["caption"], r["cap_src"])
        for r in media_captions(spans_df).collect()
    }
    want = {}
    srcs = set()
    for d in DOC_IDS:
        for c in caption_pairs_py(gen_spans(d)):
            want[(d, c["pic_idx"])] = (
                c["kind"], c["media_ref"], c["caption"], c["cap_src"]
            )
            srcs.add(c["cap_src"])
    assert got == want
    assert want, "fixtures must contain media spans"
    # the fixture corpus must exercise both captioned and uncaptioned
    assert "after" in srcs and "none" in srcs


def test_caption_pairs_positional_rule():
    from docling_core_spark.ops.media import caption_pairs_py

    spans = [
        {"kind": "caption", "text": "before-cap", "media_ref": ""},
        {"kind": "picture", "text": "", "media_ref": "u1"},
        {"kind": "caption", "text": "after-cap", "media_ref": ""},
        {"kind": "chart", "text": "", "media_ref": "u2"},
        {"kind": "text", "text": "prose", "media_ref": ""},
        {"kind": "picture", "text": "", "media_ref": "u3"},
    ]
    rows = {c["pic_idx"]: c for c in caption_pairs_py(spans)}
    # picture 1: caption after wins over caption before
    assert rows[1]["caption"] == "after-cap" and rows[1]["cap_src"] == "after"
    # chart 2: only the preceding caption matches
    assert rows[2]["caption"] == "after-cap" and rows[2]["cap_src"] == "before"
    # picture 3 (terminal, prose neighbor): no caption
    assert rows[3]["caption"] == "" and rows[3]["cap_src"] == "none"
