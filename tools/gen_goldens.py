"""Generate golden parquet oracles for the pipeline_* gate queries.

For each sf the driver tests at, rebuild the deterministic synthetic
corpus (same ids as `__spark_entry__._synth`: SHAPE_IDS + doc-%08d sized
by the sf's documents table) and compute the expected output of every
pipeline_* query **through the reference library's own API** wherever the
reference defines the semantics:

  reference-derived (true independent oracle)
    - pipeline_span_seq    : docling-core serializer spans
                             (transforms/serializer/common.py:147-176)
    - pipeline_exports     : md5 of the reference's own markdown /
                             doctags / html-body / element-tree exports
    - pipeline_chunks      : reference HierarchicalChunker triples
                             (hierarchical_chunker.py:212-262); token
                             counts are our deterministic labeling fn
    - pipeline_metrics     : aggregates cross-checked against reference
                             item counts + fixture-derived expectations

  engine-snapshot (single-threaded regression golden; documented)
    - pipeline_doctags_roundtrip : the reference's load_from_doctags
      crashes on <chart> pages with no image (UnboundLocalError
      pic_title, document.py:3841ff) so it cannot replay ~40% of the
      corpus. Since round 3 the NON-chart subset has its own
      reference-derived golden (pipeline_doctags_roundtrip_ref:
      reload_md5 computed by replaying the doctags through the
      reference's load_from_doctags -> export_to_doctags chain, and
      asserted equal to the engine's row); the all-docs golden pins the
      single-threaded pure-Python result, so the gate proves the
      distributed run (partitioning, Arrow batching, ordering)
      reproduces it exactly.
    - pipeline_chunks_hybrid : the ALL-docs golden pins the
      deterministic stand-in for the semchunk plain-text split rule
      (semchunk absent in sandbox); contract tests in
      tests/test_chunkers.py. Since round 4 the docs that never enter
      that branch (~80% of the corpus) have their own
      reference-derived golden (pipeline_chunks_hybrid_ref): the
      reference's HybridChunker itself runs on the engine's vendored
      WordPiece tokenizer through the public BaseTokenizer protocol
      (tokenizer/base.py:9-27), and its chunks are asserted equal to
      the engine's at generation time.
    - pipeline_json_roundtrip : md5 of our canonical JSON dump (the
      generator additionally reports whether the dump byte-matches the
      reference's model_dump).

Every reference-derived row is ASSERTED equal to the engine's own
single-threaded output at generation time — a mismatch aborts the build,
so a golden can never silently encode engine behavior that diverges from
the reference.

Usage: python tools/gen_goldens.py [sf0.001 sf0.01]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

TESTDATA = "/root/testdata"

VIOLATION_CATEGORIES = [
    "bad_version", "broken_tree", "dangling_ref", "bad_label",
    "bad_layer", "bad_graph_link", "bad_table_shape", "bad_prov",
    "bad_caption_ref",
]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def corpus_ids(sf_dir: str) -> list:
    from docling_core_spark.fixtures import SHAPE_IDS

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return list(SHAPE_IDS) + [f"doc-{i:08d}" for i in range(n)]


_REF_HYBRID_CK = None


def _ref_hybrid_ck():
    """Per-process cached reference HybridChunker wired to the engine's
    vendored WordPiece tokenizer (fork-pool safe: built lazily)."""
    global _REF_HYBRID_CK
    if _REF_HYBRID_CK is None:
        from ref_oracle import make_ref_hybrid_chunker

        _REF_HYBRID_CK = make_ref_hybrid_chunker(max_tokens=64)
    return _REF_HYBRID_CK


def gold_for_doc(did: str) -> dict:
    from docling_core_spark.chunk import chunk_doc
    from docling_core_spark.fixtures import gen_spans
    from docling_core_spark.parse.spans import parse_span_doc
    from docling_core_spark.pipeline import (
        chunk_rows_doc,
        json_roundtrip_doc,
        process_doc,
        roundtrip_doc,
    )
    from docling_core_spark.serialize.html import html_body

    from ref_oracle import build_ref_doc, ref_span_seq

    spans = gen_spans(did)
    our = process_doc(did, spans)
    rdoc = build_ref_doc(spans, name=did)
    errs = []

    # --- span_seq (reference-derived) ---
    ref_seq = [tuple(x) for x in ref_span_seq(rdoc)]
    mine_seq = [
        (s["kind"], s["text"], s["media_ref"], s["order"])
        for s in our["span_seq"]
    ]
    if mine_seq != ref_seq:
        errs.append("span_seq")
    span_rows = [
        {"doc_id": did, "ord": o, "kind": k, "text": t, "media_ref": m}
        for (k, t, m, o) in ref_seq
    ]

    # --- exports (reference-derived) ---
    ref_md = rdoc.export_to_markdown()
    ref_dt = rdoc.export_to_doctags()
    ref_html_full = rdoc.export_to_html()
    ref_hb = html_body(ref_html_full)
    ref_et = rdoc.export_to_element_tree()
    if our["markdown"] != ref_md:
        errs.append("markdown")
    if our["doctags"] != ref_dt:
        errs.append("doctags")
    if our["html"] != ref_html_full:
        errs.append("html_full")
    if our["etree"] != ref_et:
        errs.append("etree")
    n_items_ref = sum(
        len(getattr(rdoc, a))
        for a in ("texts", "tables", "pictures", "groups",
                  "key_value_items", "form_items")
    )
    if n_items_ref != our["n_items"]:
        errs.append(f"n_items({our['n_items']}!={n_items_ref})")
    if len(rdoc.pages) != our["n_pages"]:
        errs.append(f"n_pages({our['n_pages']}!={len(rdoc.pages)})")
    export_row = {
        "doc_id": did,
        "markdown_md5": _md5(ref_md),
        "doctags_md5": _md5(ref_dt),
        "html_body_md5": _md5(ref_hb),
        "html_full_md5": _md5(ref_html_full),
        "etree_md5": _md5(ref_et),
        "n_items": n_items_ref,
        "n_pages": len(rdoc.pages),
        "tree_valid": bool(our["tree_valid"]),
    }
    if not our["tree_valid"]:
        errs.append("tree_valid")

    # --- hierarchical chunks (reference-derived triples) ---
    from docling_core.transforms.chunker.hierarchical_chunker import (
        HierarchicalChunker,
    )

    mydoc, _ = parse_span_doc(did, spans)
    mine_ch = [
        (c.text, tuple(c.headings or []), tuple(c.doc_item_refs))
        for c in chunk_doc(mydoc)
    ]
    ref_ch = [
        (
            c.text,
            tuple(c.meta.headings or []),
            tuple(it.self_ref for it in c.meta.doc_items),
        )
        for c in HierarchicalChunker().chunk(rdoc)
    ]
    if mine_ch != ref_ch:
        errs.append("chunks")
    chunk_rows = chunk_rows_doc(did, spans, hybrid=False, max_tokens=64)
    hybrid_flagged = chunk_rows_doc(
        did, spans, hybrid=True, max_tokens=64, with_flag=True
    )
    needs_split = any(r["needs_text_split"] for r in hybrid_flagged)
    hybrid_rows = [
        {k: v for k, v in r.items() if k != "needs_text_split"}
        for r in hybrid_flagged
    ]

    # --- hybrid chunks, reference-derived twin: run the REFERENCE's
    # own HybridChunker on the engine's vendored WordPiece tokenizer
    # (BaseTokenizer adapter) AND, since round 5, the vendored semantic
    # splitter (chunk/semsplit.py) through the semchunk-shaped stub —
    # so the twin now covers EVERY doc, including the oversized-text
    # branch the reference hands to semchunk (the split rule itself is
    # shared-injected, not independently oracled; goldens/README.md). ---
    from docling_core_spark.chunk.wordpiece import wordpiece_count_tokens

    ref_hybrid_rows = None
    ref_hy_chunks = list(_ref_hybrid_ck().chunk(rdoc))
    if ref_hy_chunks is not None:
        ref_hybrid_rows = [
            {
                "doc_id": did,
                "chunk_idx": i,
                "text": c.text,
                "headings": list(c.meta.headings or []),
                "item_refs": [it.self_ref for it in c.meta.doc_items],
                "n_tokens": wordpiece_count_tokens(c.text),
                "context_tokens": wordpiece_count_tokens(
                    _ref_hybrid_ck().contextualize(chunk=c)
                ),
            }
            for i, c in enumerate(ref_hy_chunks)
        ]
        if ref_hybrid_rows != hybrid_rows:
            errs.append("hybrid_ref(rows)")

    # --- variant exports (reference-derived: image modes, split-page
    # HTML, YAML, legacy writer) ---
    import yaml as _yaml

    from docling_core.types.doc.base import ImageRefMode
    from docling_core.transforms.serializer.html import (
        HTMLDocSerializer,
        HTMLOutputStyle,
        HTMLParams,
    )
    from docling_core.utils.legacy import docling_document_to_legacy
    from docling_core_spark.pipeline import variant_exports_doc

    ref_legacy = docling_document_to_legacy(rdoc).model_dump(
        mode="json", by_alias=True, exclude_none=True
    )
    ref_legacy.pop("file-info", None)
    variant_row = {
        "doc_id": did,
        "md_embedded_md5": _md5(
            rdoc.export_to_markdown(image_mode=ImageRefMode.EMBEDDED)
        ),
        "md_referenced_md5": _md5(
            rdoc.export_to_markdown(image_mode=ImageRefMode.REFERENCED)
        ),
        "html_embedded_md5": _md5(
            rdoc.export_to_html(image_mode=ImageRefMode.EMBEDDED)
        ),
        "html_referenced_md5": _md5(
            rdoc.export_to_html(image_mode=ImageRefMode.REFERENCED)
        ),
        "html_split_page_md5": _md5(
            HTMLDocSerializer(
                doc=rdoc,
                params=HTMLParams(output_style=HTMLOutputStyle.SPLIT_PAGE),
            ).serialize().text
        ),
        "yaml_md5": _md5(
            _yaml.dump(rdoc.export_to_dict(), default_flow_style=False)
        ),
        "legacy_md5": _md5(json.dumps(ref_legacy, sort_keys=True)),
    }
    mine_variant = variant_exports_doc(did, spans)
    for k, v in variant_row.items():
        if mine_variant[k] != v:
            errs.append(f"variant:{k}")

    # --- media externalization (independent pure-Python twin of the
    # Spark transform() expression — dual-implementation oracle) ---
    from docling_core_spark.ops.media import (
        caption_pairs_py,
        externalize_spans_py,
    )

    _, manifest = externalize_spans_py(spans)
    media_rows = [{"doc_id": did, **m} for m in manifest]
    # media-caption pairs (pure-Python twin of caption_pairs_sql)
    caption_rows = [{"doc_id": did, **c} for c in caption_pairs_py(spans)]

    # --- doctags roundtrip ---
    rt = roundtrip_doc(did, spans)
    # reference-derived twin for the non-chart subset: replay OUR
    # serializer's doctags (already asserted byte-equal to the
    # reference's export above) through the reference's own
    # load_from_doctags -> export_to_doctags chain. The engine row must
    # match it exactly — so for these docs the golden is an independent
    # reference oracle, not an engine snapshot. Chart docs stay
    # snapshot-only (reference crash: UnboundLocalError pic_title,
    # document.py:3841ff).
    ref_rt_row = None
    if not rt["has_chart"]:
        from docling_core.types.doc.document import (
            DocTagsDocument as _RefDT,
            DoclingDocument as _RefDoc,
        )

        def _ref_reload(s: str) -> str:
            dt = _RefDT.from_multipage_doctags_and_images(s, None)
            return _RefDoc.load_from_doctags(
                dt, document_name=did
            ).export_to_doctags()

        ref_s2 = _ref_reload(ref_dt)
        ref_s3 = _ref_reload(ref_s2)
        ref_rt_row = {
            "doc_id": did,
            "reload_md5": _md5(ref_s2),
            "stable": ref_s2 == ref_s3,
        }
        if (ref_rt_row["reload_md5"] != rt["reload_md5"]
                or ref_rt_row["stable"] != rt["stable"]):
            errs.append("doctags_roundtrip_ref")

    jrt = json_roundtrip_doc(did, spans)
    if not rt["stable"]:
        # The reference's OWN OTSL xcel-span re-encoding is not a fixed
        # point after one reload (a 2D-span <xcel> run can re-encode as
        # <lcel> on the next reload; verified against the reference's
        # load_from_doctags -> export_to_doctags chain on the isolated
        # fragment — first seen at sf0.1, docs 1478/3733/4299). Accept
        # the instability only when it is reference-faithful: confined
        # to <otsl> fragments, every such fragment replays byte-equal
        # to the reference at two reload depths, and the chain
        # converges by the third reload.
        errs.extend(_check_unstable_ref_faithful(did, spans))
    if not jrt["stable"]:
        errs.append("json_roundtrip_unstable")
    # json dump is REFERENCE-DERIVED: the engine's canonical JSON must
    # byte-match the reference's model_dump (sort_keys-serialized)
    ref_payload = json.dumps(
        rdoc.model_dump(mode="json", by_alias=True, exclude_none=True),
        sort_keys=True,
    )
    json_matches_ref = _md5(ref_payload) == jrt["json_md5"]
    if not json_matches_ref:
        errs.append("json_dump")
    jrt = {
        "doc_id": did,
        "json_bytes": len(ref_payload),
        "json_md5": _md5(ref_payload),
        "stable": jrt["stable"],
    }

    return {
        "doc_id": did,
        "errs": errs,
        "span_rows": span_rows,
        "export_row": export_row,
        "chunk_rows": chunk_rows,
        "hybrid_rows": hybrid_rows,
        "ref_hybrid_rows": ref_hybrid_rows,
        "variant_row": variant_row,
        "media_rows": media_rows,
        "caption_rows": caption_rows,
        "rt_row": {k: rt[k] for k in ("doc_id", "reload_md5", "stable")},
        "ref_rt_row": ref_rt_row,
        "jrt_row": jrt,
        "json_matches_ref": json_matches_ref,
        "metrics": {
            "n_items": our["n_items"],
            "n_spans_in": our["n_spans_in"],
            "parse_anomalies": our["parse_anomalies"],
            "tree_valid": our["tree_valid"],
            "violations": our["violations"],
        },
    }


def _scalarize(rows: list) -> list:
    out = []
    for r in rows:
        out.append(
            {
                "doc_id": r["doc_id"],
                "chunk_idx": r["chunk_idx"],
                "text": r["text"],
                "headings": "|".join(r["headings"] or []),
                "item_refs": "|".join(r["item_refs"]),
                "n_tokens": r["n_tokens"],
                "context_tokens": r["context_tokens"],
            }
        )
    return out


_OTSL_RE = None


def _check_unstable_ref_faithful(did: str, spans) -> list:
    """A doc whose doctags roundtrip is not a fixed point after one
    reload is acceptable ONLY if the instability is the reference's own
    OTSL xcel-span behavior (see call site). Returns error labels (empty
    = verified reference-faithful)."""
    import re as _re

    from docling_core.types.doc.document import (
        DocTagsDocument as _RefDT,
        DoclingDocument as _RefDoc,
    )

    from docling_core_spark.parse.doctags import parse_doctags
    from docling_core_spark.pipeline import parse_span_doc
    from docling_core_spark.serialize.doctags import export_to_doctags as ex

    doc, _ = parse_span_doc(did, list(spans) if spans is not None else [])
    chain = [ex(doc)]
    for _ in range(4):
        chain.append(ex(parse_doctags(chain[-1], name=did)))
    errs = []
    if chain[3] != chain[4]:
        errs.append("doctags_roundtrip_divergent")
    otsl_re = _re.compile(r"<otsl>.*?</otsl>", _re.S)
    # instability must be confined to otsl fragments
    if otsl_re.sub("", chain[2]) != otsl_re.sub("", chain[3]):
        errs.append("doctags_roundtrip_unstable_nonotsl")
    # every otsl fragment must replay byte-equal to the reference at
    # two reload depths (the reference cannot replay the WHOLE doc when
    # charts are present — document.py:3841ff — but isolated otsl
    # fragments always can)
    def _ref_reload(s: str) -> str:
        dt = _RefDT.from_multipage_doctags_and_images(s, None)
        return _RefDoc.load_from_doctags(
            dt, document_name=did
        ).export_to_doctags()

    for frag in otsl_re.findall(chain[0]):
        fdoc = f"<doctag>{frag}</doctag>"
        e1 = ex(parse_doctags(fdoc, name="frag"))
        e2 = ex(parse_doctags(e1, name="frag"))
        if e1 != _ref_reload(fdoc) or e2 != _ref_reload(e1):
            errs.append("doctags_roundtrip_otsl_ref_diverge")
            break
    return errs


def overlay_gold_for_doc(did: str) -> dict:
    """Engine vs reference item-flatten for one layout doc (the
    doc_render_overlay gate's golden): parse gen_layout_doctags(did)
    through BOTH the engine's parse_doctags + iterate_items chain and
    the reference's load_from_doctags + iterate_items chain
    (document.py:3324ff), flatten each to visualizer pixel rows
    (reading_order_visualizer.py:115-120 quantization on the 500px loc
    canvas), and assert equality — the committed golden rows are the
    REFERENCE-derived ones."""
    from docling_core.types.doc.document import (
        ContentLayer,
        DocItem,
        DoclingDocument,
        DocTagsDocument,
    )

    from docling_core_spark.ops.overlay import (
        _px,
        flatten_doc_id,
        gen_layout_doctags,
    )

    s = gen_layout_doctags(did)
    dt = DocTagsDocument.from_multipage_doctags_and_images(s, None)
    doc = DoclingDocument.load_from_doctags(dt, document_name=did)
    rows, rank = [], 0
    layers = {ContentLayer.BODY, ContentLayer.FURNITURE}
    for elem, _ in doc.iterate_items(included_content_layers=layers):
        if not isinstance(elem, DocItem):
            continue
        for prov in elem.prov:
            page = doc.pages[prov.page_no]
            tlo = prov.bbox.to_top_left_origin(
                page_height=page.size.height
            )
            n = tlo.normalized(page.size)
            ys = sorted((_px(n.t), _px(n.b)))
            rows.append({
                "doc_id": did, "page_no": int(prov.page_no),
                "rank": rank, "layer": elem.content_layer.value,
                "label": elem.label.value,
                "x0": _px(n.l), "y0": ys[0],
                "x1": _px(n.r), "y1": ys[1],
            })
            rank += 1
    errs = [] if flatten_doc_id(did) == rows else ["overlay_items"]
    return {"doc_id": did, "rows": rows, "errs": errs}


def table_cells_gold_for_doc(did: str) -> dict:
    """Engine vs reference table-cell flatten for one layout doc (the
    doc_table_cells_overlay gate's golden): the grid SHAPE (iterate
    order, single-prov routing per table_visualizer.py:88-117, table
    bbox, num_rows/num_cols and every cell's offsets/spans in
    table_cells order) comes from each side's OWN OTSL parser; the
    pixel-boundary arithmetic is the shared cell_px_bbox (the
    semsplit/WordPiece injection pattern)."""
    from docling_core.types.doc.document import (
        ContentLayer,
        DoclingDocument,
        DocTagsDocument,
        TableItem,
    )

    from docling_core_spark.ops.overlay import (
        _px,
        cell_px_bbox,
        flatten_table_cells_doc_id,
        gen_layout_doctags,
    )

    s = gen_layout_doctags(did)
    dt = DocTagsDocument.from_multipage_doctags_and_images(s, None)
    doc = DoclingDocument.load_from_doctags(dt, document_name=did)
    rows, t_rank = [], 0
    layers = {ContentLayer.BODY, ContentLayer.FURNITURE}
    for elem, _ in doc.iterate_items(included_content_layers=layers):
        if not isinstance(elem, TableItem):
            continue
        if len(elem.prov) != 1:
            continue
        prov = elem.prov[0]
        page = doc.pages[prov.page_no]
        tlo = prov.bbox.to_top_left_origin(page_height=page.size.height)
        n = tlo.normalized(page.size)
        ys = sorted((_px(n.t), _px(n.b)))
        tb = (_px(n.l), ys[0], _px(n.r), ys[1])
        data = elem.data
        for ci, cell in enumerate(data.table_cells):
            x0, y0, x1, y1 = cell_px_bbox(
                tb, data.num_rows, data.num_cols,
                cell.start_row_offset_idx, cell.end_row_offset_idx,
                cell.start_col_offset_idx, cell.end_col_offset_idx,
            )
            rows.append({
                "doc_id": did, "page_no": int(prov.page_no),
                "t_rank": t_rank, "cell_index": ci,
                "x0": x0, "y0": y0, "x1": x1, "y1": y1,
            })
        t_rank += 1
    errs = ([] if flatten_table_cells_doc_id(did) == rows
            else ["table_cells_overlay"])
    return {"doc_id": did, "rows": rows, "errs": errs}


def _write(outdir: str, name: str, rows: list, int_cols=()):
    df = pd.DataFrame(rows)
    for c in int_cols:
        df[c] = df[c].astype("int64")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(outdir, f"{name}.parquet"),
    )


def generate(sf: str, pool=None) -> dict:
    sf_dir = f"{TESTDATA}/{sf}"
    outdir = os.path.join(_REPO, "goldens", sf)
    os.makedirs(outdir, exist_ok=True)
    ids = corpus_ids(sf_dir)
    t0 = time.time()
    results = (
        pool.map(gold_for_doc, ids, chunksize=8)
        if pool is not None
        else [gold_for_doc(d) for d in ids]
    )
    bad = [(r["doc_id"], r["errs"]) for r in results if r["errs"]]
    if bad:
        for did, errs in bad[:20]:
            print(f"PARITY FAILURE {did}: {errs}", file=sys.stderr)
        raise SystemExit(f"{len(bad)} docs diverge from the reference")

    span_rows, export_rows, chunk_rows, hybrid_rows, rt_rows, jrt_rows = (
        [], [], [], [], [], []
    )
    media_rows = []
    caption_rows = []
    variant_rows = []
    ref_rt_rows = []
    ref_hybrid_rows = []
    ref_hybrid_docs = 0
    m = {
        "n_docs": 0, "total_items": 0, "total_spans": 0,
        "total_anomalies": 0, "invalid_trees": 0,
        **{f"v_{c}": 0 for c in VIOLATION_CATEGORIES},
    }
    json_ref_matches = 0
    for r in results:
        span_rows.extend(r["span_rows"])
        export_rows.append(r["export_row"])
        chunk_rows.extend(_scalarize(r["chunk_rows"]))
        hybrid_rows.extend(_scalarize(r["hybrid_rows"]))
        if r["ref_hybrid_rows"] is not None:
            ref_hybrid_docs += 1
            ref_hybrid_rows.extend(_scalarize(r["ref_hybrid_rows"]))
        media_rows.extend(r["media_rows"])
        caption_rows.extend(r["caption_rows"])
        variant_rows.append(r["variant_row"])
        rt_rows.append(r["rt_row"])
        if r["ref_rt_row"] is not None:
            ref_rt_rows.append(r["ref_rt_row"])
        jrt_rows.append(r["jrt_row"])
        json_ref_matches += bool(r["json_matches_ref"])
        mm = r["metrics"]
        m["n_docs"] += 1
        m["total_items"] += mm["n_items"]
        m["total_spans"] += mm["n_spans_in"]
        m["total_anomalies"] += mm["parse_anomalies"]
        m["invalid_trees"] += 0 if mm["tree_valid"] else 1
        for c in VIOLATION_CATEGORIES:
            m[f"v_{c}"] += mm["violations"].get(c, 0)

    # fixture-derived expectations: the generator only emits well-formed
    # spans except shape:badclose (one unbalanced close), and every doc
    # must validate clean
    assert m["total_anomalies"] == 1, m
    assert m["invalid_trees"] == 0, m
    assert all(m[f"v_{c}"] == 0 for c in VIOLATION_CATEGORIES), m

    _write(outdir, "pipeline_span_seq", span_rows, int_cols=("ord",))
    _write(outdir, "pipeline_exports", export_rows,
           int_cols=("n_items", "n_pages"))
    _write(outdir, "pipeline_metrics", [m])
    _write(outdir, "pipeline_chunks", chunk_rows,
           int_cols=("chunk_idx", "n_tokens", "context_tokens"))
    _write(outdir, "pipeline_chunks_hybrid", hybrid_rows,
           int_cols=("chunk_idx", "n_tokens", "context_tokens"))
    _write(outdir, "pipeline_chunks_hybrid_ref", ref_hybrid_rows,
           int_cols=("chunk_idx", "n_tokens", "context_tokens"))
    _write(outdir, "media_externalize", media_rows, int_cols=("pic_idx",))
    _write(outdir, "media_captions", caption_rows, int_cols=("pic_idx",))
    _write(outdir, "pipeline_export_variants", variant_rows)
    _write(outdir, "pipeline_doctags_roundtrip", rt_rows)
    _write(outdir, "pipeline_doctags_roundtrip_ref", ref_rt_rows)
    _write(outdir, "pipeline_json_roundtrip", jrt_rows,
           int_cols=("json_bytes",))

    # --- doc_render_overlay: reference-derived item-flatten golden ---
    from docling_core_spark.ops.overlay import layout_doc_ids

    lay_ids = layout_doc_ids(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )
    lay_results = (
        pool.map(overlay_gold_for_doc, lay_ids, chunksize=16)
        if pool is not None
        else [overlay_gold_for_doc(d) for d in lay_ids]
    )
    lay_bad = [(r["doc_id"], r["errs"]) for r in lay_results if r["errs"]]
    if lay_bad:
        for did, errs in lay_bad[:20]:
            print(f"PARITY FAILURE {did}: {errs}", file=sys.stderr)
        raise SystemExit(
            f"{len(lay_bad)} layout docs diverge from the reference"
        )
    item_rows = [row for r in lay_results for row in r["rows"]]
    _write(outdir, "doc_items", item_rows,
           int_cols=("page_no", "rank", "x0", "y0", "x1", "y1"))

    cell_results = (
        pool.map(table_cells_gold_for_doc, lay_ids, chunksize=16)
        if pool is not None
        else [table_cells_gold_for_doc(d) for d in lay_ids]
    )
    cell_bad = [(r["doc_id"], r["errs"]) for r in cell_results
                if r["errs"]]
    if cell_bad:
        for did, errs in cell_bad[:20]:
            print(f"PARITY FAILURE {did}: {errs}", file=sys.stderr)
        raise SystemExit(
            f"{len(cell_bad)} table-cell docs diverge from the reference"
        )
    cell_rows = [row for r in cell_results for row in r["rows"]]
    _write(outdir, "doc_table_cells", cell_rows,
           int_cols=("page_no", "t_rank", "cell_index",
                     "x0", "y0", "x1", "y1"))

    stats = {
        "sf": sf,
        "docs": len(ids),
        "span_rows": len(span_rows),
        "chunk_rows": len(chunk_rows),
        "hybrid_rows": len(hybrid_rows),
        "media_rows": len(media_rows),
        "caption_rows": len(caption_rows),
        "doctags_rt_ref_derived": f"{len(ref_rt_rows)}/{len(ids)}",
        # docs whose roundtrip needs >1 reload to reach a fixed point
        # (reference-faithful OTSL xcel behavior, fragment-verified)
        "doctags_rt_unstable": sum(
            1 for r in results if not r["rt_row"]["stable"]
        ),
        "hybrid_ref_derived": f"{ref_hybrid_docs}/{len(ids)}",
        "hybrid_ref_rows": len(ref_hybrid_rows),
        "json_dump_matches_reference": f"{json_ref_matches}/{len(ids)}",
        "overlay_docs": len(lay_ids),
        "overlay_item_rows": len(item_rows),
        "overlay_cell_rows": len(cell_rows),
        "gen_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(outdir, "MANIFEST.json"), "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats))
    return stats


def main(sfs):
    from ref_oracle import install_reference

    install_reference()
    import docling_core.transforms.chunker.hierarchical_chunker  # noqa: F401 warm import pre-fork

    pool = None
    if os.environ.get("GOLDEN_PROCS", "8") != "1":
        import multiprocessing as mp

        pool = mp.get_context("fork").Pool(
            int(os.environ.get("GOLDEN_PROCS", "8"))
        )
    for sf in sfs:
        generate(sf, pool=pool)
    if pool is not None:
        pool.close()


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf0.001", "sf0.01"])
