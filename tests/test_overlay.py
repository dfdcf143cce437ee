"""Item-tree overlay visualizer (ops/overlay.py) — reference parity of
the flatten, dual-dialect SVG equality, and arrow-chain semantics.

Reference surfaces mirrored: transforms/visualizer/layout_visualizer.py
(per-item rect + label tag) and reading_order_visualizer.py (red arrows
between consecutive provenance centers, chain reset on a new page)."""

import duckdb
import pytest

from docling_core_spark.ops.overlay import (
    LABEL_COLORS,
    _px,
    doc_items_df,
    flatten_doc_id,
    gen_layout_doctags,
    overlay_svg_sql,
)
from ref_oracle import install_reference

install_reference()


def _ref_flatten(did: str):
    from docling_core.types.doc.document import (
        ContentLayer,
        DocItem,
        DoclingDocument,
        DocTagsDocument,
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
    return rows


@pytest.mark.parametrize("i", [0, 1, 7, 23, 99])
def test_flatten_matches_reference(i):
    did = f"lay-{i:08d}"
    assert flatten_doc_id(did) == _ref_flatten(did)


def test_label_colors_match_reference():
    """LABEL_COLORS must be the reference color map (labels.py:45-69)
    for every label the corpus generator can emit."""
    from docling_core.types.doc import DocItemLabel

    for lbl, rgb in LABEL_COLORS.items():
        assert DocItemLabel.get_color(DocItemLabel(lbl)) == rgb, lbl


def test_dual_dialect_svg_identical(spark):
    items = doc_items_df(spark, 30, partitions=4)
    pdf = items.toPandas()
    items.createOrReplaceTempView("t_overlay_items")
    sp = (
        spark.sql(overlay_svg_sql("t_overlay_items", "spark"))
        .toPandas()
        .sort_values(["doc_id", "page_no"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("g_items", pdf)
    du = (
        con.execute(overlay_svg_sql("g_items", "duck"))
        .df()
        .sort_values(["doc_id", "page_no"])
        .reset_index(drop=True)
    )
    du.columns = sp.columns
    assert len(sp) > 0
    assert (sp == du).all().all()


def test_arrow_chain_resets_per_page(spark):
    """n_arrows per page = items-on-page - 1 (the chain resets on a new
    page, reading_order_visualizer.py:96-99, and every corpus item has
    exactly one provenance)."""
    items = doc_items_df(spark, 12, partitions=2)
    items.createOrReplaceTempView("t_overlay_items2")
    out = spark.sql(
        overlay_svg_sql("t_overlay_items2", "spark")
    ).collect()
    assert out
    for r in out:
        assert r["n_arrows"] == r["n_items"] - 1


def test_svg_shape(spark):
    """The SVG body contains one rect+text per item and one line+polygon
    per arrow, nothing else (deterministic construction)."""
    items = doc_items_df(spark, 3, partitions=1)
    pdf = items.toPandas()
    con = duckdb.connect()
    con.register("g_items3", pdf)
    sql = overlay_svg_sql("g_items3", "duck").replace(
        "md5(svg) AS svg_md5", "svg AS svg_md5"
    )
    for r in con.execute(sql).fetchall():
        doc_id, page_no, n_items, n_arrows, _len, svg = r
        assert svg.count("<rect ") == n_items
        assert svg.count("<text ") == n_items
        assert svg.count("<line ") == n_arrows
        assert svg.count("<polygon ") == n_arrows
        assert svg.startswith("<svg ") and svg.endswith("</svg>")
