"""Page-cell layer parity: our relational ops vs the reference's
SegmentedPdfPage object methods on identical synthetic cells."""

import duckdb
import pytest

import docling_core_spark.pages as P

from ref_oracle import install_reference

SF_DIR = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW pages_cells AS {P.cells_synth_sql('duck')}"
    )
    return con


def _ref_page(cells):
    """Build a reference SegmentedPdfPage from cell rows."""
    install_reference()
    from docling_core.types.doc.page import (
        BoundingRectangle,
        PdfPageBoundaryType,
        PdfPageGeometry,
        SegmentedPdfPage,
        TextCell,
    )
    from docling_core.types.doc.base import BoundingBox, CoordOrigin

    def rect(r):
        return BoundingRectangle(
            r_x0=r["r_x0"], r_y0=r["r_y0"], r_x1=r["r_x1"], r_y1=r["r_y1"],
            r_x2=r["r_x2"], r_y2=r["r_y2"], r_x3=r["r_x3"], r_y3=r["r_y3"],
            coord_origin=CoordOrigin.BOTTOMLEFT,
        )

    bbox = BoundingBox(
        l=0, b=0, r=612, t=792, coord_origin=CoordOrigin.BOTTOMLEFT
    )
    geom = PdfPageGeometry(
        angle=0.0,
        rect=BoundingRectangle.from_bounding_box(bbox),
        boundary_type=PdfPageBoundaryType.CROP_BOX,
        art_bbox=bbox, bleed_bbox=bbox, crop_bbox=bbox,
        media_bbox=bbox, trim_bbox=bbox,
    )
    return SegmentedPdfPage(
        dimension=geom,
        textline_cells=[
            TextCell(
                index=r["cell_index"], rect=rect(r), text=r["text"],
                orig=r["orig"], from_ocr=bool(r["from_ocr"]),
                confidence=r["confidence"],
            )
            for r in cells
        ],
        char_cells=[],
        word_cells=[],
    )


@pytest.fixture(scope="module")
def pages():
    """First few synthetic pages as (page_id -> cell rows)."""
    con = _duck()
    rows = con.execute(
        "SELECT * FROM pages_cells WHERE page_id < 5 ORDER BY page_id,"
        " cell_index"
    ).fetchall()
    cols = [d[0] for d in con.execute(
        "SELECT * FROM pages_cells LIMIT 0"
    ).description]
    by_page = {}
    for r in rows:
        d = dict(zip(cols, r))
        by_page.setdefault(d["page_id"], []).append(d)
    return by_page


def test_cells_in_bbox_matches_reference(pages):
    install_reference()
    from docling_core.types.doc.base import BoundingBox, CoordOrigin
    from docling_core.types.doc.page import TextCellUnit

    con = _duck()
    box = dict(l=0, t=792, r=300, b=650)
    got = con.execute(P.sql_page_cells_in_bbox()).fetchall()
    got_by_page = {}
    cols = [d[0] for d in con.description]
    for r in got:
        d = dict(zip(cols, r))
        got_by_page.setdefault(d["page_id"], set()).add(d["cell_index"])

    for page_id, cells in pages.items():
        ref = _ref_page(cells)
        want = {
            c.index
            for c in ref.get_cells_in_bbox(
                TextCellUnit.LINE,
                BoundingBox(coord_origin=CoordOrigin.BOTTOMLEFT, **box),
                ios=0.8,
            )
        }
        assert got_by_page.get(page_id, set()) == want, page_id


def test_crop_text_matches_reference(pages):
    install_reference()
    from docling_core.types.doc.base import BoundingBox, CoordOrigin
    from docling_core.types.doc.page import TextCellUnit

    con = _duck()
    got = dict(con.execute(P.sql_page_crop_text()).fetchall())
    box = BoundingBox(
        l=0, t=713, r=500, b=600, coord_origin=CoordOrigin.BOTTOMLEFT
    )
    for page_id, cells in pages.items():
        ref = _ref_page(cells)
        want = ref.crop_text(TextCellUnit.LINE, box)
        assert got.get(page_id, "") == want, page_id


def test_textlines_match_reference(pages):
    install_reference()
    from docling_core.types.doc.page import TextCellUnit

    con = _duck()
    rows = con.execute(
        P.sql_page_textlines() + " ORDER BY page_id, cell_index"
    ).fetchall()
    got_by_page = {}
    for page_id, _idx, line in rows:
        got_by_page.setdefault(page_id, []).append(line)
    for page_id, cells in pages.items():
        ref = _ref_page(cells)
        want = ref.export_to_textlines(
            TextCellUnit.LINE, add_location=True, add_fontname=False
        )
        assert got_by_page[page_id] == want, page_id


def test_spark_matches_duck(spark):
    """Spark-side views produce the same row multiset as the oracle
    (already covered by the driver gate; quick guard here)."""
    df = P.q_page_crop_text(spark, SF_DIR)
    got = {r["page_id"]: r["cropped_text"] for r in df.collect()}
    con = _duck()
    want = dict(con.execute(P.sql_page_crop_text()).fetchall())
    assert got == want
