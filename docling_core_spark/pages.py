"""Page-parse layer (SURVEY.md §1.6): the reference's SegmentedPdfPage /
TextCell surface re-expressed over a CELLS TABLE.

Reference shape: per-page Pydantic objects with `char/word/textline`
cell lists and per-page methods (`iterate_cells`, `get_cells_in_bbox`,
`crop_text`, `export_to_textlines`; page.py:263-294, 464-683). Spark
shape: one DataFrame of cells —

    (page_id, unit, cell_index, r_x0..r_y3, coord_origin, text, orig,
     from_ocr, confidence, page_w, page_h)

— so every op is a relational transform over 10^12 cells instead of a
per-page Python loop:

  - `iterate_cells(unit)`        -> filter on `unit`
  - `get_cells_in_bbox(ios=0.8)` -> filter on intersection-over-self
  - `crop_text`                  -> containment filter + lag() window
    for the adjacency rule + ordered string aggregation per page
  - `export_to_textlines`        -> printf-style projection

All expressions exist in both Spark SQL and DuckDB; parity against the
reference object methods is tested cell-for-cell in tests/test_pages.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

UNIT_CHAR = "char"
UNIT_WORD = "word"
UNIT_LINE = "line"

# --- rect -> bbox (BOTTOMLEFT normal form; page.py:146-169) --------------
_RB_L = "least(r_x0, r_x1, r_x2, r_x3)"
_RB_R = "greatest(r_x0, r_x1, r_x2, r_x3)"
_RB_T_BL = "greatest(r_y0, r_y1, r_y2, r_y3)"
_RB_B_BL = "least(r_y0, r_y1, r_y2, r_y3)"

# TOPLEFT-origin quads get flipped with the page height first
# (page.py:204-220): y -> page_h - y preserves min/max symmetry.
_Y = "(CASE WHEN coord_origin = 'TOPLEFT' THEN page_h - {y} ELSE {y} END)"


def _bl_quad_select() -> str:
    ys = ", ".join(_Y.format(y=f"r_y{i}") + f" AS r_y{i}" for i in range(4))
    return (
        "SELECT page_id, unit, cell_index, text, orig, from_ocr,"
        f" confidence, page_w, page_h, r_x0, r_x1, r_x2, r_x3, {ys}"
    )


_CELL_BBOX = (
    f"SELECT *, {_RB_L} AS c_l, {_RB_B_BL} AS c_b, {_RB_R} AS c_r,"
    f" {_RB_T_BL} AS c_t"
)


def _ios_expr(l, t, r, b) -> str:
    """Cell-bbox intersection-over-self vs a BOTTOMLEFT query box
    [l,r] x [b,t] (base.py:140-189)."""
    iw = f"(least(c_r, {r}) - greatest(c_l, {l}))"
    ih = f"(least(c_t, {t}) - greatest(c_b, {b}))"
    inter = (
        f"(CASE WHEN {iw} <= 0 OR {ih} <= 0 THEN 0.0 ELSE {iw} * {ih} END)"
    )
    area = "(abs(c_r - c_l) * abs(c_t - c_b))"
    return f"(CASE WHEN {area} > 0 THEN {inter} / {area} ELSE 0.0 END)"


def cells_in_bbox_sql(src, unit, l, t, r, b, ios=0.8,
                      extra_cte="") -> str:
    """get_cells_in_bbox (page.py:523-549)."""
    return f"""
        WITH {extra_cte}bl AS ({_bl_quad_select()} FROM {src} WHERE unit = '{unit}'),
        cb AS ({_CELL_BBOX} FROM bl)
        SELECT page_id, cell_index, text, orig, from_ocr, confidence,
               round(c_l, 6) AS c_l, round(c_b, 6) AS c_b,
               round(c_r, 6) AS c_r, round(c_t, 6) AS c_t,
               round({_ios_expr(l, t, r, b)}, 6) AS ios
        FROM cb WHERE {_ios_expr(l, t, r, b)} > {ios}
    """


def crop_text_sql(src, unit, l, t, r, b, eps=1.0, dialect="spark",
                  extra_cte="") -> str:
    """crop_text (page.py:601-645): fully-contained cells in index
    order; corner-adjacent neighbors (within eps) join without a
    space."""
    piece = (
        f"CASE WHEN prev_x1 IS NULL THEN text"
        f" WHEN abs(r_x0 - prev_x1) < {eps} AND abs(r_y0 - prev_y1) < {eps}"
        f" THEN text ELSE ' ' || text END"
    )
    if dialect == "spark":
        # array_join over a transform is a single linear pass; a
        # string-append fold re-copies the accumulator per cell
        # (O(chars^2) on text-dense pages)
        agg = (
            "array_join(transform("
            " array_sort(collect_list(struct(cell_index, piece))),"
            " x -> x.piece), '')"
        )
    else:
        agg = "string_agg(piece, '' ORDER BY cell_index)"
    return f"""
        WITH {extra_cte}bl AS ({_bl_quad_select()} FROM {src} WHERE unit = '{unit}'),
        cb AS ({_CELL_BBOX} FROM bl),
        contained AS (
            SELECT * FROM cb
            WHERE {l} <= c_l AND c_r <= {r} AND {b} <= c_b AND c_t <= {t}
        ),
        seq AS (
            SELECT page_id, cell_index, text, r_x0, r_y0,
                   lag(r_x1) OVER (PARTITION BY page_id ORDER BY cell_index)
                       AS prev_x1,
                   lag(r_y1) OVER (PARTITION BY page_id ORDER BY cell_index)
                       AS prev_y1
            FROM contained
        ),
        pieces AS (SELECT page_id, cell_index, {piece} AS piece FROM seq)
        SELECT page_id, {agg} AS cropped_text
        FROM pieces GROUP BY page_id
    """


# Coordinate formatting discipline: every 2-decimal coordinate string is
# produced by quantizing the double to centi-units as a BIGINT with an
# EXPLICIT ties-up rule — floor(x*100 + 0.5) — then rendering the
# integer.  Decimal printf is NOT cross-engine safe: Spark's printf
# rounds ties HALF_UP on the double's shortest decimal repr while
# DuckDB's printf and Python's %.2f round the binary value half-even
# (printf('%.2f', 0.125) is '0.13' on Spark, '0.12' elsewhere), so a
# tie coordinate would fail the md5 gate as a false divergence.  The
# quantization below is pure IEEE double arithmetic — bit-identical in
# Spark, DuckDB and Python.  Caveat vs the reference's f-strings: on an
# exact binary tie (x*100 landing on .5 exactly, e.g. 18.125) this rule
# gives .13 where Python gives .12; absent from real page coordinates
# and from the fixtures (integer-valued coords).


def _q2_sql(expr: str) -> str:
    """Centi-unit quantization of a double SQL expression (ties up)."""
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


def _fmt2_sql(expr: str, dialect: str, pad: int = 0) -> str:
    """SQL text rendering `expr` (double) with exactly 2 decimals, via
    integer quantization; identical output in both dialects.  `pad`
    zero-pads to a minimum total width (the reference's %06.2f) without
    lpad's silent truncation of wider values."""
    q = _q2_sql(expr)
    div = "div" if dialect == "spark" else "//"
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    s = (
        f"concat(CASE WHEN {q} < 0 THEN '-' ELSE '' END,"
        f" CAST(abs({q}) {div} 100 AS {cast}), '.',"
        f" lpad(CAST(abs({q}) % 100 AS {cast}), 2, '0'))"
    )
    if pad:
        s = f"concat(repeat('0', greatest(0, {pad} - length({s}))), {s})"
    return s


def fmt2(x: float) -> str:
    """Python mirror of _fmt2_sql (no pad)."""
    q = math.floor(x * 100 + 0.5)
    sign = "-" if q < 0 else ""
    a = abs(q)
    return f"{sign}{a // 100}.{a % 100:02d}"


def textlines_sql(src, unit, add_location=True, dialect="spark") -> str:
    """export_to_textlines (page.py:646-683): '(x0, y0) ... (x3, y3)
    text' with %06.2f-shaped coords (quantized; see note above)."""
    if add_location:
        groups = ", ".join(
            "'(', " + _fmt2_sql(f"r_x{i}", dialect, pad=6) + ", ', ', "
            + _fmt2_sql(f"r_y{i}", dialect, pad=6) + ", ') '"
            for i in range(4)
        )
        fmt = f"concat({groups}, text)"
    else:
        fmt = "text"
    return (
        f"SELECT page_id, cell_index, {fmt} AS line"
        f" FROM {src} WHERE unit = '{unit}'"
    )


# ---------------------------------------------------------------------------
# deterministic synthetic cells table from the driver's documents table
# ---------------------------------------------------------------------------
# one 'line' cell per whitespace token, laid out on an 8-column grid of a
# 612x792 page, axis-aligned BOTTOMLEFT quads.

_CELLS_BODY = """
    SELECT {page_id} AS page_id, 'line' AS unit,
           CAST({i0} AS INT) AS cell_index,
           {tok} AS text, {tok} AS orig,
           ({page_id} % 5 = 0) AS from_ocr,
           CAST(1.0 AS DOUBLE) AS confidence,
           CAST(612 AS DOUBLE) AS page_w, CAST(792 AS DOUBLE) AS page_h,
           CAST(30 + ({i0}) % 8 * 70 AS DOUBLE) AS r_x0,
           CAST(30 + ({i0}) % 8 * 70 + 60 AS DOUBLE) AS r_x1,
           CAST(30 + ({i0}) % 8 * 70 + 60 AS DOUBLE) AS r_x2,
           CAST(30 + ({i0}) % 8 * 70 AS DOUBLE) AS r_x3,
           CAST(700 - {fdiv8} * 20 AS DOUBLE) AS r_y0,
           CAST(700 - {fdiv8} * 20 AS DOUBLE) AS r_y1,
           CAST(700 - {fdiv8} * 20 + 12 AS DOUBLE) AS r_y2,
           CAST(700 - {fdiv8} * 20 + 12 AS DOUBLE) AS r_y3,
           'BOTTOMLEFT' AS coord_origin
    FROM {from_clause}
"""


def cells_synth_sql(dialect: str) -> str:
    if dialect == "spark":
        return _CELLS_BODY.format(
            page_id="doc_id",
            i0="w.pos",
            tok="w.tok",
            fdiv8="CAST(floor(w.pos / 8) AS INT)",
            from_clause=(
                "pages_src_docs"
                " LATERAL VIEW posexplode(split(text, ' ')) w AS pos, tok"
            ),
        )
    return _CELLS_BODY.format(
        page_id="doc_id",
        i0="w.i",
        tok="w.tok",
        fdiv8="(w.i // 8)",
        from_clause=(
            "documents, LATERAL (SELECT"
            " unnest(range(len(string_split(text, ' ')))) AS i,"
            " unnest(string_split(text, ' ')) AS tok) w"
        ),
    )


def register_cells_view(spark: SparkSession, sf_dir: str) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("pages_src_docs")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW pages_cells AS "
        + cells_synth_sql("spark")
    )


def q_page_crop_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(
        crop_text_sql("pages_cells", UNIT_LINE, l=0, t=713, r=500, b=600,
                      dialect="spark")
    )


def sql_page_crop_text() -> str:
    return crop_text_sql(
        "pages_cells", UNIT_LINE, l=0, t=713, r=500, b=600,
        dialect="duck",
        extra_cte=f"pages_cells AS ({cells_synth_sql('duck')}), ",
    )


def q_page_cells_in_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(
        cells_in_bbox_sql("pages_cells", UNIT_LINE, l=0, t=792, r=300,
                          b=650)
    )


def sql_page_cells_in_bbox() -> str:
    return cells_in_bbox_sql(
        "pages_cells", UNIT_LINE, l=0, t=792, r=300, b=650,
        extra_cte=f"pages_cells AS ({cells_synth_sql('duck')}), ",
    )


def q_page_textlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(textlines_sql("pages_cells", UNIT_LINE, dialect="spark"))


def sql_page_textlines() -> str:
    return (
        f"WITH pages_cells AS ({cells_synth_sql('duck')}) "
        + textlines_sql("pages_cells", UNIT_LINE, dialect="duck")
    )


# ---------------------------------------------------------------------------
# page visualization: render_as_image re-expressed as deterministic SVG
# ---------------------------------------------------------------------------
# The reference's rendering helpers (page.py:684-1139) rasterize a page
# with PIL: white RGBA canvas sized (round(page_w), round(page_h)), then
# per layer — bitmap resources, cell rectangles (`_render_cells_bbox`,
# page.py:895: polygon of the rect's 4 points in TOP-LEFT origin, fill
# cyan, outline black), bottom-left dots (`_draw_cells_bl`, page.py:1019:
# radius-3 ellipse at polygon point 0, red), top-right dots
# (`_draw_cells_tr`, page.py:1062: ALSO anchored at polygon point 0 —
# the reference reuses poly[0] for the "top-right" marker; mirrored
# deliberately so a pixel-diff against the reference would agree), then
# lines. PIL is absent in this environment (for the reference too), so
# the engine renders the same geometry as SVG text: one <polygon> per
# cell and one <circle> per marker, in the reference's layer order and
# within each layer in cell_index order. SVG is deterministic text, so
# the render is oracle-checkable — both dialects build the identical
# string and the gate compares md5s per page.
#
# 100 TB story: one groupBy(page_id) over the cells scan (uniform key —
# a page has bounded cells); the per-cell geometry + printf is narrow
# whole-stage-codegen work, and only (page_id, n_cells, svg_len,
# svg_md5) leave the aggregation. Rendering 10^12 pages is exactly as
# parallel as the cells table is partitioned.

_SVG_POLY = (
    '<polygon points="{},{} {},{} {},{} {},{}"'
    ' fill="#00FFFF" stroke="#000000"/>'
)
_SVG_BL = '<circle cx="{}" cy="{}" r="3.00" fill="#FF0000" stroke="#FF0000"/>'
_SVG_TR = '<circle cx="{}" cy="{}" r="3.00" fill="#008000" stroke="#008000"/>'
_SVG_HDR = '<svg xmlns="http://www.w3.org/2000/svg" width="%d" height="%d">'
_SVG_BG = '<rect width="%d" height="%d" fill="#FFFFFF"/>'


def _svg_tpl_sql(tpl: str, coords: list, dialect: str) -> str:
    """Render a {}-placeholder SVG template as a SQL concat() whose
    coordinate slots go through the quantized 2-decimal formatter
    (cross-engine byte-identical; see the note above textlines_sql)."""
    parts = tpl.split("{}")
    assert len(parts) == len(coords) + 1, tpl
    pieces = []
    for lit, c in zip(parts, coords):
        if lit:
            pieces.append("'" + lit + "'")
        pieces.append(_fmt2_sql(c, dialect))
    if parts[-1]:
        pieces.append("'" + parts[-1] + "'")
    return "concat(" + ", ".join(pieces) + ")"


def _svg_cell_cte(src: str, unit: str) -> str:
    """Per-cell top-left-origin coords + the three SVG fragments.
    Identical text in both dialects (printf/CASE exist in both)."""
    ty = ("CASE WHEN coord_origin = 'BOTTOMLEFT'"
          " THEN page_h - r_y{i} ELSE r_y{i} END")
    tys = ", ".join(ty.format(i=i) + f" AS ty{i}" for i in range(4))
    return (
        f"SELECT page_id, cell_index, page_w, page_h, {tys},"
        f" r_x0, r_x1, r_x2, r_x3"
        f" FROM {src} WHERE unit = '{unit}'"
    )


def _svg_piece_select(dialect: str) -> str:
    poly = _svg_tpl_sql(
        _SVG_POLY,
        ["r_x0", "ty0", "r_x1", "ty1", "r_x2", "ty2", "r_x3", "ty3"],
        dialect,
    )
    bl = _svg_tpl_sql(_SVG_BL, ["r_x0", "ty0"], dialect)
    tr = _svg_tpl_sql(_SVG_TR, ["r_x0", "ty0"], dialect)
    return (
        "SELECT page_id, cell_index, page_w, page_h,"
        f" {poly} AS poly, {bl} AS bl, {tr} AS tr"
        " FROM svg_cells"
    )


def render_svg_sql(src: str, unit: str, dialect: str = "spark",
                   extra_cte: str = "", keep_svg: bool = False) -> str:
    """Per-page SVG render (reference render_as_image, page.py:684-842,
    with draw_cells_bbox + bl/tr markers) -> (page_id, n_cells, svg_len,
    svg_md5[, svg when keep_svg — test/inspection use only; the gate
    row ships digests so 10^12 SVG bodies never leave the agg])."""
    if dialect == "spark":
        agg = (
            "array_join(transform(array_sort(collect_list("
            "struct(cell_index, {col}))), x -> x.{col}), '')"
        )
    else:
        agg = "string_agg({col}, '' ORDER BY cell_index)"
    polys = agg.format(col="poly")
    bls = agg.format(col="bl")
    trs = agg.format(col="tr")
    cnt = "CAST(count(*) AS BIGINT)" if dialect == "spark" else "COUNT(*)::BIGINT"
    slen = ("CAST(length(svg) AS BIGINT)" if dialect == "spark"
            else "length(svg)::BIGINT")
    # floor(+0.5), not round(): SQL round() is HALF_UP on Spark but
    # Python's round() is half-even — same tie class as the coords.
    w = "CAST(floor(max(page_w) + 0.5) AS BIGINT)"
    h = "CAST(floor(max(page_h) + 0.5) AS BIGINT)"
    return f"""
        WITH {extra_cte}svg_cells AS ({_svg_cell_cte(src, unit)}),
        svg_pieces AS ({_svg_piece_select(dialect)}),
        svg_pages AS (
            SELECT page_id,
                   concat(
                       printf('{_SVG_HDR}', {w}, {h}),
                       printf('{_SVG_BG}', {w}, {h}),
                       {polys}, {bls}, {trs},
                       '</svg>') AS svg,
                   {cnt} AS n_cells
            FROM svg_pieces GROUP BY page_id
        )
        SELECT page_id, n_cells, {slen} AS svg_len, md5(svg) AS svg_md5
               {", svg" if keep_svg else ""}
        FROM svg_pages
    """


def render_page_svg(cells: list) -> str:
    """Pure-Python mirror of render_svg_sql for one page: the test
    oracle that pins the SQL construction to the reference's layer
    order + geometry (page.py:684-1139). `cells` = dicts with the
    cells-table fields of ONE page."""
    cs = sorted(cells, key=lambda c: c["cell_index"])

    def tl(c):
        flip = c["coord_origin"] == "BOTTOMLEFT"
        ys = [c["page_h"] - c[f"r_y{i}"] if flip else c[f"r_y{i}"]
              for i in range(4)]
        xs = [c[f"r_x{i}"] for i in range(4)]
        return xs, ys

    w = int(math.floor(cs[0]["page_w"] + 0.5))
    h = int(math.floor(cs[0]["page_h"] + 0.5))
    parts = [_SVG_HDR % (w, h), _SVG_BG % (w, h)]
    for c in cs:
        xs, ys = tl(c)
        parts.append(_SVG_POLY.format(
            fmt2(xs[0]), fmt2(ys[0]), fmt2(xs[1]), fmt2(ys[1]),
            fmt2(xs[2]), fmt2(ys[2]), fmt2(xs[3]), fmt2(ys[3])))
    for c in cs:
        xs, ys = tl(c)
        parts.append(_SVG_BL.format(fmt2(xs[0]), fmt2(ys[0])))
    for c in cs:
        xs, ys = tl(c)
        parts.append(_SVG_TR.format(fmt2(xs[0]), fmt2(ys[0])))
    parts.append("</svg>")
    return "".join(parts)


def q_page_render_svg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(render_svg_sql("pages_cells", UNIT_LINE, "spark"))


def sql_page_render_svg() -> str:
    return render_svg_sql(
        "pages_cells", UNIT_LINE, "duck",
        extra_cte=f"pages_cells AS ({cells_synth_sql('duck')}), ",
    )


# ---------------------------------------------------------------------------
# layout reading order: single-level XY-cut column detection
# ---------------------------------------------------------------------------
# The classic recursive X-Y cut (Nagy & Seth 1984) recovers reading
# order from cell geometry by splitting a page at its widest projection
# gap. One level of the X-cut — find the widest interior horizontal
# whitespace gap no cell crosses, split into columns, read each column
# top-to-bottom — captures the dominant two-column case; the recursion
# story at depth d is d repetitions of the same per-page window shapes.
# The reference keeps cells in reading order already (page.py TextCell
# lists are ordered); this operator is the step that CREATES that order
# from raw layout, exercised on a deterministic two-column synthesis
# where a naive y-sort provably interleaves the columns.
#
# 100 TB story: every window partitions by page_id — a uniform key with
# bounded (~10^3) cells per page — so the work is embarrassingly
# page-parallel; the gap scan is one running-max window, not a
# per-page collect. Output is one row per page.

# minimum whitespace width (pt) accepted as a column gutter
READING_MIN_GUTTER = 30.0

# two-column deterministic synthesis: token i of a doc becomes a line
# cell; the FIRST ceil(n/2) tokens fill the left column top-to-bottom,
# the rest the right column — so ascending cell_index IS the true
# reading order, and sorting by y alone interleaves the columns.
_CELLS2_BODY = """
    SELECT {page_id} AS page_id,
           CAST({i0} AS INT) AS cell_index,
           {tok} AS text,
           CAST(40 + (CASE WHEN {i0} >= {half} THEN 300 ELSE 0 END)
                AS DOUBLE) AS c_l,
           CAST(280 + (CASE WHEN {i0} >= {half} THEN 300 ELSE 0 END)
                AS DOUBLE) AS c_r,
           CAST(700 - 20 * (CASE WHEN {i0} >= {half}
                            THEN {i0} - {half} ELSE {i0} END)
                AS DOUBLE) AS c_b,
           CAST(712 - 20 * (CASE WHEN {i0} >= {half}
                            THEN {i0} - {half} ELSE {i0} END)
                AS DOUBLE) AS c_t
    FROM {from_clause}
"""


def _tok_lateral(dialect: str):
    """(from_clause, i0, tok) for the one-cell-per-token LATERAL
    tokenization — single definition shared by every synthesis builder
    so split semantics cannot diverge between page operators."""
    if dialect == "spark":
        return (
            "pages_src_docs"
            " LATERAL VIEW posexplode(split(text, ' ')) w AS pos, tok",
            "w.pos", "w.tok",
        )
    return (
        "documents, LATERAL (SELECT"
        " unnest(range(len(string_split(text, ' ')))) AS i,"
        " unnest(string_split(text, ' ')) AS tok) w",
        "w.i", "w.tok",
    )


def cells2_synth_sql(dialect: str) -> str:
    from_clause, i0, tok = _tok_lateral(dialect)
    half = (
        "CAST(ceil(size(split(text, ' ')) / 2.0) AS INT)"
        if dialect == "spark"
        else "CAST(ceil(len(string_split(text, ' ')) / 2.0) AS INT)"
    )
    return _CELLS2_BODY.format(
        page_id="doc_id", i0=i0, tok=tok, half=half,
        from_clause=from_clause,
    )


def reading_order_sql(dialect: str) -> str:
    """Per page: column count found by the X-cut, the gutter midpoint,
    and whether the recovered order reproduces the true reading order
    (rank - 1 == cell_index for every cell). The window/aggregate SQL
    is dialect-identical except the midpoint division: a double->BIGINT
    CAST truncates on Spark but rounds on DuckDB, so the midpoint is
    integerised with floor() first and halved with the dialect's
    integer-division operator."""
    div = "div" if dialect == "spark" else "//"
    return f"""
        WITH cells2 AS ({cells2_synth_sql(dialect)}),
        runr AS (
            SELECT page_id, cell_index, c_l, c_r, c_t,
                   max(c_r) OVER (
                       PARTITION BY page_id ORDER BY c_l, cell_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS run_r
            FROM cells2
        ),
        gaps AS (
            SELECT page_id, c_l AS gap_l, run_r AS gap_r
            FROM runr
            WHERE run_r IS NOT NULL
              AND c_l - run_r >= {READING_MIN_GUTTER}
        ),
        best AS (
            SELECT page_id, gap_l, gap_r,
                   row_number() OVER (
                       PARTITION BY page_id
                       ORDER BY gap_l - gap_r DESC, gap_l
                   ) AS g_rnk
            FROM gaps
        ),
        split AS (SELECT page_id, gap_l, gap_r FROM best WHERE g_rnk = 1),
        cols AS (
            SELECT r.page_id, r.cell_index, r.c_l, r.c_t,
                   CASE WHEN s.gap_l IS NOT NULL AND r.c_l >= s.gap_l
                        THEN 1 ELSE 0 END AS col,
                   s.gap_l, s.gap_r
            FROM runr r LEFT JOIN split s ON r.page_id = s.page_id
        ),
        ranked AS (
            SELECT page_id, cell_index, col, gap_l, gap_r,
                   row_number() OVER (
                       PARTITION BY page_id
                       ORDER BY col, c_t DESC, c_l, cell_index
                   ) AS rk,
                   row_number() OVER (
                       PARTITION BY page_id
                       ORDER BY c_t DESC, c_l, cell_index
                   ) AS naive_rk
            FROM cols
        )
        SELECT page_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(max(col) + 1 AS INT) AS n_cols,
               CAST(floor(max(gap_l) + max(gap_r)) AS BIGINT) {div} 2
                   AS gutter_mid,
               bool_and(rk - 1 = cell_index) AS order_ok,
               bool_and(naive_rk - 1 = cell_index) AS naive_ok
        FROM ranked
        GROUP BY page_id
    """


def q_page_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(reading_order_sql("spark"))


def sql_page_reading_order() -> str:
    return reading_order_sql("duck")


# ---------------------------------------------------------------------------
# depth-2 XY-cut: multi-gap columns, then row-blocks within each column
# ---------------------------------------------------------------------------
# The recursive step the single-cut operator's docstring promises,
# delivered: columns come from CUMULATIVE gap counting over the x-order
# (any number of columns, not one best cut), then each column is Y-cut
# the same way into row blocks (title band / footnote band / figure
# gap). Reading order = (col, block, y desc, x). Exercised on a
# 2x2-quadrant synthesis (reading order TL -> BL -> TR -> BR) where the
# naive y-sort interleaves all four blocks. Window inventory: every
# window partitions by page_id or (page_id, col) — uniform bounded
# keys; depth d costs d repetitions of the same running-extreme +
# cumulative-flag shapes, no recursion in the plan.
# Layout fits docs up to ~140 tokens (corpus max is 100): 8 pt row
# pitch, 6 pt cells, quadrant bands anchored at y=712 / y=420.

XYCUT_MIN_VGAP = 30.0

_CELLS4_BODY = """
    SELECT {page_id} AS page_id,
           CAST({i0} AS INT) AS cell_index,
           {tok} AS text,
           CAST(40 + 300 * (({q}) {div} 2) AS DOUBLE) AS c_l,
           CAST(280 + 300 * (({q}) {div} 2) AS DOUBLE) AS c_r,
           CAST((CASE WHEN ({q}) % 2 = 0 THEN 712 ELSE 420 END)
                - 8 * ({r}) - 6 AS DOUBLE) AS c_b,
           CAST((CASE WHEN ({q}) % 2 = 0 THEN 712 ELSE 420 END)
                - 8 * ({r}) AS DOUBLE) AS c_t
    FROM {from_clause}
"""


def cells4_synth_sql(dialect: str) -> str:
    from_clause, i0, tok = _tok_lateral(dialect)
    div = "div" if dialect == "spark" else "//"
    qs = (
        "CAST(ceil(size(split(text, ' ')) / 4.0) AS INT)"
        if dialect == "spark"
        else "CAST(ceil(len(string_split(text, ' ')) / 4.0) AS INT)"
    )
    q = f"{i0} {div} {qs}"
    return _CELLS4_BODY.format(
        page_id="doc_id", i0=i0, tok=tok, div=div,
        q=q, r=f"{i0} - ({q}) * {qs}",
        from_clause=from_clause,
    )


def xycut_blocks_sql(dialect: str) -> str:
    """Per page: column count, total block count, and order_ok /
    naive_ok as in reading_order_sql — but via the multi-gap cumulative
    column/block assignment (depth-2 recursion)."""
    return f"""
        WITH cells4 AS ({cells4_synth_sql(dialect)}),
        xr AS (
            SELECT page_id, cell_index, c_l, c_r, c_b, c_t,
                   max(c_r) OVER (
                       PARTITION BY page_id ORDER BY c_l, cell_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS run_r
            FROM cells4
        ),
        cols AS (
            SELECT page_id, cell_index, c_l, c_b, c_t,
                   sum(CASE WHEN run_r IS NOT NULL
                            AND c_l - run_r >= {READING_MIN_GUTTER}
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY page_id ORDER BY c_l, cell_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS col
            FROM xr
        ),
        yr AS (
            SELECT *,
                   min(c_b) OVER (
                       PARTITION BY page_id, col
                       ORDER BY c_t DESC, cell_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS run_b
            FROM cols
        ),
        blks AS (
            SELECT page_id, cell_index, c_l, c_t, col,
                   sum(CASE WHEN run_b IS NOT NULL
                            AND run_b - c_t >= {XYCUT_MIN_VGAP}
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY page_id, col
                       ORDER BY c_t DESC, cell_index
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS blk
            FROM yr
        ),
        ranked AS (
            SELECT page_id, cell_index, col, blk,
                   row_number() OVER (
                       PARTITION BY page_id
                       ORDER BY col, blk, c_t DESC, c_l, cell_index
                   ) AS rk,
                   row_number() OVER (
                       PARTITION BY page_id
                       ORDER BY c_t DESC, c_l, cell_index
                   ) AS naive_rk
            FROM blks
        )
        SELECT page_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(max(col) + 1 AS INT) AS n_cols,
               CAST(count(DISTINCT col * 100 + blk) AS BIGINT)
                   AS n_blocks,
               bool_and(rk - 1 = cell_index) AS order_ok,
               bool_and(naive_rk - 1 = cell_index) AS naive_ok
        FROM ranked
        GROUP BY page_id
    """


def q_page_xycut_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(xycut_blocks_sql("spark"))


def sql_page_xycut_blocks() -> str:
    return xycut_blocks_sql("duck")


# ---------------------------------------------------------------------------
# OCR confidence dashboard over the cells table
# ---------------------------------------------------------------------------
# The reference's TextCell carries `from_ocr` and `confidence`
# (page.py TextCell fields); production extraction gates pages on OCR
# quality (low-confidence pages go to re-OCR or get dropped). This
# dashboard is that gate's input: per page, the OCR-cell fraction and
# the confidence distribution in exact micro-unit integers. The
# synthetic cells table carries a constant confidence, so the query
# derives a deterministic non-degenerate confidence from
# (page_id, cell_index) residues — a production run reads the real
# TextCell column through the identical aggregate shapes.
# 100 TB story: zero windows — one map-side-combined groupBy on the
# uniform page_id key; all signals are integer sums/mins.

OCR_LOW_CONF_MICRO = 600_000

_OCR_CONF = "(500000 + (page_id * 7919 + cell_index * 104729) % 500000)"


def ocr_quality_sql(src: str, dialect: str, extra_cte: str = "") -> str:
    # integer division only: '/' yields a double in both engines but
    # double->BIGINT casts TRUNCATE on Spark and ROUND on DuckDB — a
    # silent cross-engine divergence on any .5+ mean
    div = "div" if dialect == "spark" else "//"
    return f"""
        WITH {extra_cte}c AS (
            SELECT page_id, cell_index, from_ocr,
                   CAST({_OCR_CONF} AS BIGINT) AS conf_micro
            FROM {src} WHERE unit = '{UNIT_LINE}'
        )
        SELECT page_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(CASE WHEN from_ocr THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ocr,
               CAST(sum(conf_micro) {div} count(*) AS BIGINT)
                   AS mean_conf_micro,
               CAST(min(conf_micro) AS BIGINT) AS min_conf_micro,
               CAST(sum(CASE WHEN conf_micro < {OCR_LOW_CONF_MICRO}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_low_conf,
               bool_and(NOT from_ocr) AS machine_born
        FROM c
        GROUP BY page_id
    """


def q_page_ocr_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(ocr_quality_sql("pages_cells", "spark"))


def sql_page_ocr_quality() -> str:
    return ocr_quality_sql(
        "pages_cells", "duck",
        extra_cte=f"pages_cells AS ({cells_synth_sql('duck')}), ",
    )


# ---------------------------------------------------------------------------
# furniture detection: repeated header/footer lines across pages
# ---------------------------------------------------------------------------
# The reference splits content into BODY vs FURNITURE layers
# (ContentLayer; headers, footers, page numbers). Raw layout parses
# don't carry that label — extraction pipelines DERIVE it from
# repetition: a full line recurring at the same vertical band across
# many pages is furniture (the rule behind every PDF header/footer
# stripper). The synthesis injects a per-source header line and a
# global footer line into every page (cell_index < 0 marks injected
# rows, giving the gate a ground truth the detector must reproduce);
# detection itself never looks at the sign — only at (line text, band,
# distinct-page support).
#
# 100 TB story: line assembly is a groupBy on the uniform
# (page_id, band) key; support counting is TWO aggregations so the hot
# boilerplate key never accumulates distinct-state: first a groupBy on
# (line, band, page_id) — page_id keeps the key uniform — then a
# map-side-combinable count per (line, band). The support table joins
# back broadcast-sized (distinct repeated lines, not pages).

FURN_MIN_PAGES = 10
FURN_BAND_PT = 40


def furniture_sql(dialect: str) -> str:
    if dialect == "spark":
        line_agg = (
            "array_join(transform(array_sort(collect_list("
            "struct(c_l, text))), x -> x.text), ' ')"
        )
        div = "div"
        synth = cells_synth_sql("spark")
        hdr_src = "pages_src_docs"
    else:
        line_agg = "string_agg(text, ' ' ORDER BY c_l, text)"
        div = "//"
        synth = cells_synth_sql("duck")
        hdr_src = "documents"
    return f"""
        WITH grid AS ({synth}),
        cells AS (
            SELECT page_id, cell_index,
                   CAST(r_y2 AS BIGINT) {div} {FURN_BAND_PT} AS band,
                   r_x0 AS c_l, text
            FROM grid WHERE unit = '{UNIT_LINE}'
            UNION ALL
            SELECT doc_id AS page_id, -1 AS cell_index,
                   780 {div} {FURN_BAND_PT} AS band,
                   CAST(40 AS DOUBLE) AS c_l,
                   'hdr ' || source AS text
            FROM {hdr_src}
            UNION ALL
            SELECT doc_id AS page_id, -2 AS cell_index,
                   30 {div} {FURN_BAND_PT} AS band,
                   CAST(40 AS DOUBLE) AS c_l,
                   'confidential draft' AS text
            FROM {hdr_src}
        ),
        lines AS (
            SELECT page_id, band,
                   {line_agg} AS line,
                   min(cell_index) AS min_ci,
                   count(*) AS n_cells
            FROM cells
            GROUP BY page_id, band
        ),
        line_pages AS (
            SELECT line, band, page_id
            FROM lines GROUP BY line, band, page_id
        ),
        support AS (
            SELECT line, band, count(*) AS n_pages
            FROM line_pages GROUP BY line, band
        ),
        marked AS (
            SELECT l.page_id, l.band, l.n_cells, l.min_ci,
                   s.n_pages >= {FURN_MIN_PAGES} AS is_furniture
            FROM lines l JOIN support s
              ON l.line = s.line AND l.band = s.band
        )
        SELECT page_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN is_furniture THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_furniture,
               CAST(sum(CASE WHEN is_furniture THEN 0 ELSE n_cells END)
                    AS BIGINT) AS body_cells,
               bool_and(is_furniture = (min_ci < 0)) AS detect_exact
        FROM marked
        GROUP BY page_id
    """


def q_page_furniture(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(furniture_sql("spark"))


def sql_page_furniture() -> str:
    return furniture_sql("duck")


# ---------------------------------------------------------------------------
# table grid detection: rows/columns from cell alignment
# ---------------------------------------------------------------------------
# The geometric core of table-structure recognition (what docling's
# TableFormer model predicts for scanned pages, reduced to its
# deterministic skeleton for born-digital ones): cells sharing an
# x-start form a column, cells sharing a y-top form a row; a complete
# R x C grid reconstructs row-major reading order. The synthesis lays
# out an exact grid per page (R = 2 + page_id % 4 rows, C = 2 +
# page_id % 3 cols, one token per cell, row-major cell_index), and the
# detector — which never reads the labels — must recover (R, C),
# certify completeness, and reproduce the order. Production layout
# parsers bucket coordinates by a tolerance (floor(x / eps)) before
# the same dense ranking; exact-aligned synthesis keeps the oracle
# byte-stable.
# 100 TB story: dense_rank windows partition by page_id (uniform,
# bounded cells/page); the rollup is one map-side-combined groupBy.


def table_detect_sql(dialect: str) -> str:
    from_clause, i0, tok = _tok_lateral(dialect)
    div = "div" if dialect == "spark" else "//"
    # R x C grid; tokens beyond R*C cells are dropped by the synthesis
    # filter so every page is a complete grid of its first R*C tokens
    return f"""
        WITH grid AS (
            SELECT doc_id AS page_id,
                   CAST({i0} AS INT) AS cell_index,
                   {tok} AS text,
                   CAST(2 + doc_id % 4 AS INT) AS tr,
                   CAST(2 + doc_id % 3 AS INT) AS tc
            FROM {from_clause}
        ),
        cells AS (
            SELECT page_id, cell_index, text,
                   CAST(100 + (cell_index % tc) * 120 AS DOUBLE) AS c_l,
                   CAST(600 - (cell_index {div} tc) * 30
                        AS DOUBLE) AS c_t
            FROM grid WHERE cell_index < tr * tc
        ),
        ranked AS (
            SELECT page_id, cell_index,
                   dense_rank() OVER (
                       PARTITION BY page_id ORDER BY c_l
                   ) - 1 AS col_idx,
                   dense_rank() OVER (
                       PARTITION BY page_id ORDER BY c_t DESC
                   ) - 1 AS row_idx
            FROM cells
        ),
        dims AS (
            SELECT page_id, cell_index, row_idx, col_idx,
                   max(col_idx) OVER (PARTITION BY page_id) + 1 AS n_cols,
                   max(row_idx) OVER (PARTITION BY page_id) + 1 AS n_rows
            FROM ranked
        )
        SELECT page_id,
               CAST(max(n_rows) AS BIGINT) AS n_rows,
               CAST(max(n_cols) AS BIGINT) AS n_cols,
               CAST(count(*) AS BIGINT) AS n_cells,
               count(*) = max(n_rows) * max(n_cols) AS grid_complete,
               bool_and(row_idx * n_cols + col_idx = cell_index)
                   AS order_ok
        FROM dims
        GROUP BY page_id
    """


def q_page_table_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_cells_view(spark, sf_dir)
    return spark.sql(table_detect_sql("spark"))


def sql_page_table_detect() -> str:
    return table_detect_sql("duck")
