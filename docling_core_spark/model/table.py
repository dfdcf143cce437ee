"""Table sub-model: sparse cells, dense grid painting, OTSL parse/export,
GitHub pipe-table emission.

Parity targets (reference, cited for semantics — no code copied):
  - TableData.grid computed field: document.py:333-373
  - TableItem.export_to_otsl: document.py:1338-1428
  - OTSL parse (otsl_parse_texts / otsl_extract_tokens_and_text /
    parse_table_content): document.py:3389-3562
  - markdown pipe table: transforms/serializer/markdown.py:203-263 with
    tabulate(tablefmt="github") formatting as pinned by the reference's own
    golden files (test/data/doc/2206.01062.yaml.md): left-aligned columns,
    column width = max(max cell width, header width + 2).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

# OTSL structural tokens (tokens.py:14-41)
T_FCEL = "<fcel>"
T_ECEL = "<ecel>"
T_LCEL = "<lcel>"
T_UCEL = "<ucel>"
T_XCEL = "<xcel>"
T_NL = "<nl>"
T_CHED = "<ched>"
T_RHED = "<rhed>"
T_SROW = "<srow>"

_STRUCTURAL = {T_FCEL, T_ECEL, T_LCEL, T_UCEL, T_XCEL, T_NL, T_CHED, T_RHED,
               T_SROW}
_CELL_STARTERS = {T_FCEL, T_ECEL, T_CHED, T_RHED, T_SROW}
_COL_ADVANCERS = _CELL_STARTERS | {T_LCEL, T_UCEL, T_XCEL}

_TAG_RE = re.compile(r"(<[^>]+>)")


def new_cell(
    text: str = "",
    start_row: int = 0,
    end_row: int = 1,
    start_col: int = 0,
    end_col: int = 1,
    column_header: bool = False,
    row_header: bool = False,
    row_section: bool = False,
    bbox: Optional[dict] = None,
) -> dict:
    return {
        "text": text,
        "row_span": end_row - start_row,
        "col_span": end_col - start_col,
        "start_row_offset_idx": start_row,
        "end_row_offset_idx": end_row,
        "start_col_offset_idx": start_col,
        "end_col_offset_idx": end_col,
        "column_header": column_header,
        "row_header": row_header,
        "row_section": row_section,
        "bbox": bbox,
    }


def new_table_data(cells: List[dict], num_rows: int, num_cols: int) -> dict:
    return {"table_cells": cells, "num_rows": num_rows, "num_cols": num_cols}


def grid(data: dict) -> List[List[dict]]:
    """Paint sparse cells over their spanned ranges (document.py:340-373)."""
    nrows, ncols = data["num_rows"], data["num_cols"]
    g = [
        [new_cell("", i, i + 1, j, j + 1) for j in range(ncols)]
        for i in range(nrows)
    ]
    for cell in data["table_cells"]:
        for i in range(
            min(cell["start_row_offset_idx"], nrows),
            min(cell["end_row_offset_idx"], nrows),
        ):
            for j in range(
                min(cell["start_col_offset_idx"], ncols),
                min(cell["end_col_offset_idx"], ncols),
            ):
                g[i][j] = cell
    return g


# ---------------------------------------------------------------------------
# OTSL parse (string -> TableData)
# ---------------------------------------------------------------------------

def _extract_tokens_and_text(s: str) -> Tuple[List[str], List[str]]:
    tokens = [
        t
        for t in _TAG_RE.findall(s)
        if not t.startswith("<loc_") and t not in ("<otsl>", "</otsl>")
    ]
    parts = [
        p
        for p in _TAG_RE.split(s)
        if not p.startswith("<loc_") and p not in ("<otsl>", "</otsl>")
    ]
    parts = [p for p in parts if p.strip()]
    return tokens, parts


def parse_otsl(otsl: str) -> dict:
    """OTSL token string -> TableData dict (document.py:3389-3562)."""
    tokens, mixed = _extract_tokens_and_text(otsl)
    tokens = [t for t in tokens if t in _STRUCTURAL]

    # rows of structural tokens, split on <nl>
    rows: List[List[str]] = []
    cur: List[str] = []
    for t in tokens:
        if t == T_NL:
            rows.append(cur)
            cur = []
        else:
            cur.append(t)
    if cur:
        rows.append(cur)
    # reference groupby-drop: trailing empty rows from consecutive <nl> are
    # not produced; only non-empty groups count
    rows = [r for r in rows if r] or []

    cells: List[dict] = []
    r_idx = 0
    c_idx = 0

    def count_right(c0: int, r0: int, which) -> int:
        span = 0
        c = c0
        while c < len(rows[r0]) and rows[r0][c] in which:
            c += 1
            span += 1
        return span

    def count_down(c0: int, r0: int, which) -> int:
        span = 0
        r = r0
        while r < len(rows) and c0 < len(rows[r]) and rows[r][c0] in which:
            r += 1
            span += 1
        return span

    for i, tok in enumerate(mixed):
        if tok in _CELL_STARTERS:
            row_span = 1
            col_span = 1
            right_offset = 1
            cell_text = ""
            if tok != T_ECEL:
                cell_text = mixed[i + 1] if i + 1 < len(mixed) else ""
                if cell_text in _STRUCTURAL:  # empty non-ecel cell
                    cell_text = ""
                right_offset = 2
            next_right = mixed[i + right_offset] if i + right_offset < len(mixed) else ""
            next_bottom = ""
            if r_idx + 1 < len(rows) and c_idx < len(rows[r_idx + 1]):
                next_bottom = rows[r_idx + 1][c_idx]
            if next_right in (T_LCEL, T_XCEL):
                col_span += count_right(c_idx + 1, r_idx, (T_LCEL, T_XCEL))
            if next_bottom in (T_UCEL, T_XCEL):
                row_span += count_down(c_idx, r_idx + 1, (T_UCEL, T_XCEL))
            cells.append(
                new_cell(
                    text=cell_text.strip(),
                    start_row=r_idx,
                    end_row=r_idx + row_span,
                    start_col=c_idx,
                    end_col=c_idx + col_span,
                )
            )
        if tok in _COL_ADVANCERS:
            c_idx += 1
        if tok == T_NL:
            r_idx += 1
            c_idx = 0

    return new_table_data(
        cells,
        num_rows=len(rows),
        num_cols=max((len(r) for r in rows), default=0),
    )


# ---------------------------------------------------------------------------
# OTSL export (TableData -> string)
# ---------------------------------------------------------------------------

def export_otsl(data: dict, add_cell_text: bool = True) -> str:
    """TableData -> OTSL token string (document.py:1338-1428, no cell locs)."""
    if not data["table_cells"]:
        return ""
    g = grid(data)
    out: List[str] = []
    for i in range(data["num_rows"]):
        for j in range(data["num_cols"]):
            cell = g[i][j]
            content = cell["text"].strip()
            rowstart = cell["start_row_offset_idx"]
            colstart = cell["start_col_offset_idx"]
            rowspan = cell["row_span"]
            colspan = cell["col_span"]
            if rowstart == i and colstart == j:
                if content:
                    if cell["column_header"]:
                        out.append(T_CHED)
                    elif cell["row_header"]:
                        out.append(T_RHED)
                    elif cell["row_section"]:
                        out.append(T_SROW)
                    else:
                        out.append(T_FCEL)
                    if add_cell_text:
                        out.append(content)
                else:
                    out.append(T_ECEL)
            else:
                add_cross = False
                if rowstart != i:
                    if colspan == 1:
                        out.append(T_UCEL)
                    else:
                        add_cross = True
                if colstart != j:
                    if rowspan == 1:
                        out.append(T_LCEL)
                    else:
                        add_cross = True
                if add_cross:
                    out.append(T_XCEL)
        out.append(T_NL)
    return "".join(out)


# ---------------------------------------------------------------------------
# GitHub pipe table (markdown)
# ---------------------------------------------------------------------------

_MIN_HEADER_PADDING = 2  # tabulate MIN_PADDING


def to_pipe_table(data: dict) -> str:
    """Dense grid -> GitHub pipe table.

    Format pinned by the reference's golden exports: first grid row is the
    header, columns left-aligned, width = max(cell width,
    header width + 2); newlines in cells replaced by spaces
    (markdown.py:236-243); tables with <2 rows or 0 cols emit "".
    """
    g = grid(data)
    rows = [[c["text"].replace("\n", " ") for c in row] for row in g]
    if len(rows) <= 1 or not rows[0]:
        return ""
    headers, body = rows[0], rows[1:]
    ncols = len(headers)
    widths = [
        max(
            [len(headers[j]) + _MIN_HEADER_PADDING]
            + [len(r[j]) for r in body]
        )
        for j in range(ncols)
    ]
    def fmt_row(vals):
        return "| " + " | ".join(
            v.ljust(widths[j]) for j, v in enumerate(vals)
        ) + " |"
    lines = [fmt_row(headers)]
    lines.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    lines.extend(fmt_row(r) for r in body)
    return "\n".join(lines)


def to_html_table(data: dict) -> str:
    """Dense grid -> <table> HTML (html.py:298-366): rowspan/colspan attrs,
    <th> for column headers, covered cells skipped."""
    import html as _html

    g = grid(data)
    nrows, ncols = data["num_rows"], data["num_cols"]
    body = ""
    for i in range(nrows):
        body += "<tr>"
        for j in range(ncols):
            cell = g[i][j]
            rowspan, rowstart = cell["row_span"], cell["start_row_offset_idx"]
            colspan, colstart = cell["col_span"], cell["start_col_offset_idx"]
            if rowstart != i or colstart != j:
                continue
            content = _html.escape(cell["text"].strip())
            celltag = "th" if cell["column_header"] else "td"
            opening = celltag
            if rowspan > 1:
                opening += f' rowspan="{rowspan}"'
            if colspan > 1:
                opening += f' colspan="{colspan}"'
            body += f"<{opening}>{content}</{celltag}>"
        body += "</tr>"
    return f"<table><tbody>{body}</tbody></table>"


def export_dataframe(data: dict) -> Tuple[Optional[List[str]], List[List[str]]]:
    """Grid -> (columns, body rows) mirroring `export_to_dataframe`
    (document.py:1231-1274): leading rows where any cell is a column
    header are merged into dot-joined column names; remaining rows are
    the body. columns is None when there are no header rows (pandas
    would use a RangeIndex)."""
    if data["num_rows"] == 0 or data["num_cols"] == 0:
        return None, []
    g = grid(data)
    num_headers = 0
    for row in g:
        if any(c["column_header"] for c in row):
            num_headers += 1
        else:
            break
    columns: Optional[List[str]] = None
    if num_headers > 0:
        columns = ["" for _ in range(data["num_cols"])]
        for i in range(num_headers):
            for j, cell in enumerate(g[i]):
                col_name = cell["text"]
                if columns[j] != "":
                    col_name = f".{col_name}"
                columns[j] += col_name
    body = [[c["text"] for c in row] for row in g[num_headers:]]
    return columns, body


def to_triplets(data: dict) -> str:
    """Table -> 'row, col = value' triplet text, exactly mirroring
    TripletTableSerializer (hierarchical_chunker.py:126-172): the header
    is re-inserted as the first row, row labels come from column 0, and
    triplets skip row/col 0. Tables with no body rows or fewer than two
    columns serialize to ''. No-header tables get pandas' RangeIndex
    column names ('0', '1', ...)."""
    columns, body = export_dataframe(data)
    nrows, ncols = len(body), data["num_cols"]
    if nrows < 1 or ncols < 2:
        return ""
    header_row = (
        [str(c) for c in columns]
        if columns is not None
        else [str(j) for j in range(ncols)]
    )
    full = [header_row] + [[str(v) for v in row] for row in body]
    rows = [r[0].strip() for r in full]
    cols = [c.strip() for c in full[0]]
    parts = [
        f"{rows[i]}, {cols[j]} = {full[i][j].strip()}"
        for i in range(1, len(full))
        for j in range(1, ncols)
    ]
    return ". ".join(parts)
