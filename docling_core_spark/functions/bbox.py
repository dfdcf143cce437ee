"""BoundingBox interval algebra as SQL expression templates.

Parity target: docling_core/types/doc/base.py:35-435 (TOPLEFT
convention — the engine's internal normal form; origin flips are
explicit page-height transforms). Each op is ONE template string whose
placeholders name the coordinate columns; the template is valid Spark
SQL *and* DuckDB SQL verbatim (greatest/least/abs/CASE are shared), so
the engine expression and the correctness oracle cannot drift.

At scale these run inside whole-stage codegen — layout analytics
(overlap joins, reading-order checks, IoU dedup of detected regions)
over 10^12 provenance rows without leaving the JVM.
"""

from __future__ import annotations

IOU_EPS = 1.0e-6
STRICT_EPS = 1.0e-3

# placeholders: {al} {at} {ar} {ab} = box A's l/t/r/b, {bl} ... = box B's
AREA = "(abs({ar} - {al}) * abs({ab} - {at}))"

WIDTH = "({ar} - {al})"
HEIGHT = "abs({at} - {ab})"

_IW = "(least({ar}, {br}) - greatest({al}, {bl}))"
_IH = "(least({ab}, {bb}) - greatest({at}, {bt}))"

INTERSECTION_AREA = (
    f"(CASE WHEN {_IW} <= 0 OR {_IH} <= 0 THEN 0.0"
    f" ELSE {_IW} * {_IH} END)"
)

_UNION_FOR_IOU = (
    "(abs({al} - {ar}) * abs({at} - {ab})"
    " + abs({bl} - {br}) * abs({bt} - {bb})"
    f" - {INTERSECTION_AREA})"
)

IOU = f"({INTERSECTION_AREA} / ({_UNION_FOR_IOU} + {IOU_EPS}))"

INTERSECTION_OVER_SELF = (
    f"(CASE WHEN {AREA} > 0 THEN {INTERSECTION_AREA} / {AREA}"
    f" ELSE 0.0 END)"
)

UNION_AREA = (
    f"({AREA} + " + AREA.replace("{a", "{b") + f" - {INTERSECTION_AREA})"
)

OVERLAPS_H = "(NOT ({ar} <= {bl} OR {br} <= {al}))"
OVERLAPS_V = "(NOT ({ab} <= {bt} OR {bb} <= {at}))"
OVERLAPS = f"({OVERLAPS_H} AND {OVERLAPS_V})"

X_OVERLAP = "greatest(0.0, least({ar}, {br}) - greatest({al}, {bl}))"
Y_OVERLAP = "greatest(0.0, least({ab}, {bb}) - greatest({at}, {bt}))"
X_UNION = "greatest(0.0, greatest({ar}, {br}) - least({al}, {bl}))"
Y_UNION = "greatest(0.0, greatest({ab}, {bb}) - least({at}, {bt}))"

IS_LEFT_OF = "({al} < {bl})"
IS_STRICTLY_LEFT_OF = f"(({{ar}} + {STRICT_EPS}) < {{bl}})"
IS_ABOVE = "({at} < {bt})"
IS_STRICTLY_ABOVE = f"(({{ab}} + {STRICT_EPS}) < {{bt}})"

# origin flips; extra placeholder {ph} = page height
TO_BOTTOM_LEFT_T = "({ph} - {at})"
TO_BOTTOM_LEFT_B = "({ph} - {ab})"

# n-ary enclosing bbox over a grouped relation (aggregate form)
ENCLOSING_L = "min({al})"
ENCLOSING_T = "min({at})"
ENCLOSING_R = "max({ar})"
ENCLOSING_B = "max({ab})"


def fmt(template: str, a: str = "a", b: str = "b", ph: str = "ph") -> str:
    """Bind placeholders to column prefixes: fmt(IOU, 'x', 'y') reads
    x_l, x_t, ... y_b."""
    return template.format(
        al=f"{a}_l", at=f"{a}_t", ar=f"{a}_r", ab=f"{a}_b",
        bl=f"{b}_l", bt=f"{b}_t", br=f"{b}_r", bb=f"{b}_b",
        ph=ph,
    )


# ---------------------------------------------------------------------------
# pure-Python mirrors (used by the property tests against the reference)
# ---------------------------------------------------------------------------

def py_intersection_area(a, b):
    iw = min(a[2], b[2]) - max(a[0], b[0])
    ih = min(a[3], b[3]) - max(a[1], b[1])
    if iw <= 0 or ih <= 0:
        return 0.0
    return iw * ih


def py_iou(a, b, eps=IOU_EPS):
    inter = py_intersection_area(a, b)
    union = (
        abs(a[0] - a[2]) * abs(a[1] - a[3])
        + abs(b[0] - b[2]) * abs(b[1] - b[3])
        - inter
    )
    return inter / (union + eps)


# ---------------------------------------------------------------------------
# driver-table query + oracle (deterministic boxes from `events`)
# ---------------------------------------------------------------------------

_BOX_SYNTH = """
    SELECT event_id,
        CAST(event_id * 17 % 400 AS DOUBLE) AS a_l,
        CAST(event_id * 31 % 400 AS DOUBLE) AS a_t,
        CAST(event_id * 17 % 400 + 20 + event_id % 80 AS DOUBLE) AS a_r,
        CAST(event_id * 31 % 400 + 10 + event_id % 60 AS DOUBLE) AS a_b,
        CAST(user_id * 23 % 400 AS DOUBLE) AS b_l,
        CAST(user_id * 41 % 400 AS DOUBLE) AS b_t,
        CAST(user_id * 23 % 400 + 15 + user_id % 90 AS DOUBLE) AS b_r,
        CAST(user_id * 41 % 400 + 25 + user_id % 50 AS DOUBLE) AS b_b
    FROM {src}
"""


def _ops_select() -> str:
    return f"""
        SELECT event_id,
            round({fmt(AREA)}, 6) AS area_a,
            round({fmt(INTERSECTION_AREA)}, 6) AS inter_area,
            round({fmt(IOU)}, 6) AS iou,
            round({fmt(INTERSECTION_OVER_SELF)}, 6) AS io_self,
            round({fmt(UNION_AREA)}, 6) AS union_area,
            {fmt(OVERLAPS)} AS overlaps,
            round({fmt(X_OVERLAP)}, 6) AS x_overlap,
            round({fmt(Y_OVERLAP)}, 6) AS y_overlap,
            {fmt(IS_LEFT_OF)} AS is_left_of,
            {fmt(IS_STRICTLY_ABOVE)} AS is_strictly_above,
            round({fmt(TO_BOTTOM_LEFT_T, ph='792.0')}, 6) AS bl_t
        FROM boxes
    """


def q_bbox_ops(spark, sf_dir: str):
    """Layout algebra over deterministic boxes synthesized from events."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.createOrReplaceTempView("bbox_src_events")
    boxes_sql = _BOX_SYNTH.format(src="bbox_src_events")
    return spark.sql(f"WITH boxes AS ({boxes_sql}) {_ops_select()}")


def sql_bbox_ops() -> str:
    boxes_sql = _BOX_SYNTH.format(src="events")
    return f"WITH boxes AS ({boxes_sql}) {_ops_select()}"
