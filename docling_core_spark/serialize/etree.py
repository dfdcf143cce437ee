"""Element-tree debug exports.

Two variants, mirroring the reference:
  - export_to_element_tree (document.py:2893-2915): one space per level,
    all layers, groups + pictures traversed — used by the `.et` goldens.
  - export_to_indented_text (document.py:4111-4223): richer debug dump.
"""

from __future__ import annotations

from ..model import doc as D
from ..model import labels as L


def export_to_element_tree(doc: dict, shared=None) -> str:
    texts = []
    for ix, (item, level) in enumerate(
        D.iterate_items(
            doc,
            with_groups=True,
            traverse_pictures=True,
            included_content_layers=L.CONTENT_LAYERS,
            shared=shared,
        )
    ):
        kind = item.get("kind", "groups")
        label = item.get("label", "")
        if D.is_group(item):
            texts.append(
                " " * level + f"{ix}: {label} with name={item.get('name', 'group')}"
            )
        elif kind == "texts":
            t = item.get("text", "")
            texts.append(" " * level + f"{ix}: {label}: {t[:min(len(t), 100)]}")
        else:
            texts.append(" " * level + f"{ix}: {label}")
    return "\n".join(texts)


def _clip(text: str, max_text_len: int) -> str:
    middle = " ... "
    if max_text_len == -1:
        return text
    if len(text) < max_text_len + len(middle):
        return text
    tbeg = int((max_text_len - len(middle)) / 2)
    tend = int(max_text_len - tbeg)
    return text[0:tbeg] + middle + text[-tend:]


def export_to_indented_text(
    doc: dict, indent: str = "  ", max_text_len: int = -1
) -> str:
    """Parity: _export_to_indented_text (document.py:4111-4223), body DFS."""
    result = []
    for i, (item, level) in enumerate(
        D.iterate_items(doc, with_groups=True)
    ):
        kind = item.get("kind", "groups")
        label = item.get("label", "")
        pre = indent * level
        if D.is_group(item):
            result.append(
                f"{pre}item-{i} at level {level}: {label}: "
                f"group {item.get('name', 'group')}"
            )
        elif kind == "texts":
            text = _clip(item.get("text", ""), max_text_len)
            result.append(f"{pre}item-{i} at level {level}: {label}: {text}")
        elif kind == "tables":
            data = item.get("data", {})
            result.append(
                f"{pre}item-{i} at level {level}: {label} with "
                f"[{data.get('num_rows', 0)}x{data.get('num_cols', 0)}]"
            )
            for cap_ref in item.get("captions", []):
                cap = D.resolve(doc, cap_ref)
                if cap is not None:
                    result.append(
                        indent * (level + 1)
                        + f"item-{i} at level {level + 1}: {cap['label']}: "
                        + f"{cap.get('text', '')}"
                    )
        elif kind == "pictures":
            result.append(f"{pre}item-{i} at level {level}: {label}")
            for cap_ref in item.get("captions", []):
                cap = D.resolve(doc, cap_ref)
                if cap is not None:
                    result.append(
                        indent * (level + 1)
                        + f"item-{i} at level {level + 1}: {cap['label']}: "
                        + f"{cap.get('text', '')}"
                    )
        else:
            result.append(
                indent * (level + 1)
                + f"item-{i} at level {level}: {label}: ignored"
            )
    return "\n".join(result)
