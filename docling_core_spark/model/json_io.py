"""Reference-format JSON interop: DoclingDocument JSON <-> dict model.

A user of the reference stores documents as DoclingDocument JSON
(schema_name/version + flat item arrays with `{"$ref": "#/texts/0"}`
pointers, document.py:1617-1648). These converters let the Spark engine
ingest that corpus directly and write back schema-compatible JSON:

  - `from_reference_json` mirrors `DoclingDocument.load_from_json`
    semantics (document.py:2940-2954) including the load-time
    validators: version compatibility gate (document.py:4261-4277), the
    v1.0.0 furniture-layer upgrade (document.py:1650-1664), and
    misplaced-list-item normalization (document.py:4291-4345);
  - `to_reference_json` mirrors `export_to_dict` (document.py:2995-3004,
    model_dump(mode=json, by_alias=True, exclude_none=True)).

Page/picture images are carried as `media_ref` URI strings — the engine
never materializes image bytes (SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from . import doc as D
from . import labels as L

_ITEM_ARRAYS = (
    "groups", "texts", "pictures", "tables", "key_value_items", "form_items",
)


def _ref_to_str(ref: Any) -> Optional[str]:
    if ref is None:
        return None
    if isinstance(ref, str):
        return ref
    return ref.get("$ref") or ref.get("cref")


def _str_to_ref(s: Optional[str]) -> Optional[dict]:
    return None if s is None else {"$ref": s}


def _prov_in(p: dict) -> dict:
    bbox = p.get("bbox") or {}
    cs = p.get("charspan") or [0, 0]
    return {
        "page_no": p.get("page_no", 1),
        "l": bbox.get("l", 0.0),
        "t": bbox.get("t", 0.0),
        "r": bbox.get("r", 0.0),
        "b": bbox.get("b", 0.0),
        "coord_origin": bbox.get("coord_origin", L.COORD_TOPLEFT),
        "charspan": (int(cs[0]), int(cs[1])),
    }


def _prov_out(p: dict) -> dict:
    return {
        "page_no": p["page_no"],
        "bbox": {
            "l": p["l"], "t": p["t"], "r": p["r"], "b": p["b"],
            "coord_origin": p.get("coord_origin", L.COORD_TOPLEFT),
        },
        "charspan": list(p.get("charspan", (0, 0))),
    }


def _image_meta_in(image: dict) -> dict:
    """ImageRef metadata minus the uri (document.py:491-541): mimetype,
    dpi and pixel size survive the round trip; bytes never enter."""
    size = image.get("size") or {}
    return {
        "mimetype": image.get("mimetype", "image/png"),
        "dpi": image.get("dpi", 72),
        "width": float(size.get("width", 0.0)),
        "height": float(size.get("height", 0.0)),
    }


def _image_out(media_ref: str, meta: Optional[dict]) -> dict:
    meta = meta or {}
    return {
        "mimetype": meta.get("mimetype", "image/png"),
        "dpi": meta.get("dpi", 72),
        "size": {
            "width": meta.get("width", 0.0),
            "height": meta.get("height", 0.0),
        },
        "uri": media_ref,
    }


def _node_common_in(obj: dict, kind: str) -> dict:
    item: Dict[str, Any] = {
        "kind": kind,
        "self_ref": obj["self_ref"],
        "parent": _ref_to_str(obj.get("parent")),
        "children": [_ref_to_str(c) for c in obj.get("children", [])],
        "content_layer": obj.get("content_layer", L.LAYER_BODY),
    }
    if "prov" in obj:
        item["prov"] = [_prov_in(p) for p in obj.get("prov") or []]
    return item


def _floating_in(obj: dict, item: dict) -> None:
    for key in ("captions", "footnotes", "references"):
        item[key] = [_ref_to_str(r) for r in obj.get(key, [])]


def from_reference_json(obj: dict, normalize: bool = True) -> dict:
    """Reference DoclingDocument JSON dict -> engine dict model.

    Raises ValueError on an incompatible version (major mismatch or
    newer minor), like the reference's version gate.
    """
    version = obj.get("version", D.CURRENT_VERSION)
    if not D.check_version_compatible(version):
        raise ValueError(f"incompatible document version {version}")

    doc = D.new_doc(name=obj.get("name", "document"), version=version)
    doc["origin"] = obj.get("origin")

    for root in ("body", "furniture"):
        r = obj.get(root) or {}
        doc[root]["children"] = [
            _ref_to_str(c) for c in r.get("children", [])
        ]
        doc[root]["name"] = r.get("name", "_root_")
        doc[root]["label"] = r.get("label", L.GROUP_UNSPECIFIED)
        doc[root]["content_layer"] = r.get(
            "content_layer",
            L.LAYER_BODY if root == "body" else L.LAYER_FURNITURE,
        )

    for g in obj.get("groups", []):
        item = _node_common_in(g, "groups")
        item["name"] = g.get("name", "group")
        item["label"] = g.get("label", L.GROUP_UNSPECIFIED)
        doc["groups"].append(item)

    for t in obj.get("texts", []):
        item = _node_common_in(t, "texts")
        item["label"] = t["label"]
        item["text"] = t.get("text", "")
        item["orig"] = t.get("orig", item["text"])
        for opt in ("formatting", "hyperlink"):
            if t.get(opt) is not None:
                item[opt] = t[opt]
        if t["label"] == L.SECTION_HEADER:
            item["level"] = t.get("level", 1)
        if t["label"] == L.LIST_ITEM:
            item["enumerated"] = t.get("enumerated", False)
            item["marker"] = t.get("marker", "-")
        if t["label"] == L.CODE:
            item["code_language"] = t.get("code_language", "unknown")
            _floating_in(t, item)
        doc["texts"].append(item)

    for p in obj.get("pictures", []):
        item = _node_common_in(p, "pictures")
        item["label"] = p.get("label", L.PICTURE)
        image = p.get("image") or {}
        item["media_ref"] = str(image.get("uri") or "")
        if image:
            item["media_meta"] = _image_meta_in(image)
        item["annotations"] = p.get("annotations", [])
        _floating_in(p, item)
        doc["pictures"].append(item)

    for t in obj.get("tables", []):
        item = _node_common_in(t, "tables")
        item["label"] = t.get("label", L.TABLE)
        data = t.get("data") or {}
        item["data"] = {
            "table_cells": [dict(c) for c in data.get("table_cells", [])],
            "num_rows": data.get("num_rows", 0),
            "num_cols": data.get("num_cols", 0),
        }
        item["annotations"] = t.get("annotations", [])
        _floating_in(t, item)
        doc["tables"].append(item)

    for arr, kind in (
        ("key_value_items", "key_value_items"), ("form_items", "form_items"),
    ):
        for kv in obj.get(arr, []):
            item = _node_common_in(kv, kind)
            item["label"] = kv.get(
                "label",
                L.KEY_VALUE_REGION if kind == "key_value_items" else L.FORM,
            )
            item["graph"] = kv.get("graph", {"cells": [], "links": []})
            _floating_in(kv, item)
            doc[kind].append(item)

    for page_no, page in (obj.get("pages") or {}).items():
        size = page.get("size") or {}
        p_item = {
            "width": float(size.get("width", 0.0)),
            "height": float(size.get("height", 0.0)),
            "page_no": int(page.get("page_no", page_no)),
            "media_ref": str((page.get("image") or {}).get("uri") or ""),
        }
        if page.get("image"):
            p_item["media_meta"] = _image_meta_in(page["image"])
        doc["pages"][int(page_no)] = p_item

    if version.startswith("1.0."):
        D.upgrade_content_layer(doc)
    if normalize:
        D.normalize_misplaced_list_items(doc)
    return doc


def _node_common_out(item: dict) -> dict:
    out: Dict[str, Any] = {
        "self_ref": item["self_ref"],
        "children": [_str_to_ref(c) for c in item.get("children", [])],
        "content_layer": item.get("content_layer", L.LAYER_BODY),
    }
    if item.get("parent") is not None:
        out["parent"] = _str_to_ref(item["parent"])
    if "prov" in item:
        out["prov"] = [_prov_out(p) for p in item.get("prov") or []]
    return out


def _floating_out(item: dict, out: dict) -> None:
    for key in ("captions", "footnotes", "references"):
        out[key] = [_str_to_ref(r) for r in item.get(key, [])]


def to_reference_json(doc: dict) -> dict:
    """Engine dict model -> reference-schema JSON dict (exclude-none)."""
    obj: Dict[str, Any] = {
        "schema_name": "DoclingDocument",
        "version": doc.get("version", D.CURRENT_VERSION),
        "name": doc.get("name", "document"),
    }
    if doc.get("origin") is not None:
        obj["origin"] = doc["origin"]

    for root in ("furniture", "body"):
        r = doc[root]
        obj[root] = {
            "self_ref": r["self_ref"],
            "children": [_str_to_ref(c) for c in r.get("children", [])],
            "content_layer": r["content_layer"],
            "name": r.get("name", "_root_"),
            "label": r.get("label", L.GROUP_UNSPECIFIED),
        }

    obj["groups"] = []
    for g in doc["groups"]:
        out = _node_common_out(g)
        out["name"] = g.get("name", "group")
        out["label"] = g.get("label", L.GROUP_UNSPECIFIED)
        obj["groups"].append(out)

    obj["texts"] = []
    for t in doc["texts"]:
        out = _node_common_out(t)
        out["label"] = t["label"]
        out["text"] = t.get("text", "")
        out["orig"] = t.get("orig", out["text"])
        for opt in ("formatting", "hyperlink"):
            if t.get(opt) is not None:
                out[opt] = t[opt]
        if t["label"] == L.SECTION_HEADER:
            out["level"] = t.get("level", 1)
        if t["label"] == L.LIST_ITEM:
            out["enumerated"] = t.get("enumerated", False)
            out["marker"] = t.get("marker", "-")
        if t["label"] == L.CODE:
            out["code_language"] = t.get("code_language", "unknown")
            _floating_out(t, out)
        obj["texts"].append(out)

    obj["pictures"] = []
    for p in doc["pictures"]:
        out = _node_common_out(p)
        out["label"] = p.get("label", L.PICTURE)
        out["annotations"] = p.get("annotations", [])
        if p.get("media_ref"):
            out["image"] = _image_out(p["media_ref"], p.get("media_meta"))
        _floating_out(p, out)
        obj["pictures"].append(out)

    obj["tables"] = []
    for t in doc["tables"]:
        out = _node_common_out(t)
        out["label"] = t.get("label", L.TABLE)
        from . import table as T

        out["data"] = {
            "table_cells": [
                {k: v for k, v in c.items() if v is not None}
                for c in t["data"].get("table_cells", [])
            ],
            "num_rows": t["data"].get("num_rows", 0),
            "num_cols": t["data"].get("num_cols", 0),
            # the reference serializes the COMPUTED dense grid too
            # (document.py:340-373 model_dump includes it)
            "grid": [
                [
                    {k: v for k, v in c.items() if v is not None}
                    for c in row
                ]
                for row in T.grid(t["data"])
            ],
        }
        out["annotations"] = t.get("annotations", [])
        _floating_out(t, out)
        obj["tables"].append(out)

    for arr in ("key_value_items", "form_items"):
        obj[arr] = []
        for kv in doc[arr]:
            out = _node_common_out(kv)
            out["label"] = kv["label"]
            out["graph"] = kv.get("graph", {"cells": [], "links": []})
            _floating_out(kv, out)
            obj[arr].append(out)

    obj["pages"] = {}
    for page_no, page in doc.get("pages", {}).items():
        p_out: Dict[str, Any] = {
            "size": {"width": page["width"], "height": page["height"]},
            "page_no": int(page.get("page_no", page_no)),
        }
        if page.get("media_ref"):
            p_out["image"] = _image_out(
                page["media_ref"], page.get("media_meta")
            )
        obj["pages"][str(int(page_no))] = p_out

    return obj
