"""Plain-dict document model used inside Arrow-batched UDFs.

Semantic parity with docling-core's DoclingDocument
(docling_core/types/doc/document.py:1617-1648): flat per-kind item arrays
(`texts`, `tables`, `pictures`, `groups`, `key_value_items`, `form_items`)
whose elements reference each other through `#/array/idx` JSON pointers,
plus two roots (`body`, `furniture`) forming a rooted ordered tree whose
DFS order is the reading order.

We deliberately avoid Pydantic here: this model is instantiated millions of
times per executor inside `mapInPandas`, so items are plain dicts and all
validation is a separate vectorizable pass (see
:mod:`docling_core_spark.model.validate`).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

from . import labels as L

CURRENT_VERSION = "1.4.0"  # document.py:57

_ARRAY_FOR_LABEL = {
    L.TABLE: "tables",
    L.PICTURE: "pictures",
    L.CHART: "pictures",
}

# Which labels are "text items" (TextItem subclasses, document.py:851-1073)
TEXT_LABELS = frozenset(
    {
        L.CAPTION, L.CHECKBOX_SELECTED, L.CHECKBOX_UNSELECTED, L.CODE,
        L.DOCUMENT_INDEX, L.FOOTNOTE, L.FORMULA, L.LIST_ITEM, L.PAGE_FOOTER,
        L.PAGE_HEADER, L.PARAGRAPH, L.REFERENCE, L.SECTION_HEADER, L.TEXT,
        L.TITLE, L.EMPTY_VALUE, L.GRADING_SCALE, L.HANDWRITTEN_TEXT,
    }
)

GROUP_KINDS = frozenset({"groups"})
LIST_GROUP_LABELS = frozenset({L.GROUP_LIST, L.GROUP_ORDERED_LIST})


def new_doc(name: str = "document", version: str = CURRENT_VERSION) -> dict:
    """Create an empty document (parity: DoclingDocument defaults)."""
    return {
        "schema_name": "DoclingDocument",
        "version": version,
        "name": name,
        "origin": None,
        "body": {
            "self_ref": "#/body",
            "parent": None,
            "children": [],
            "content_layer": L.LAYER_BODY,
            "name": "_root_",
            "label": L.GROUP_UNSPECIFIED,
        },
        "furniture": {
            "self_ref": "#/furniture",
            "parent": None,
            "children": [],
            "content_layer": L.LAYER_FURNITURE,
            "name": "_root_",
            "label": L.GROUP_UNSPECIFIED,
        },
        "groups": [],
        "texts": [],
        "pictures": [],
        "tables": [],
        "key_value_items": [],
        "form_items": [],
        "pages": {},
    }


def resolve(doc: dict, ref: str) -> Optional[dict]:
    """Resolve a `#/array/idx` or `#/body` pointer (document.py:476-488)."""
    if ref == "#/body":
        return doc["body"]
    if ref == "#/furniture":
        return doc["furniture"]
    parts = ref.split("/")
    if len(parts) != 3:
        return None
    arr = doc.get(parts[1])
    if arr is None:
        return None
    try:
        return arr[int(parts[2])]
    except (IndexError, ValueError):
        return None


# ---------------------------------------------------------------------------
# Builders (parity: document.py:2047-2663 add_* methods)
# ---------------------------------------------------------------------------

def _attach(doc: dict, array: str, item: dict, parent: Optional[dict]) -> dict:
    parent = parent if parent is not None else doc["body"]
    idx = len(doc[array])
    ref = f"#/{array}/{idx}"
    item["self_ref"] = ref
    item["parent"] = parent["self_ref"]
    item.setdefault("children", [])
    doc[array].append(item)
    parent["children"].append(ref)
    return item


def add_group(
    doc: dict,
    label: str = L.GROUP_UNSPECIFIED,
    name: Optional[str] = None,
    parent: Optional[dict] = None,
    content_layer: Optional[str] = None,
) -> dict:
    default_name = {
        L.GROUP_LIST: "list",
        L.GROUP_ORDERED_LIST: "ordered list",
        L.GROUP_INLINE: "group",
    }.get(label, "group")
    item = {
        "kind": "groups",
        "label": label,
        "name": name if name is not None else default_name,
        "content_layer": content_layer or L.LAYER_BODY,
    }
    return _attach(doc, "groups", item, parent)


def add_list_group(doc: dict, ordered: bool = False, **kw) -> dict:
    return add_group(
        doc, L.GROUP_ORDERED_LIST if ordered else L.GROUP_LIST, **kw
    )


def add_inline_group(doc: dict, **kw) -> dict:
    return add_group(doc, L.GROUP_INLINE, **kw)


import re as _re

_URL_NO_PATH = _re.compile(r"^([a-z][a-z0-9+.\-]*://[^/?#]+)($|[?#].*)$")


def normalize_hyperlink(url: str) -> str:
    """Mirror Pydantic AnyUrl's path normalization (the reference stores
    hyperlinks as AnyUrl, document.py:860): a URL with an authority but
    no path serializes with a trailing '/'."""
    m = _URL_NO_PATH.match(url)
    if m:
        return f"{m.group(1)}/{m.group(2)}"
    return url


def add_text(
    doc: dict,
    label: str,
    text: str,
    orig: Optional[str] = None,
    parent: Optional[dict] = None,
    prov: Optional[List[dict]] = None,
    content_layer: Optional[str] = None,
    formatting: Optional[dict] = None,
    hyperlink: Optional[str] = None,
    **extra: Any,
) -> dict:
    item = {
        "kind": "texts",
        "label": label,
        "text": text,
        "orig": orig if orig is not None else text,
        "prov": prov or [],
        "content_layer": content_layer
        or (
            L.LAYER_FURNITURE
            if label in (L.PAGE_HEADER, L.PAGE_FOOTER)
            else L.LAYER_BODY
        ),
    }
    if formatting:
        item["formatting"] = formatting
    if hyperlink:
        item["hyperlink"] = normalize_hyperlink(hyperlink)
    if label == L.SECTION_HEADER:
        item["level"] = int(extra.pop("level", 1))
    if label == L.LIST_ITEM:
        item["enumerated"] = bool(extra.pop("enumerated", False))
        item["marker"] = extra.pop("marker", "-")
    if label == L.CODE:
        item["code_language"] = extra.pop("code_language", "unknown")
        item["captions"] = []
    if label == L.FORMULA:
        pass
    item.update(extra)
    return _attach(doc, "texts", item, parent)


def add_title(doc: dict, text: str, **kw) -> dict:
    return add_text(doc, L.TITLE, text, **kw)


def add_heading(doc: dict, text: str, level: int = 1, **kw) -> dict:
    return add_text(doc, L.SECTION_HEADER, text, level=level, **kw)


def add_list_item(
    doc: dict,
    text: str,
    enumerated: bool = False,
    marker: str = "-",
    **kw,
) -> dict:
    # reference coerces any falsy marker to "-" (document.py:2186)
    return add_text(
        doc, L.LIST_ITEM, text, enumerated=enumerated,
        marker=marker or "-", **kw,
    )


def add_code(doc: dict, text: str, code_language: str = "unknown", **kw) -> dict:
    return add_text(doc, L.CODE, text, code_language=code_language, **kw)


def add_formula(doc: dict, text: str, **kw) -> dict:
    return add_text(doc, L.FORMULA, text, **kw)


def add_table(
    doc: dict,
    data: dict,
    parent: Optional[dict] = None,
    prov: Optional[List[dict]] = None,
    label: str = L.TABLE,
    content_layer: Optional[str] = None,
) -> dict:
    item = {
        "kind": "tables",
        "label": label,
        "data": data,
        "captions": [],
        "footnotes": [],
        "references": [],
        "annotations": [],
        "prov": prov or [],
        "content_layer": content_layer or L.LAYER_BODY,
    }
    return _attach(doc, "tables", item, parent)


def add_picture(
    doc: dict,
    parent: Optional[dict] = None,
    prov: Optional[List[dict]] = None,
    media_ref: str = "",
    annotations: Optional[List[dict]] = None,
    label: str = L.PICTURE,
    content_layer: Optional[str] = None,
) -> dict:
    item = {
        "kind": "pictures",
        "label": label,
        "media_ref": media_ref,
        "captions": [],
        "footnotes": [],
        "references": [],
        "annotations": annotations or [],
        "prov": prov or [],
        "content_layer": content_layer or L.LAYER_BODY,
    }
    return _attach(doc, "pictures", item, parent)


def add_key_values(
    doc: dict,
    graph: dict,
    parent: Optional[dict] = None,
    prov: Optional[List[dict]] = None,
) -> dict:
    item = {
        "kind": "key_value_items",
        "label": L.KEY_VALUE_REGION,
        "graph": graph,
        "captions": [],
        "footnotes": [],
        "references": [],
        "prov": prov or [],
        "content_layer": L.LAYER_BODY,
    }
    return _attach(doc, "key_value_items", item, parent)


def add_form(doc: dict, graph: dict, parent: Optional[dict] = None) -> dict:
    item = {
        "kind": "form_items",
        "label": L.FORM,
        "graph": graph,
        "captions": [],
        "footnotes": [],
        "references": [],
        "prov": [],
        "content_layer": L.LAYER_BODY,
    }
    return _attach(doc, "form_items", item, parent)


def add_caption_to(doc: dict, owner: dict, text: str, prov=None) -> dict:
    cap = add_text(doc, L.CAPTION, text, parent=doc["body"], prov=prov)
    owner.setdefault("captions", []).append(cap["self_ref"])
    return cap


def add_page(doc: dict, page_no: int, width: float, height: float) -> None:
    doc["pages"][int(page_no)] = {
        "width": float(width),
        "height": float(height),
        "page_no": int(page_no),
    }


# ---------------------------------------------------------------------------
# Traversal (parity: document.py:2680-2767 iterate_items)
# ---------------------------------------------------------------------------

def is_group(item: dict) -> bool:
    return item.get("kind", "groups") == "groups" or item["self_ref"] in (
        "#/body",
        "#/furniture",
    )


def is_doc_item(item: dict) -> bool:
    return not is_group(item)


def build_ref_map(doc: dict) -> dict:
    """Positional-pointer -> item map equivalent to `resolve` over every
    live ref of a frozen document (O(n) once vs string-parse per call)."""
    m = {"#/body": doc["body"], "#/furniture": doc["furniture"]}
    for arr in (
        "groups", "texts", "pictures", "tables",
        "key_value_items", "form_items",
    ):
        for i, it in enumerate(doc.get(arr) or ()):
            m[f"#/{arr}/{i}"] = it
    for k, v in (doc.get("pages") or {}).items():
        m[f"#/pages/{k}"] = v
    return m


class SharedDocContext:
    """Memoized traversal state for ONE document whose tree is no longer
    being mutated (create it *after* parse/normalize, before export).

    Serializing a document runs the same pre-order DFS many times — once
    per format per exclusion/caption-set build plus one sub-walk per list
    group — so the flagship pipeline's per-doc cost was dominated by
    re-walking an identical tree (~377 iterate_items calls/doc profiled).
    Sharing this context across the markdown/doctags/html/etree exports
    makes each distinct (root, filter) traversal happen once.

    Not thread-safe and MUST be discarded if the tree is mutated.
    """

    __slots__ = ("doc", "ref_map", "iter_cache", "captions", "excluded")

    def __init__(self, doc: dict):
        self.doc = doc
        self.ref_map = build_ref_map(doc)
        self.iter_cache: dict = {}
        self.captions = None  # filled by serialize.common on first use
        self.excluded: dict = {}  # params-signature -> frozenset of refs

    def resolve(self, ref: str):
        return self.ref_map.get(ref)


def _walk_items(
    doc: dict,
    root: dict,
    with_groups: bool,
    traverse_pictures: bool,
    page_no: Optional[int],
    layers: frozenset,
    shared: Optional[SharedDocContext],
) -> Iterator[Tuple[dict, int]]:
    resolve_ref = shared.ref_map.get if shared is not None else (
        lambda r: resolve(doc, r)
    )

    def walk(node: dict, level: int) -> Iterator[Tuple[dict, int]]:
        node_is_group = is_group(node)
        should_yield = (
            (not node_is_group or with_groups)
            and (
                node_is_group
                or page_no is None
                or any(p["page_no"] == page_no for p in node.get("prov", []))
            )
            and node.get("content_layer", L.LAYER_BODY) in layers
        )
        if should_yield:
            yield node, level
        node_is_picture = node.get("kind") == "pictures"
        allowed_pic_refs = (
            set(node.get("captions", [])) if node_is_picture else ()
        )
        for child_ref in node.get("children", []):
            child = resolve_ref(child_ref)
            if child is None:
                continue
            if (
                node_is_picture
                and not traverse_pictures
                and is_doc_item(child)
                and child["self_ref"] not in allowed_pic_refs
            ):
                continue
            yield from walk(child, level + 1)

    yield from walk(root, 0)


def iterate_items(
    doc: dict,
    root: Optional[dict] = None,
    with_groups: bool = False,
    traverse_pictures: bool = False,
    page_no: Optional[int] = None,
    included_content_layers: Optional[frozenset] = None,
    shared: Optional[SharedDocContext] = None,
) -> Iterator[Tuple[dict, int]]:
    """Pre-order DFS yielding (item, level). Parity: document.py:2699-2767.

    With `shared`, the materialized traversal is memoized per
    (root, filters) key — identical sequence, paid once per document."""
    layers = (
        included_content_layers
        if included_content_layers is not None
        else L.DEFAULT_CONTENT_LAYERS
    )
    start = root if root is not None else doc["body"]
    if shared is None:
        return _walk_items(
            doc, start, with_groups, traverse_pictures, page_no, layers, None
        )
    key = (
        id(start), with_groups, traverse_pictures, page_no, layers,
    )
    hit = shared.iter_cache.get(key)
    if hit is None:
        hit = list(
            _walk_items(
                doc, start, with_groups, traverse_pictures, page_no,
                layers, shared,
            )
        )
        shared.iter_cache[key] = hit
    return iter(hit)


def iterate_items_with_stack(
    doc: dict,
    root: Optional[dict] = None,
    with_groups: bool = False,
    traverse_pictures: bool = False,
    page_no: Optional[int] = None,
    included_content_layers: Optional[frozenset] = None,
) -> Iterator[Tuple[dict, List[int]]]:
    """Pre-order DFS yielding (item, tree-coordinate stack). Parity:
    `_iterate_items_with_stack` (document.py:2699-2767) — including its
    subtly different page filter (groups always pass it) — except each
    yielded stack is a fresh copy, not the live mutation buffer."""
    layers = (
        included_content_layers
        if included_content_layers is not None
        else L.DEFAULT_CONTENT_LAYERS
    )

    def walk(node: dict, stack: List[int]) -> Iterator[Tuple[dict, List[int]]]:
        node_is_group = is_group(node)
        should_yield = (
            (not node_is_group or with_groups)
            and (
                node_is_group
                or page_no is None
                or any(p["page_no"] == page_no for p in node.get("prov", []))
            )
            and node.get("content_layer", L.LAYER_BODY) in layers
        )
        if should_yield:
            yield node, list(stack)
        node_is_picture = node.get("kind") == "pictures"
        allowed_pic_refs = (
            set(node.get("captions", [])) if node_is_picture else ()
        )
        for child_ind, child_ref in enumerate(node.get("children", [])):
            child = resolve(doc, child_ref)
            if child is None:
                continue
            if (
                node_is_picture
                and not traverse_pictures
                and is_doc_item(child)
                and child["self_ref"] not in allowed_pic_refs
            ):
                continue
            yield from walk(child, stack + [child_ind])

    yield from walk(root if root is not None else doc["body"], [])


def get_stack_of_ref(doc: dict, ref: str) -> Tuple[bool, List[int]]:
    """Tree coordinates of an item by self_ref. Parity:
    `_get_stack_of_refitem` (document.py:1730-1751): (True, []) for the
    body root, (False, []) when the node has no parent chain, else
    (True, child-index path from its root)."""
    if ref == doc["body"]["self_ref"]:
        return (True, [])
    node = resolve(doc, ref)
    if node is None or node.get("parent") is None:
        return (False, [])
    stack: List[int] = []
    while node.get("parent") is not None:
        parent = resolve(doc, node["parent"])
        stack.insert(0, parent["children"].index(node["self_ref"]))
        node = parent
    return (True, stack)


def validate_tree(doc: dict, root: dict) -> bool:
    """Each child's parent must point back (document.py:2669-2678)."""
    for child_ref in root.get("children", []):
        child = resolve(doc, child_ref)
        if child is None or child.get("parent") != root["self_ref"]:
            return False
        if not validate_tree(doc, child):
            return False
    return True


# ---------------------------------------------------------------------------
# Mutations (parity: document.py:1670-2041)
# ---------------------------------------------------------------------------

def append_child_item(doc: dict, child_ref: str, parent: dict) -> None:
    child = resolve(doc, child_ref)
    child["parent"] = parent["self_ref"]
    parent["children"].append(child_ref)


def insert_item_before_sibling(doc: dict, item_ref: str, sibling: dict) -> None:
    """Move/insert an existing item right before `sibling` under its parent."""
    parent = resolve(doc, sibling["parent"])
    item = resolve(doc, item_ref)
    item["parent"] = parent["self_ref"]
    pos = parent["children"].index(sibling["self_ref"])
    parent["children"].insert(pos, item_ref)


def insert_item_after_sibling(doc: dict, item_ref: str, sibling: dict) -> None:
    """Move/insert an existing item right after `sibling` under its
    parent (document.py:1697-1701 via _insert_item_at_stack)."""
    parent = resolve(doc, sibling["parent"])
    item = resolve(doc, item_ref)
    item["parent"] = parent["self_ref"]
    pos = parent["children"].index(sibling["self_ref"])
    parent["children"].insert(pos + 1, item_ref)


def replace_item(doc: dict, new_ref: str, old_ref: str) -> None:
    """Replace old item with new: insert-after + delete
    (document.py:1717-1720). The delete renumbers refs, so `new_ref`
    may be stale afterwards — callers re-resolve by identity."""
    old = resolve(doc, old_ref)
    insert_item_after_sibling(doc, new_ref, old)
    delete_items(doc, [old_ref])


def detach_from_parent(doc: dict, item: dict) -> None:
    parent = resolve(doc, item.get("parent") or "#/body")
    if parent and item["self_ref"] in parent["children"]:
        parent["children"].remove(item["self_ref"])


def delete_items(doc: dict, refs: List[str]) -> None:
    """Delete items + descendants and renumber all refs.

    Parity: document.py:1879-2041 (`_delete_items` + delta-lookup ref
    rewrite). Implemented as a pure array rebuild: collect the doomed set
    (incl. descendants), drop them from their arrays, then remap every ref
    through a prefix-sum delta per array.
    """
    doomed: set = set()

    def mark(ref: str) -> None:
        if ref in doomed:
            return
        doomed.add(ref)
        item = resolve(doc, ref)
        if item:
            for c in item.get("children", []):
                mark(c)

    for r in refs:
        mark(r)

    # detach doomed roots from their parents
    for r in list(doomed):
        item = resolve(doc, r)
        if item is None:
            continue
        parent_ref = item.get("parent")
        if parent_ref and parent_ref not in doomed:
            parent = resolve(doc, parent_ref)
            if parent and r in parent["children"]:
                parent["children"].remove(r)

    arrays = ["groups", "texts", "pictures", "tables", "key_value_items",
              "form_items"]
    remap: Dict[str, str] = {}
    for arr in arrays:
        kept = []
        for i, item in enumerate(doc[arr]):
            old_ref = f"#/{arr}/{i}"
            if old_ref in doomed:
                continue
            new_ref = f"#/{arr}/{len(kept)}"
            remap[old_ref] = new_ref
            kept.append(item)
        doc[arr] = kept

    def fix(ref: Optional[str]) -> Optional[str]:
        if ref is None or ref in ("#/body", "#/furniture"):
            return ref
        return remap.get(ref, ref)

    for node in [doc["body"], doc["furniture"]] + sum(
        (doc[a] for a in arrays), []
    ):
        node["self_ref"] = fix(node["self_ref"])
        node["parent"] = fix(node.get("parent"))
        node["children"] = [
            fix(c) for c in node.get("children", []) if c not in doomed
        ]
        for key in ("captions", "footnotes", "references"):
            if key in node:
                node[key] = [fix(c) for c in node[key] if c not in doomed]


# ---------------------------------------------------------------------------
# Normalization (parity: document.py:4291-4345 validate_misplaced_list_items)
# ---------------------------------------------------------------------------

def normalize_misplaced_list_items(doc: dict) -> int:
    """Wrap runs of ListItems with non-list parents into new list groups.

    Returns the number of synthetic groups created. Exact mirror of the
    model validator `validate_misplaced_list_items` (document.py:4291-4345):
    runs are built over the full DFS (all layers, with groups, traversing
    pictures), a run continues only when the previous DFS item is a
    misbehaving ListItem parented by body; each run — processed in reverse —
    gets a new Ordered/UnorderedList group (ordered iff the first item is
    enumerated) inserted at the first item's position, the old items are
    DELETED (triggering ref renumbering) and re-added fresh under the group.
    """
    runs: List[List[dict]] = []
    prev: Optional[dict] = None
    for item, _lvl in iterate_items(
        doc,
        with_groups=True,
        traverse_pictures=True,
        included_content_layers=L.CONTENT_LAYERS,
    ):
        if (
            item.get("label") == L.LIST_ITEM
            and item.get("kind") == "texts"
            and not _parent_is_list(doc, item)
        ):
            prev_continues = (
                prev is not None
                and prev.get("label") == L.LIST_ITEM
                and prev.get("kind") == "texts"
                and (prev.get("parent") or "#/body") == "#/body"
            )
            if prev_continues and runs:
                runs[-1].append(item)
            else:
                runs.append([item])
        prev = item

    for run in reversed(runs):
        first = run[0]
        # snapshot fields before deletion mutates the arrays
        saved = [
            {
                "text": li.get("text", ""),
                "orig": li.get("orig", li.get("text", "")),
                "enumerated": li.get("enumerated", False),
                "marker": li.get("marker", ""),
                "prov": list(li.get("prov", [])),
                "content_layer": li.get("content_layer", L.LAYER_BODY),
                "formatting": li.get("formatting"),
                "hyperlink": li.get("hyperlink"),
            }
            for li in run
        ]
        parent = resolve(doc, first.get("parent") or "#/body")
        group = add_group(
            doc,
            L.GROUP_ORDERED_LIST if saved[0]["enumerated"] else L.GROUP_LIST,
            name="group",
            parent=parent,
        )
        parent["children"].remove(group["self_ref"])
        pos = parent["children"].index(first["self_ref"])
        parent["children"].insert(pos, group["self_ref"])
        group_ref = group["self_ref"]
        delete_items(doc, [li["self_ref"] for li in run])
        group = resolve(doc, group_ref)  # ref stable: groups array untouched
        for s in saved:
            item = {
                "kind": "texts",
                "label": L.LIST_ITEM,
                "text": s["text"],
                "orig": s["orig"],
                "enumerated": s["enumerated"],
                "marker": s["marker"],
                "prov": s["prov"][:1],
                "content_layer": s["content_layer"],
            }
            if s["formatting"]:
                item["formatting"] = s["formatting"]
            if s["hyperlink"]:
                item["hyperlink"] = s["hyperlink"]
            _attach(doc, "texts", item, group)
    return len(runs)


def _parent_is_list(doc: dict, item: dict) -> bool:
    parent = resolve(doc, item.get("parent") or "#/body")
    return bool(parent) and parent.get("label") in LIST_GROUP_LABELS


# ---------------------------------------------------------------------------
# Version / layer upgrades (document.py:1650-1664, 4261-4277)
# ---------------------------------------------------------------------------

def check_version_compatible(version: str) -> bool:
    try:
        major, minor = version.split(".")[:2]
        cur_major, cur_minor = CURRENT_VERSION.split(".")[:2]
        return major == cur_major and int(minor) <= int(cur_minor)
    except (ValueError, AttributeError):
        return False


def upgrade_content_layer(doc: dict) -> None:
    """v1.0.0 docs: move page headers/footers to furniture layer."""
    if doc.get("version") == "1.0.0":
        for t in doc["texts"]:
            if t.get("label") in (L.PAGE_HEADER, L.PAGE_FOOTER):
                t["content_layer"] = L.LAYER_FURNITURE
        doc["version"] = CURRENT_VERSION
