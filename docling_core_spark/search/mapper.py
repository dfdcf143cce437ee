"""JSON Schema -> search-index (Lucene/ES) mapping generator.

Semantic mirror of `JsonSchemaToSearchMapper`
(docling_core/search/json_schema_to_search_mapper.py:91-382): the same
transformation pipeline — suppress marked fields, inline $refs, merge
anyOf/allOf/oneOf unions (dropping nulls), clean types (tuples ->
first item, object removed, string->text / number->double /
date-time->date), collapse arrays onto their item schema, strip
JSON-Schema-only keys (never inside `properties` names), translate
`x-es-*` passthrough keys, prune empties — over a plain JSON Schema
dict. The reference depends on `jsonref` for ref inlining (absent in
this sandbox, so the reference class cannot even import here); the
engine ships its own resolver for intra-document `#/...` refs with
cycle detection. Parity is pinned against the reference's OWN golden
index definitions (test/data/json_schemas/*-ref.json).
"""

from __future__ import annotations

import re
from copy import deepcopy
from typing import Any, Optional, Tuple

_RM_KEYS = (
    "description", "required", "title", "additionalProperties", "format",
    "enum", "pattern", "$comment", "default", "minItems", "maxItems",
    "minimum", "maximum", "minLength", "maxLength", "exclusiveMinimum",
    "exclusiveMaximum", "$defs", "const",
)

_SUPPRESS_KEY = "x-es-suppress"
_ES_FLAG_RE = re.compile(r"^(?:x-es-)(.*)")

_TYPE_FORMAT_MAPPINGS = {("string", "date-time"): "date"}
_TYPE_MAPPINGS = {"number": "double", "string": "text"}
_TYPES_TO_REMOVE = ("object",)

DEFAULT_SETTINGS = {
    "analysis": {
        "normalizer": {
            "lowercase_asciifolding": {
                "type": "custom",
                "filter": ["lowercase", "asciifolding"],
            }
        }
    }
}


def _resolve_pointer(root: dict, pointer: str) -> Any:
    """Resolve an intra-document JSON pointer like #/$defs/Foo."""
    if not pointer.startswith("#/"):
        raise ValueError(f"unsupported $ref: {pointer}")
    node: Any = root
    for part in pointer[2:].split("/"):
        part = part.replace("~1", "/").replace("~0", "~")
        node = node[part]
    return node


def replace_refs(schema: dict) -> dict:
    """Inline every intra-document $ref (jsonref.replace_refs analog).

    A dict containing `$ref` is replaced entirely by the resolved
    target (jsonref's default non-merge semantics). Cyclic refs raise —
    a cyclic schema has no finite index mapping.
    """

    def _inline(node: Any, stack: Tuple[str, ...]) -> Any:
        if isinstance(node, list):
            return [_inline(v, stack) for v in node]
        if isinstance(node, dict):
            ref = node.get("$ref")
            if isinstance(ref, str) and ref.startswith("#/"):
                if ref in stack:
                    raise ValueError(f"cyclic $ref: {ref}")
                target = _resolve_pointer(schema, ref)
                return _inline(target, stack + (ref,))
            return {k: _inline(v, stack) for k, v in node.items()}
        return node

    return _inline(schema, ())


def _suppress(doc: Any) -> Any:
    if isinstance(doc, list):
        return [_suppress(v) for v in doc]
    if isinstance(doc, dict):
        if doc.get(_SUPPRESS_KEY) is True:
            return {}
        return {k: _suppress(v) for k, v in doc.items()}
    return doc


def _merge_unions(doc: Any) -> Any:
    if isinstance(doc, list):
        return [_merge_unions(v) for v in doc]
    if isinstance(doc, dict):
        union: list = []
        merged: dict = {}
        for k, v in doc.items():
            if k in ("oneOf", "allOf", "anyOf"):
                union.extend(v)
            else:
                merged[k] = v
        if not union:
            return {k: _merge_unions(v) for k, v in doc.items()}
        for u in union:
            if not isinstance(u, dict):
                continue
            for k, v in u.items():
                if k == "type" and v == "null":
                    continue
                elif not isinstance(v, dict) or k not in merged:
                    merged[k] = _merge_unions(v)
                elif isinstance(v, dict) and k in merged:
                    merged[k] = _merge_unions({**merged[k], **v})
        return merged
    return doc


def _clean_types(doc: Any) -> Any:
    if isinstance(doc, list):
        return [_clean_types(v) for v in doc]
    if isinstance(doc, dict):
        if isinstance(doc.get("type"), str):
            t = doc["type"]
            if t == "array" and isinstance(doc.get("items"), list):
                doc["items"] = doc["items"][0] if doc["items"] else {}
            if t in _TYPES_TO_REMOVE:
                doc.pop("type", None)
            f = doc.get("format", "")
            if (t, f) in _TYPE_FORMAT_MAPPINGS:
                doc["type"] = _TYPE_FORMAT_MAPPINGS[(t, f)]
                doc.pop("format", None)
            elif t in _TYPE_MAPPINGS:
                doc["type"] = _TYPE_MAPPINGS[t]
        return {k: _clean_types(v) for k, v in doc.items()}
    return doc


def _collapse_arrays(doc: Any) -> Any:
    if isinstance(doc, list):
        return [_collapse_arrays(v) for v in doc]
    if isinstance(doc, dict):
        if doc.get("type") == "array" and "items" in doc:
            collapsed = _collapse_arrays(doc["items"])
            d = deepcopy(doc)
            d.pop("items", None)
            d.pop("type", None)
            return {**d, **collapsed}
        return {k: _collapse_arrays(v) for k, v in doc.items()}
    return doc


def _remove_keys(doc: Any, keys: Tuple[str, ...]) -> Any:
    if isinstance(doc, list):
        return [_remove_keys(v, keys) for v in doc]
    if isinstance(doc, dict):
        result = {}
        for k, v in doc.items():
            if k == "properties" and isinstance(v, dict):
                # property NAMES may shadow removable keys
                result[k] = {pk: _remove_keys(pv, keys) for pk, pv in v.items()}
            elif k not in keys:
                result[k] = _remove_keys(v, keys)
        return result
    return doc


def _translate_keys(doc: Any) -> Any:
    if isinstance(doc, list):
        return [_translate_keys(v) for v in doc]
    if isinstance(doc, dict):
        out = {k: _translate_keys(v) for k, v in doc.items()}
        for k in list(out.keys()):
            k2 = _ES_FLAG_RE.sub(r"\1", k)
            if k2 != k:
                out[k2] = out.pop(k)
        return out
    return doc


def _prune_empty(doc: Any) -> Any:
    def empty(x) -> bool:
        return x is None or x == {} or x == [] or x == ""

    if isinstance(doc, list):
        return [v for v in (_prune_empty(v) for v in doc) if not empty(v)]
    if isinstance(doc, dict):
        return {
            k: v
            for k, v in ((k, _prune_empty(v)) for k, v in doc.items())
            if not empty(v)
        }
    return doc


def get_index_definition(
    schema: dict,
    settings_extra: Optional[dict] = None,
    mappings_extra: Optional[dict] = None,
) -> dict:
    """JSON Schema -> {settings, mappings} search index definition."""
    mapping = deepcopy(schema)
    mapping = _suppress(mapping)
    mapping = replace_refs(mapping)
    mapping = _merge_unions(mapping)
    mapping = _clean_types(mapping)
    mapping = _collapse_arrays(mapping)
    mapping = _remove_keys(mapping, _RM_KEYS)
    mapping = _translate_keys(mapping)
    mapping = _prune_empty(mapping)
    mapping.pop("definitions", None)
    result = {"settings": deepcopy(DEFAULT_SETTINGS), "mappings": mapping}
    if mappings_extra:
        result["mappings"] = {**result["mappings"], **mappings_extra}
    if settings_extra:
        result["settings"] = {**result["settings"], **settings_extra}
    return result
