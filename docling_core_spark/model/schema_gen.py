"""JSON-schema generation from the engine's own model declaration.

Parity target: the reference's schema-generation utility
(utils/generate_jsonschema.py:29-44 -> Pydantic `model_json_schema()`)
whose committed output is docs/DoclingDocument.json. The engine's
document model is plain dicts, so its schema lives here as one
declarative table (field names, types, refs, enums, required sets,
defaults) reusing the label vocabularies in `labels.py` — a single
source of truth the generator renders to a draft-2020-12-style schema.

`generate_docling_schema()` is structurally parity-checked against the
reference's generated schema in tests/test_schema_gen.py: same $defs
set, and per definition the same property names, required sets,
additionalProperties, $ref targets, enum vocabularies and const
discriminators. (Pydantic's prose — titles, descriptions, pattern
details — is not byte-replicated; the semantic structure is.)

The generated schema is also valid input for the search-index mapper
(search/mapper.py), mirroring the reference's schema->Elasticsearch
pipeline.
"""

from __future__ import annotations

from typing import Optional

from . import labels as L

CURRENT_VERSION = "1.4.0"

_JSON_POINTER_PATTERN = r"^#(?:/([\w-]+)(?:/(\d+))?)?$"
_SEMVER_PATTERN = (
    r"^(?P<major>0|[1-9]\d*)\.(?P<minor>0|[1-9]\d*)\.(?P<patch>0|[1-9]\d*)"
    r"(?:-(?P<prerelease>(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)"
    r"(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*))?"
    r"(?:\+(?P<buildmetadata>[0-9a-zA-Z-]+(?:\.[0-9a-zA-Z-]+)*))?$"
)


# -- schema fragment helpers ------------------------------------------------

def _ref(name: str) -> dict:
    return {"$ref": f"#/$defs/{name}"}


def _ref_d(name: str, default) -> dict:
    return {"$ref": f"#/$defs/{name}", "default": default}


def _opt(*alts: dict) -> dict:
    return {"anyOf": [*alts, {"type": "null"}], "default": None}


def _arr(items: dict, default: Optional[list] = None) -> dict:
    out = {"type": "array", "items": items}
    if default is not None:
        out["default"] = default
    return out


def _str(**kw) -> dict:
    return {"type": "string", **kw}


def _int(**kw) -> dict:
    return {"type": "integer", **kw}


def _num(**kw) -> dict:
    return {"type": "number", **kw}


def _bool(default: bool) -> dict:
    return {"type": "boolean", "default": default}


def _const(value: str) -> dict:
    return {"type": "string", "const": value, "default": value}


def _enum(values, **kw) -> dict:
    return {"type": "string", "enum": list(values), **kw}


_URI_STR = _str(format="uri", minLength=1)
_PATH_STR = _str(format="path")


# -- shared property groups (the NodeItem / DocItem / FloatingItem
#    layers of the reference hierarchy, SURVEY.md §1.2) ---------------------

def _node_props() -> dict:
    return {
        "self_ref": _str(pattern=_JSON_POINTER_PATTERN),
        "parent": _opt(_ref("RefItem")),
        "children": _arr(_ref("RefItem"), default=[]),
        "content_layer": _ref_d("ContentLayer", L.LAYER_BODY),
    }


def _group_props(label: dict) -> dict:
    return {**_node_props(), "name": _str(default="group"), "label": label}


def _doc_item_props(label: dict) -> dict:
    return {
        **_node_props(),
        "label": label,
        "prov": _arr(_ref("ProvenanceItem"), default=[]),
    }


def _text_props(label: dict) -> dict:
    return {
        **_doc_item_props(label),
        "orig": _str(),
        "text": _str(),
        "formatting": _opt(_ref("Formatting")),
        "hyperlink": _opt(_URI_STR, _PATH_STR),
    }


def _floating_props(label: dict) -> dict:
    return {
        **_doc_item_props(label),
        "captions": _arr(_ref("RefItem"), default=[]),
        "references": _arr(_ref("RefItem"), default=[]),
        "footnotes": _arr(_ref("RefItem"), default=[]),
        "image": _opt(_ref("ImageRef")),
    }


def _strict(required: list, props: dict) -> dict:
    # NodeItem subclasses forbid extras (document.py:641)
    out = {"type": "object", "additionalProperties": False,
           "properties": props}
    if required:
        out["required"] = required
    return out


def _open(required: list, props: dict) -> dict:
    out = {"type": "object", "properties": props}
    if required:
        out["required"] = required
    return out


_TEXT_REQ = ["self_ref", "orig", "text"]

_PIC_ANNOTATION_KINDS = {
    "classification": "PictureClassificationData",
    "description": "DescriptionAnnotation",
    "misc": "MiscAnnotation",
    "molecule_data": "PictureMoleculeData",
    "bar_chart_data": "PictureBarChartData",
    "line_chart_data": "PictureLineChartData",
    "pie_chart_data": "PicturePieChartData",
    "scatter_chart_data": "PictureScatterChartData",
    "stacked_bar_chart_data": "PictureStackedBarChartData",
    "tabular_chart_data": "PictureTabularChartData",
}


def _discriminated(kinds: dict) -> dict:
    return {
        "discriminator": {
            "mapping": {k: f"#/$defs/{v}" for k, v in sorted(kinds.items())},
            "propertyName": "kind",
        },
        "oneOf": [_ref(v) for v in kinds.values()],
    }


def _chart_data(kind: str, series_field: str, series: dict,
                axes: bool = True) -> dict:
    props = {"kind": _const(kind), "title": _str()}
    req = ["title"]
    if axes:
        props["x_axis_label"] = _str()
        props["y_axis_label"] = _str()
        req += ["x_axis_label", "y_axis_label"]
    props[series_field] = series
    return _open(req + [series_field], props)


def _defs() -> dict:
    point2d = _arr({}, None)  # free-form numeric pair
    return {
        # geometry & provenance (§1.3)
        "CoordOrigin": _enum([L.COORD_TOPLEFT, L.COORD_BOTTOMLEFT]),
        "BoundingBox": _open(
            ["l", "t", "r", "b"],
            {
                "l": _num(), "t": _num(), "r": _num(), "b": _num(),
                "coord_origin": _ref_d("CoordOrigin", L.COORD_TOPLEFT),
            },
        ),
        "Size": _open([], {"width": _num(default=0.0),
                           "height": _num(default=0.0)}),
        "ProvenanceItem": _open(
            ["page_no", "bbox", "charspan"],
            {
                "page_no": _int(),
                "bbox": _ref("BoundingBox"),
                "charspan": {"type": "array", "items": _int(),
                             "minItems": 2, "maxItems": 2},
            },
        ),
        "RefItem": _open(
            ["$ref"], {"$ref": _str(pattern=_JSON_POINTER_PATTERN)}
        ),
        "ImageRef": _open(
            ["mimetype", "dpi", "size", "uri"],
            {
                "mimetype": _str(),
                "dpi": _int(),
                "size": _ref("Size"),
                "uri": {"anyOf": [_URI_STR, _PATH_STR]},
            },
        ),
        "DocumentOrigin": _open(
            ["mimetype", "binary_hash", "filename"],
            {
                "mimetype": _str(),
                "binary_hash": _int(),
                "filename": _str(),
                "uri": _opt(_URI_STR),
            },
        ),
        "PageItem": _open(
            ["size", "page_no"],
            {
                "size": _ref("Size"),
                "image": _opt(_ref("ImageRef")),
                "page_no": _int(),
            },
        ),
        # enums (labels.py)
        "ContentLayer": _enum(
            [L.LAYER_BODY, L.LAYER_FURNITURE, L.LAYER_BACKGROUND]
        ),
        "GroupLabel": _enum(L.GROUP_LABELS_ORDERED),
        "CodeLanguageLabel": _enum(L.CODE_LANGUAGES),
        "GraphCellLabel": _enum(
            ["unspecified", L.GRAPH_CELL_KEY, L.GRAPH_CELL_VALUE,
             L.GRAPH_CELL_CHECKBOX]
        ),
        "GraphLinkLabel": _enum(
            ["unspecified", L.GRAPH_LINK_TO_VALUE, L.GRAPH_LINK_TO_KEY,
             L.GRAPH_LINK_TO_PARENT, L.GRAPH_LINK_TO_CHILD]
        ),
        "Script": _enum(L.SCRIPT_VALUES),
        "Formatting": _open(
            [],
            {
                "bold": _bool(False),
                "italic": _bool(False),
                "underline": _bool(False),
                "strikethrough": _bool(False),
                "script": _ref_d("Script", "baseline"),
            },
        ),
        # groups (§1.2)
        "GroupItem": _strict(
            ["self_ref"],
            _group_props(_ref_d("GroupLabel", L.GROUP_UNSPECIFIED)),
        ),
        "OrderedList": _strict(
            ["self_ref"], _group_props(_const(L.GROUP_ORDERED_LIST))
        ),
        "UnorderedList": _strict(
            ["self_ref"], _group_props(_const(L.GROUP_LIST))
        ),
        "InlineGroup": _strict(
            ["self_ref"], _group_props(_const(L.GROUP_INLINE))
        ),
        # text items
        "TextItem": _strict(
            ["self_ref", "label", "orig", "text"],
            _text_props(_enum(L.TEXT_ITEM_LABELS)),
        ),
        "TitleItem": _strict(_TEXT_REQ, _text_props(_const(L.TITLE))),
        "SectionHeaderItem": _strict(
            _TEXT_REQ,
            {
                **_text_props(_const(L.SECTION_HEADER)),
                "level": _int(default=1, minimum=1, maximum=100),
            },
        ),
        "ListItem": _strict(
            _TEXT_REQ,
            {
                **_text_props(_const(L.LIST_ITEM)),
                "enumerated": _bool(False),
                "marker": _str(default="-"),
            },
        ),
        "FormulaItem": _strict(_TEXT_REQ, _text_props(_const(L.FORMULA))),
        # CodeItem is both TextItem- and FloatingItem-shaped
        # (document.py:1017: captions/references/footnotes/image)
        "CodeItem": _strict(
            _TEXT_REQ,
            {
                **_text_props(_const(L.CODE)),
                "captions": _arr(_ref("RefItem"), default=[]),
                "references": _arr(_ref("RefItem"), default=[]),
                "footnotes": _arr(_ref("RefItem"), default=[]),
                "image": _opt(_ref("ImageRef")),
                "code_language": _ref_d("CodeLanguageLabel", "unknown"),
            },
        ),
        # floating items
        "PictureItem": _strict(
            ["self_ref"],
            {
                **_floating_props(_enum([L.PICTURE, L.CHART],
                                        default=L.PICTURE)),
                "annotations": _arr(
                    _discriminated(_PIC_ANNOTATION_KINDS), default=[]
                ),
            },
        ),
        "TableItem": _strict(
            ["self_ref", "data"],
            {
                **_floating_props(_enum([L.DOCUMENT_INDEX, L.TABLE],
                                        default=L.TABLE)),
                "data": _ref("TableData"),
                "annotations": _arr(
                    _discriminated(
                        {k: v for k, v in _PIC_ANNOTATION_KINDS.items()
                         if k in ("description", "misc")}
                    ),
                    default=[],
                ),
            },
        ),
        "KeyValueItem": _strict(
            ["self_ref", "graph"],
            {**_floating_props(_const(L.KEY_VALUE_REGION)),
             "graph": _ref("GraphData")},
        ),
        "FormItem": _strict(
            ["self_ref", "graph"],
            {**_floating_props(_const(L.FORM)), "graph": _ref("GraphData")},
        ),
        # table & graph sub-models (§1.4)
        "TableCell": _open(
            ["start_row_offset_idx", "end_row_offset_idx",
             "start_col_offset_idx", "end_col_offset_idx", "text"],
            {
                "bbox": _opt(_ref("BoundingBox")),
                "row_span": _int(default=1),
                "col_span": _int(default=1),
                "start_row_offset_idx": _int(),
                "end_row_offset_idx": _int(),
                "start_col_offset_idx": _int(),
                "end_col_offset_idx": _int(),
                "text": _str(),
                "column_header": _bool(False),
                "row_header": _bool(False),
                "row_section": _bool(False),
            },
        ),
        "TableData": _open(
            [],
            {
                "table_cells": _arr(_ref("TableCell"), default=[]),
                "num_rows": _int(default=0),
                "num_cols": _int(default=0),
            },
        ),
        "GraphCell": _open(
            ["label", "cell_id", "text", "orig"],
            {
                "label": _ref("GraphCellLabel"),
                "cell_id": _int(),
                "text": _str(),
                "orig": _str(),
                "prov": _opt(_ref("ProvenanceItem")),
                "item_ref": _opt(_ref("RefItem")),
            },
        ),
        "GraphLink": _open(
            ["label", "source_cell_id", "target_cell_id"],
            {
                "label": _ref("GraphLinkLabel"),
                "source_cell_id": _int(),
                "target_cell_id": _int(),
            },
        ),
        "GraphData": _open(
            [],
            {
                "cells": _arr(_ref("GraphCell")),
                "links": _arr(_ref("GraphLink")),
            },
        ),
        # picture annotations
        "PictureClassificationClass": _open(
            ["class_name", "confidence"],
            {"class_name": _str(), "confidence": _num()},
        ),
        "PictureClassificationData": _open(
            ["provenance", "predicted_classes"],
            {
                "kind": _const("classification"),
                "provenance": _str(),
                "predicted_classes": _arr(
                    _ref("PictureClassificationClass")
                ),
            },
        ),
        "DescriptionAnnotation": _open(
            ["text", "provenance"],
            {"kind": _const("description"), "text": _str(),
             "provenance": _str()},
        ),
        "MiscAnnotation": _open(
            ["content"],
            {"kind": _const("misc"),
             "content": {"type": "object", "additionalProperties": True}},
        ),
        "PictureMoleculeData": _open(
            ["smi", "confidence", "class_name", "segmentation",
             "provenance"],
            {
                "kind": _const("molecule_data"),
                "smi": _str(),
                "confidence": _num(),
                "class_name": _str(),
                "segmentation": _arr(point2d),
                "provenance": _str(),
            },
        ),
        # chart payloads
        "ChartBar": _open(["label", "values"],
                          {"label": _str(), "values": _num()}),
        "ChartLine": _open(["label", "values"],
                           {"label": _str(), "values": _arr(point2d)}),
        "ChartSlice": _open(["label", "value"],
                            {"label": _str(), "value": _num()}),
        "ChartPoint": _open(["value"], {"value": point2d}),
        "ChartStackedBar": _open(
            ["label", "values"],
            {"label": _arr(_str()), "values": _arr(point2d)},
        ),
        "PictureBarChartData": _chart_data(
            "bar_chart_data", "bars", _arr(_ref("ChartBar"))
        ),
        "PictureLineChartData": _chart_data(
            "line_chart_data", "lines", _arr(_ref("ChartLine"))
        ),
        "PicturePieChartData": _chart_data(
            "pie_chart_data", "slices", _arr(_ref("ChartSlice")),
            axes=False,
        ),
        "PictureScatterChartData": _chart_data(
            "scatter_chart_data", "points", _arr(_ref("ChartPoint"))
        ),
        "PictureStackedBarChartData": _chart_data(
            "stacked_bar_chart_data", "stacked_bars",
            _arr(_ref("ChartStackedBar")),
        ),
        "PictureTabularChartData": _open(
            ["title", "chart_data"],
            {
                "kind": _const("tabular_chart_data"),
                "title": _str(),
                "chart_data": _ref("TableData"),
            },
        ),
    }


_ROOT_GROUP_DEFAULT = {
    "self_ref": None, "parent": None, "children": [],
    "content_layer": None, "name": "_root_",
    "label": L.GROUP_UNSPECIFIED,
}


def generate_docling_schema() -> dict:
    """The DoclingDocument JSON schema from the declarative tables
    above (reference: docs/DoclingDocument.json, generated by
    utils/generate_jsonschema.py)."""
    content_union = {
        "anyOf": [_ref(n) for n in (
            "TitleItem", "SectionHeaderItem", "ListItem", "CodeItem",
            "FormulaItem", "TextItem",
        )]
    }
    group_union = {
        "anyOf": [_ref(n) for n in (
            "OrderedList", "UnorderedList", "InlineGroup", "GroupItem",
        )]
    }
    return {
        "title": "DoclingDocument",
        "description": "DoclingDocument.",
        "type": "object",
        "required": ["name"],
        "$defs": _defs(),
        "properties": {
            "schema_name": _const("DoclingDocument"),
            "version": _str(default=CURRENT_VERSION,
                            pattern=_SEMVER_PATTERN),
            "name": _str(),
            "origin": _opt(_ref("DocumentOrigin")),
            "furniture": {
                "$ref": "#/$defs/GroupItem",
                "default": {**_ROOT_GROUP_DEFAULT,
                            "self_ref": "#/furniture",
                            "content_layer": L.LAYER_FURNITURE},
                "deprecated": True,
            },
            "body": {
                "$ref": "#/$defs/GroupItem",
                "default": {**_ROOT_GROUP_DEFAULT, "self_ref": "#/body",
                            "content_layer": L.LAYER_BODY},
            },
            "groups": _arr(group_union, default=[]),
            "texts": _arr(content_union, default=[]),
            "pictures": _arr(_ref("PictureItem"), default=[]),
            "tables": _arr(_ref("TableItem"), default=[]),
            "key_value_items": _arr(_ref("KeyValueItem"), default=[]),
            "form_items": _arr(_ref("FormItem"), default=[]),
            "pages": {
                "type": "object",
                "additionalProperties": _ref("PageItem"),
                "default": {},
            },
        },
    }


# ---------------------------------------------------------------------------
# Database-track schema types: Record / Generic / QAPair
#
# Parity targets: types/rec/record.py:57-95 (Record + RecordDescription
# over the rec submodels attribute.py/predicate.py/subject.py/base.py),
# types/gen/generic.py:17-33 (Generic), types/nlp/qa.py:16-74 (QAPair +
# qa_labels.py QALabelling) — the reference's Elasticsearch-track
# document schemas. Declared here in the same declarative-table style
# and structurally parity-checked against the reference's own
# model_json_schema() output in tests/test_db_schemas.py; the engine's
# search-index mapper consumes these natively.
# ---------------------------------------------------------------------------

_CONF = _num(minimum=0.0, maximum=1.0)


def _identifier_props() -> dict:
    return {
        "type": _str(),
        "value": _str(),
        "_name": _str(pattern=r"^.+#.+$"),
    }


def _rec_defs() -> dict:
    """$defs for the Record schema (rec/{base,attribute,predicate,
    subject}.py + the shared types/base.py objects)."""
    return {
        "Identifier": _strict(
            ["type", "value", "_name"], _identifier_props()
        ),
        # SubjectNameIdentifier is Identifier re-instantiated with the
        # subject-name type var (subject.py) — same structure
        "SubjectNameIdentifier": _strict(
            ["type", "value", "_name"], _identifier_props()
        ),
        "Log": _strict(
            ["agent", "type", "date"],
            {
                "task": _opt(_str()),
                "agent": _str(),
                "type": _str(),
                "comment": _opt(_str()),
                "date": _str(format="date-time"),
            },
        ),
        "FileInfoObject": _open(
            ["filename", "document-hash"],
            {
                "filename": _str(),
                "filename-prov": _opt(_str()),
                "document-hash": _str(),
            },
        ),
        "Acquisition": _strict(
            ["type"],
            {
                "type": _enum([
                    "API", "FTP", "Download", "Link",
                    "Web scraping/Crawling", "Other",
                ]),
                "date": _opt(_str(format="date-time")),
                "link": _opt(_str(format="uri", minLength=1)),
                "size": _opt(_int(minimum=0)),
            },
        ),
        "CollectionRecordInfo": _strict(
            ["type"],
            {
                "name": _opt(_str()),
                "type": _const("Record"),
                "version": _opt(_str(pattern=_SEMVER_PATTERN)),
                "alias": _opt(_arr(_str())),
            },
        ),
        "RecordDescription": _open(
            ["logs"],
            {
                "logs": _arr(_ref("Log")),
                "publication_date": _opt(_str(format="date-time")),
                "collection": _opt(_ref("CollectionRecordInfo")),
                "acquisition": _opt(_ref("Acquisition")),
            },
        ),
        "ProvenanceItem": _strict(
            [],
            {
                "type": _opt(_str()),
                "text": _opt(_str()),
                "reference": _opt(_ref("Identifier")),
                "path": _opt(_str()),
                "span": _opt(_arr(_int()) | {"minItems": 2,
                                             "maxItems": 2}),
            },
        ),
        "S3Reference": _open(
            ["__ref_s3_data"], {"__ref_s3_data": _str()}
        ),
        "Subject": _strict(
            ["display_name", "type", "names"],
            {
                "display_name": _str(),
                "display_image": _opt(_ref("S3Reference")),
                "type": _str(),
                "names": _arr(_ref("SubjectNameIdentifier")),
                "identifiers": _opt(_arr(_ref("Identifier"))),
                "labels": _opt(_arr(_str())),
            },
        ),
        # Predicate value spaces (rec/predicate.py)
        "NumericalValue": _strict(
            ["min", "max", "val", "err", "unit"],
            {
                "min": _num(), "max": _num(), "val": _num(),
                "err": _num(), "unit": _str(),
            },
        ),
        "NominalValue": _strict(["value"], {"value": _str()}),
        "TextValue": _strict(["value"], {"value": _str()}),
        "BooleanValue": _strict(
            ["value"], {"value": {"type": "boolean"}}
        ),
        "DatetimeValue": _strict(
            ["value"], {"value": _str(format="date-time")}
        ),
        "GeopointValue": _strict(
            ["value"],
            {
                "value": _arr(_num()) | {"minItems": 2, "maxItems": 2},
                "conf": _opt(_CONF),
            },
        ),
        "PredicateKey": _strict(
            ["name", "type"], {"name": _str(), "type": _str()}
        ),
        "PredicateValue": _strict(
            ["name", "type"], {"name": _str(), "type": _str()}
        ),
        "Predicate": _strict(
            ["key", "value"],
            {
                "key": _ref("PredicateKey"),
                "value": _ref("PredicateValue"),
                "numerical_value": _opt(_ref("NumericalValue")),
                "numerical_value_si": _opt(_ref("NumericalValue")),
                "nominal_value": _opt(_ref("NominalValue")),
                "text_value": _opt(_ref("TextValue")),
                "boolean_value": _opt(_ref("BooleanValue")),
                "datetime_value": _opt(_ref("DatetimeValue")),
                "geopoint_value": _opt(_ref("GeopointValue")),
            },
        ),
        "Attribute": _strict(
            ["conf", "predicates"],
            {
                "conf": _CONF,
                "prov": _opt(_arr(_ref("ProvenanceItem"))),
                "predicates": _arr(_ref("Predicate")),
            },
        ),
    }


def generate_record_schema() -> dict:
    """Record: a structured database record with provenance, subject,
    and typed attribute predicates (rec/record.py:57-95)."""
    return {
        "title": "Record",
        "description": (
            "A representation of a structured record in an database."
        ),
        "type": "object",
        "required": ["conf", "prov", "file-info", "description",
                     "subject"],
        "$defs": _rec_defs(),
        "properties": {
            "conf": _CONF,
            "prov": _arr(_ref("ProvenanceItem")),
            "file-info": _ref("FileInfoObject"),
            "description": _ref("RecordDescription"),
            "subject": _ref("Subject"),
            "attributes": _opt(_arr(_ref("Attribute"))),
            "_name": _opt(_str()),
            "identifiers": _opt(_arr(_ref("Identifier"))),
        },
    }


def generate_generic_schema() -> dict:
    """Generic: minimal document identification (gen/generic.py)."""
    return {
        "title": "Generic",
        "description": "A representation of a generic document.",
        "type": "object",
        "required": ["file-info"],
        "$defs": {
            "FileInfoObject": _rec_defs()["FileInfoObject"],
        },
        "properties": {
            "_name": _opt(_str()),
            "file-info": _ref("FileInfoObject"),
        },
    }


_QA_LABEL_AXES = {
    "scope": ["corpus", "document", "out_of_scope"],
    "alignment": ["aligned", "tangential", "misaligned"],
    "correctness": ["entailed", "not_entailed"],
    "completeness": ["complete", "incomplete"],
    "information": [
        "fact_single", "fact_multi", "summary", "reasoning", "choice",
        "procedure", "opinion", "feedback",
    ],
}


def generate_qa_schema() -> dict:
    """QAPair: a question-answering pair with provenance paths and
    labelling axes (nlp/qa.py:16-74, nlp/qa_labels.py)."""
    return {
        "title": "QAPair",
        "description": (
            "A representation of a question-answering (QA) pair."
        ),
        "type": "object",
        "required": ["context", "question", "answer", "created",
                     "paths"],
        "$defs": {
            # the `advanced` slot is an unparameterized metadata model
            "BaseModel": {
                "title": "BaseModel", "type": "object", "properties": {},
            },
            "QALabelling": _strict(
                [],
                {
                    axis: _opt(_enum(values))
                    for axis, values in _QA_LABEL_AXES.items()
                },
            ),
        },
        "properties": {
            "context": _str(),
            "question": _str(),
            "answer": _str(),
            "short_answer": _opt(_str()),
            "retrieved_context": {
                "anyOf": [{"type": "boolean"}, {"type": "null"}],
                "default": False,
            },
            "generated_question": {
                "anyOf": [{"type": "boolean"}, {"type": "null"}],
                "default": False,
            },
            "generated_answer": {
                "anyOf": [{"type": "boolean"}, {"type": "null"}],
                "default": False,
            },
            "created": _str(format="date-time"),
            "user": _opt(_str()),
            "model": _opt(_str()),
            "paths": _arr(_str()) | {"uniqueItems": True},
            "advanced": _opt(_ref("BaseModel")),
            "labels": _opt(_ref("QALabelling")),
        },
    }


if __name__ == "__main__":  # the reference ships this as a CLI utility
    import json as _json
    import sys as _sys

    _json.dump(generate_docling_schema(), _sys.stdout, indent=2)
    _sys.stdout.write("\n")
