"""Record / QA / Generic document schemas + distributed validation.

Parity target: the reference's passive Pydantic schema types
(types/rec/record.py:57-95, types/rec/attribute.py:25-55,
types/rec/predicate.py:29-133, types/rec/subject.py:26-77,
types/rec/statement.py:58-77, types/nlp/qa.py:16-74,
types/gen/generic.py:17-33, types/base.py:70-260) and their
accept/reject behavior on the reference's own fixtures
(test/data/rec/*.json, test/data/nlp/*.json, test_rec_schema.py,
test_nlp_qa.py, test_collection.py).

The engine declares each type as a draft-2020-12 JSON schema (same
single-source-of-truth style as model/schema_gen.py) and validates
payloads distributed: jsonschema structural checks plus the small set
of cross-field rules the reference implements as Pydantic
field_validators (Identifier's lowercase `type#value` name rule,
types/base.py:131-144; the geopoint bounds live in the schema itself
as prefixItems ranges). Failures come back as DATA (doc_id, valid,
message), never exceptions — the engine's validation philosophy
(SURVEY.md §1.5).

Strictness note: Pydantic v2's JSON-mode strict scalars map exactly to
JSON-schema types (StrictStr -> string, StrictBool -> boolean,
StrictFloat -> number since JSON-mode strict float admits ints), so no
Python-type shims are needed.

100 TB story: schemas are constants compiled once per Arrow batch;
validation is one zero-shuffle mapInPandas stage over a pruned
(id, payload) projection — identical shape to the DoclingDocument
validation track (model/schema_validate.py).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame

_SEMVER = (
    r"^(0|[1-9]\d*)\.(0|[1-9]\d*)\.(0|[1-9]\d*)"
    r"(?:-((?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)"
    r"(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*))?"
    r"(?:\+([0-9a-zA-Z-]+(?:\.[0-9a-zA-Z-]+)*))?$"
)
# ISO-8601 datetime (what the reference's StrictDateTime wrap-validator
# accepts in JSON mode: an ISO string, with optional fraction and zone)
_ISO_DT = (
    r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}"
    r"(?:\.\d+)?(?:[Zz]|[+-]\d{2}:?\d{2})?$"
)
_ACQUISITION_TYPES = [
    "API", "FTP", "Download", "Link", "Web scraping/Crawling", "Other",
]

_STR = {"type": "string"}
_BOOL = {"type": "boolean"}
_NUM = {"type": "number"}
_DT = {"type": "string", "pattern": _ISO_DT}
_CONF = {"type": "number", "minimum": 0.0, "maximum": 1.0}


def _ref(name: str) -> dict:
    return {"$ref": f"#/$defs/{name}"}


def _opt(alt: dict) -> dict:
    return {"anyOf": [alt, {"type": "null"}], "default": None}


def _arr(items: dict) -> dict:
    return {"type": "array", "items": items}


def _obj(
    props: dict, required: list, forbid_extra: bool = False
) -> dict:
    out = {"type": "object", "properties": props, "required": required}
    if forbid_extra:
        out["additionalProperties"] = False
    return out


def _defs() -> dict:
    """Shared $defs across every root type (reference types/base.py,
    types/rec/base.py, types/rec/predicate.py, types/nlp/qa_labels.py).
    """
    identifier = _obj(
        {
            "type": _STR,
            "value": _STR,
            "_name": {"type": "string", "pattern": r"^.+#.+$"},
        },
        ["type", "value", "_name"],
        forbid_extra=True,
    )
    log = _obj(
        {
            "task": _opt(_STR),
            "agent": _STR,
            "type": _STR,
            "comment": _opt(_STR),
            "date": _DT,
        },
        ["agent", "type", "date"],
        forbid_extra=True,
    )
    file_info = _obj(
        {
            "filename": _STR,
            "filename-prov": _opt(_STR),
            "document-hash": _STR,
        },
        ["filename", "document-hash"],
    )
    collection_record_info = _obj(
        {
            "name": _opt(_STR),
            "type": {"const": "Record"},
            "version": _opt({"type": "string", "pattern": _SEMVER}),
            "alias": _opt(_arr(_STR)),
        },
        ["type"],
        forbid_extra=True,
    )
    acquisition = _obj(
        {
            "type": {"enum": _ACQUISITION_TYPES},
            "date": _opt(_DT),
            "link": _opt(_STR),
            "size": _opt({"type": "integer", "minimum": 0}),
        },
        ["type"],
        forbid_extra=True,
    )
    prov_item = _obj(
        {
            "type": _opt(_STR),
            "text": _opt(_STR),
            "reference": _opt(_ref("Identifier")),
            "path": _opt(_STR),
            "span": _opt({
                "type": "array", "items": {"type": "integer"},
                "minItems": 2, "maxItems": 2,
            }),
        },
        [],
        forbid_extra=True,
    )
    numerical_value = _obj(
        {"min": _NUM, "max": _NUM, "val": _NUM, "err": _NUM,
         "unit": _STR},
        ["min", "max", "val", "err", "unit"],
        forbid_extra=True,
    )
    # geopoint bounds (reference predicate.py:74-83 field_validator)
    # expressed structurally: [longitude, latitude]
    coordinates = {
        "type": "array",
        "prefixItems": [
            {"type": "number", "minimum": -180.0, "maximum": 180.0},
            {"type": "number", "minimum": -90.0, "maximum": 90.0},
        ],
        "items": {"type": "number"},
        "minItems": 2,
        "maxItems": 2,
    }
    geopoint_value = _obj(
        {"value": coordinates, "conf": _opt(_CONF)},
        ["value"],
        forbid_extra=True,
    )
    # PredicateKey and PredicateValue share one structural shape
    # (name + type strings, extra forbidden; predicate.py:86-113)
    predicate_key = _obj(
        {"name": _STR, "type": _STR}, ["name", "type"], forbid_extra=True
    )
    predicate = _obj(
        {
            "key": _ref("PredicateKey"),
            "value": _ref("PredicateValue"),
            "numerical_value": _opt(_ref("NumericalValue")),
            "numerical_value_si": _opt(_ref("NumericalValue")),
            "nominal_value": _opt(_obj(
                {"value": _STR}, ["value"], forbid_extra=True)),
            "text_value": _opt(_obj(
                {"value": _STR}, ["value"], forbid_extra=True)),
            "boolean_value": _opt(_obj(
                {"value": _BOOL}, ["value"], forbid_extra=True)),
            "datetime_value": _opt(_obj(
                {"value": _DT}, ["value"], forbid_extra=True)),
            "geopoint_value": _opt(_ref("GeopointValue")),
        },
        ["key", "value"],
        forbid_extra=True,
    )
    attribute = _obj(
        {
            "conf": _CONF,
            "prov": _opt(_arr(_ref("ProvenanceItem"))),
            "predicates": _arr(_ref("Predicate")),
        },
        ["conf", "predicates"],
        forbid_extra=True,
    )
    s3_reference = _obj({"__ref_s3_data": _STR}, ["__ref_s3_data"])
    subject = _obj(
        {
            "display_name": _STR,
            "display_image": _opt(_ref("S3Reference")),
            "type": _STR,
            "names": _arr(_ref("Identifier")),
            "identifiers": _opt(_arr(_ref("Identifier"))),
            "labels": _opt(_arr(_STR)),
        },
        ["display_name", "type", "names"],
        forbid_extra=True,
    )
    # Statement = Attribute + subject, extra ALLOWED
    # (reference statement.py:58-77: `extra="allow"`)
    statement = _obj(
        {
            "conf": _CONF,
            "prov": _opt(_arr(_ref("ProvenanceItem"))),
            "predicates": _arr(_ref("Predicate")),
            "subject": _ref("Subject"),
        },
        ["conf", "predicates", "subject"],
    )
    record_description = _obj(
        {
            "logs": _arr(_ref("Log")),
            "publication_date": _opt(_DT),
            "collection": _opt(_ref("CollectionRecordInfo")),
            "acquisition": _opt(_ref("Acquisition")),
        },
        ["logs"],
    )
    qa_labelling = _obj(
        {
            "scope": _opt({"enum": [
                "corpus", "document", "out_of_scope"]}),
            "alignment": _opt({"enum": [
                "aligned", "tangential", "misaligned"]}),
            "correctness": _opt({"enum": [
                "entailed", "not_entailed"]}),
            "completeness": _opt({"enum": [
                "complete", "incomplete"]}),
            "information": _opt({"enum": [
                "fact_single", "fact_multi", "summary", "reasoning",
                "choice", "procedure", "opinion", "feedback"]}),
        },
        [],
        forbid_extra=True,
    )
    return {
        "Identifier": identifier,
        "Log": log,
        "FileInfoObject": file_info,
        "CollectionRecordInfo": collection_record_info,
        "Acquisition": acquisition,
        "ProvenanceItem": prov_item,
        "NumericalValue": numerical_value,
        "GeopointValue": geopoint_value,
        "PredicateKey": predicate_key,
        "PredicateValue": predicate_key,
        "Predicate": predicate,
        "Attribute": attribute,
        "S3Reference": s3_reference,
        "Subject": subject,
        "Statement": statement,
        "RecordDescription": record_description,
        "QALabelling": qa_labelling,
    }


def rec_schemas() -> dict:
    """Root schemas keyed by kind: predicate / attribute / subject /
    statement / record / qa_pair / generic."""
    defs = _defs()

    def root(body: dict) -> dict:
        out = dict(body)
        out["$defs"] = defs
        return out

    record = _obj(
        {
            "file-info": _ref("FileInfoObject"),
            "description": _ref("RecordDescription"),
            "subject": _ref("Subject"),
            "attributes": _opt(_arr(_ref("Attribute"))),
            "_name": _opt(_STR),
            "identifiers": _opt(_arr(_ref("Identifier"))),
            "conf": _CONF,
            "prov": _arr(_ref("ProvenanceItem")),
        },
        ["file-info", "description", "subject", "conf", "prov"],
    )
    qa_pair = _obj(
        {
            "context": _STR,
            "question": _STR,
            "answer": _STR,
            "short_answer": _opt(_STR),
            "retrieved_context": _opt(_BOOL),
            "generated_question": _opt(_BOOL),
            "generated_answer": _opt(_BOOL),
            "created": _DT,
            "user": _opt(_STR),
            "model": _opt(_STR),
            "paths": {
                "type": "array", "items": _STR, "uniqueItems": True,
            },
            "advanced": _opt({"type": "object"}),
            "labels": _opt(_ref("QALabelling")),
        },
        ["context", "question", "answer", "created", "paths"],
    )
    generic = _obj(
        {"_name": _opt(_STR), "file-info": _ref("FileInfoObject")},
        ["file-info"],
    )
    return {
        "predicate": root(_ref("Predicate")),
        "attribute": root(_ref("Attribute")),
        "subject": root(_ref("Subject")),
        "statement": root(_ref("Statement")),
        "record": root(record),
        "qa_pair": root(qa_pair),
        "generic": root(generic),
    }


# -- cross-field rules (reference Pydantic field_validators) ---------------

def _iter_identifiers(obj):
    """Yield every Identifier-shaped node: the schema only places
    Identifier at known paths (names/identifiers lists, prov
    references), all of which are dicts carrying exactly the three
    Identifier keys — a structural walk is exact here because
    Identifier forbids extra properties and every site that admits it
    has passed jsonschema first."""
    if isinstance(obj, dict):
        if set(obj.keys()) == {"type", "value", "_name"}:
            yield obj
        for v in obj.values():
            yield from _iter_identifiers(v)
    elif isinstance(obj, list):
        for v in obj:
            yield from _iter_identifiers(v)


def check_rules(obj) -> Tuple[bool, str]:
    """The reference's cross-field rules that JSON schema cannot carry:
    Identifier._name must equal `lower(type)#lower(value)`
    (types/base.py:131-144)."""
    for ident in _iter_identifiers(obj):
        t, v, n = ident["type"], ident["value"], ident["_name"]
        if not (
            isinstance(t, str) and isinstance(v, str)
            and isinstance(n, str)
        ):
            continue  # jsonschema already reported the type error
        if n != f"{t.lower()}#{v.lower()}":
            return (
                False,
                "the _name field must be the concatenation of type and"
                " value in lower case, separated by hash (#)",
            )
    return (True, "All good!")


def validate_typed(payload: str, kind: str, schema: Optional[dict] = None
                   ) -> Tuple[bool, str]:
    """Single-payload accept/reject with the engine's (valid, message)
    contract: first jsonschema error, then the cross-field rules."""
    import jsonschema

    sch = schema if schema is not None else rec_schemas()[kind]
    try:
        obj = json.loads(payload)
    except ValueError as err:
        return (False, f"invalid JSON: {err}")
    cls = jsonschema.validators.validator_for(sch)
    # first iter_errors error — the SAME first-error rule as the
    # distributed path, so local and Arrow-stage messages agree
    err = next(cls(sch).iter_errors(obj), None)
    if err is not None:
        return (False, err.message)
    return check_rules(obj)


def validate_typed_docs(
    docs: DataFrame, kind: str,
    id_col: str = "doc_id", json_col: str = "payload",
) -> DataFrame:
    """docs(id_col, json_col: JSON string) -> (doc_id, valid, message)
    for one of the rec_schemas() kinds. One zero-shuffle Arrow stage;
    the schema is a constant closure-captured with the task and the
    jsonschema validator compiles once per batch."""
    schema_blob = json.dumps(rec_schemas()[kind])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import jsonschema

        sch = json.loads(schema_blob)
        cls = jsonschema.validators.validator_for(sch)
        cls.check_schema(sch)
        validator = cls(sch)
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[json_col]):
                try:
                    obj = json.loads(payload)
                except ValueError as err:
                    out.append((doc_id, False, f"invalid JSON: {err}"))
                    continue
                err = next(validator.iter_errors(obj), None)
                if err is not None:
                    out.append((doc_id, False, err.message))
                    continue
                ok, msg = check_rules(obj)
                out.append((doc_id, ok, msg))
            yield pd.DataFrame(
                out, columns=["doc_id", "valid", "message"]
            )

    return docs.select(id_col, json_col).mapInPandas(
        gen, schema="doc_id string, valid boolean, message string"
    )
