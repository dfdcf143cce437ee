"""JSON-schema validation track (reference utils/validators.py:21-74,
utils/validate.py parity).

The reference validates legacy RAW/ANN/OCR payloads against the schema
JSON artifacts it packages under `resources/schemas/`; the engine keeps
the operator schema-parameterized (the schema artifact belongs to the
format's spec, supplied by the caller) and returns the same
`(valid, message)` contract — first jsonschema error message, or
"All good!".

Distributed form: the schema broadcasts once per job; validation runs
as an Arrow-batched stage and failures come back as DATA (doc_id,
valid, message) for metrics/quarantine — never as exceptions, matching
the engine's validation philosophy (SURVEY.md §1.5).
"""

from __future__ import annotations

import json
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame


def validate_schema(obj: dict, schema: dict) -> Tuple[bool, str]:
    """(is_valid, message) with the reference's exact semantics: the
    FIRST jsonschema.ValidationError message, else "All good!"."""
    import jsonschema

    try:
        jsonschema.validate(obj, schema)
        return (True, "All good!")
    except jsonschema.ValidationError as err:
        return (False, err.message)


def validate_json_docs(
    docs: DataFrame, schema: dict,
    id_col: str = "doc_id", json_col: str = "payload",
) -> DataFrame:
    """docs(id_col, json_col: string of JSON) -> (doc_id, valid,
    message). The schema dict is closure-captured (broadcast with the
    task) and the jsonschema validator is compiled once per batch."""

    schema_blob = json.dumps(schema)

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
                except (TypeError, ValueError) as ex:
                    out.append(
                        {"doc_id": doc_id, "valid": False,
                         "message": f"invalid JSON: {ex}"}
                    )
                    continue
                # same error selection as jsonschema.validate (it
                # raises best_match, not the first iterated error)
                err = jsonschema.exceptions.best_match(
                    validator.iter_errors(obj)
                )
                out.append(
                    {
                        "doc_id": doc_id,
                        "valid": err is None,
                        "message": "All good!" if err is None else err.message,
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "valid", "message"])

    return docs.mapInPandas(
        gen, schema="doc_id string, valid boolean, message string"
    )
