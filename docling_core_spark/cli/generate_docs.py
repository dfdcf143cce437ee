"""Export the engine's declared JSON schemas to a directory.

Parity target: the reference's schema-docs CLI
(utils/generate_docs.py:1-82 — dumps the JSON schema of each Docling
collection model to `<dir>/<Model>.json`, with an optional --clean
wipe). The engine renders the same three collections from its
declarative schema tables (model/schema_gen.py) plus the search-index
metadata schemas (search/meta_schema.py) the reference keeps as
Pydantic-only.

Usage: python -m docling_core_spark.cli.generate_docs <dir> [--clean]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Callable, Dict


def schema_catalog() -> Dict[str, Callable[[], dict]]:
    from ..model.schema_gen import generate_docling_schema
    from ..model.rec_schema import rec_schemas
    from ..search.meta_schema import (
        generate_meta_schema,
        generate_package_schema,
    )

    rec = rec_schemas()
    return {
        # the reference's MODELS list (generate_docs.py:21)
        "DoclingDocument": generate_docling_schema,
        "Record": lambda: rec["record"],
        "Generic": lambda: rec["generic"],
        # engine extras with no reference docs analog
        "Meta": generate_meta_schema,
        "Package": generate_package_schema,
    }


def prepare_directory(folder: str, clean: bool = False) -> None:
    """Create the directory, or empty it when clean=True
    (generate_docs.py:24-38 semantics)."""
    if os.path.isdir(folder):
        if clean:
            for name in os.listdir(folder):
                path = os.path.join(folder, name)
                if os.path.isfile(path):
                    os.unlink(path)
                else:
                    shutil.rmtree(path)
    else:
        os.makedirs(folder, exist_ok=True)


def generate_collection_jsonschema(folder: str) -> list:
    written = []
    for name, gen in schema_catalog().items():
        path = os.path.join(folder, f"{name}.json")
        with open(path, "w", encoding="utf8") as f:
            json.dump(gen(), f, ensure_ascii=False, indent=2)
        written.append(path)
    return written


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("directory")
    p.add_argument("--clean", action="store_true", default=False)
    args = p.parse_args(argv)
    prepare_directory(args.directory, args.clean)
    for path in generate_collection_jsonschema(args.directory):
        print(path)


if __name__ == "__main__":
    main()
