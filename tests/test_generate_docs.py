"""Schema-docs CLI (cli/generate_docs.py) vs the reference's
utils/generate_docs.py semantics."""

import json
import os

from docling_core_spark.cli.generate_docs import (
    generate_collection_jsonschema,
    main,
    prepare_directory,
    schema_catalog,
)


def test_covers_reference_models():
    """The reference exports MODELS = [DoclingDocument, Record,
    Generic] (generate_docs.py:21); the engine must cover at least
    those."""
    cat = schema_catalog()
    for name in ("DoclingDocument", "Record", "Generic"):
        assert name in cat
        sch = cat[name]()
        assert isinstance(sch, dict) and sch.get("properties"), name


def test_writes_one_file_per_model(tmp_path):
    out = str(tmp_path / "docs")
    prepare_directory(out)
    written = generate_collection_jsonschema(out)
    assert len(written) == len(schema_catalog())
    for path in written:
        sch = json.load(open(path, encoding="utf8"))
        assert "properties" in sch
    # DoclingDocument dump matches the generator output byte-for-byte
    from docling_core_spark.model.schema_gen import (
        generate_docling_schema,
    )

    dumped = json.load(
        open(os.path.join(out, "DoclingDocument.json"), encoding="utf8")
    )
    assert dumped == generate_docling_schema()


def test_clean_semantics(tmp_path):
    """--clean empties an existing directory first
    (generate_docs.py:24-38)."""
    out = tmp_path / "docs"
    out.mkdir()
    (out / "stale.txt").write_text("old")
    (out / "subdir").mkdir()
    (out / "subdir" / "x").write_text("y")
    prepare_directory(str(out), clean=True)
    assert list(out.iterdir()) == []
    # without clean, existing files survive
    (out / "keep.txt").write_text("k")
    prepare_directory(str(out), clean=False)
    assert (out / "keep.txt").exists()


def test_cli_main(tmp_path, capsys):
    out = str(tmp_path / "cli_out")
    main([out, "--clean"])
    printed = capsys.readouterr().out.strip().splitlines()
    assert len(printed) == len(schema_catalog())
    assert all(os.path.exists(p) for p in printed)
