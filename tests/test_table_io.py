"""Table-ref parsing/dispatch for the Iceberg/Delta/parquet binding."""

import pytest

from docling_core_spark.sources.table_io import (
    TableRef,
    load_docs,
    parse_ref,
    resolved_ref,
)


def test_parse_grammar():
    assert parse_ref("/data/docs.parquet") == TableRef(
        "parquet", "/data/docs.parquet"
    )
    assert parse_ref("iceberg:cat.db.docs") == TableRef(
        "iceberg", "cat.db.docs"
    )
    assert parse_ref("iceberg:cat.db.docs@123") == TableRef(
        "iceberg", "cat.db.docs", 123
    )
    assert parse_ref("delta:/lake/docs") == TableRef("delta", "/lake/docs")
    assert parse_ref("table:db.docs") == TableRef("table", "db.docs")


def test_render_roundtrip():
    for ref in ["iceberg:cat.db.docs@42", "iceberg:cat.db.docs",
                "delta:/lake/docs", "table:db.docs", "/p/docs.parquet"]:
        assert parse_ref(ref).render() == ref


def test_bad_refs_rejected():
    with pytest.raises(ValueError):
        parse_ref("iceberg:")
    with pytest.raises(ValueError):
        parse_ref("delta:")
    with pytest.raises(ValueError):
        parse_ref("iceberg:t@notanint")


def test_parquet_branch_loads(spark):
    df = load_docs(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() == 500
    # parquet refs resolve to themselves (immutable-input convention)
    assert resolved_ref(
        spark, "/root/testdata/sf0.001/documents.parquet"
    ) == "/root/testdata/sf0.001/documents.parquet"


def test_iceberg_without_catalog_fails_fast(spark):
    """No iceberg jars/catalog in this sandbox: the error must name the
    missing conf key, not die in a classloader stack."""
    with pytest.raises(RuntimeError, match="spark.sql.catalog.cat"):
        load_docs(spark, "iceberg:cat.db.docs")
    with pytest.raises(RuntimeError, match="spark.sql.catalog.cat"):
        resolved_ref(spark, "iceberg:cat.db.docs")
    # pinned refs resolve to themselves without touching the catalog
    assert resolved_ref(
        spark, "iceberg:cat.db.docs@7"
    ) == "iceberg:cat.db.docs@7"


def test_delta_without_extension_fails_fast(spark):
    with pytest.raises(RuntimeError, match="spark.sql.extensions"):
        load_docs(spark, "delta:/lake/docs")


def test_table_branch_reads_catalog(spark):
    spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).createOrReplaceTempView("tio_docs")
    assert load_docs(spark, "table:tio_docs").count() == 500


def test_jsonl_declared_schema_quarantines_corrupt_lines(spark, tmp_path):
    """The JSONL source must parse valid lines under the DECLARED
    schema and quarantine malformed ones into _corrupt_record instead
    of aborting or silently re-inferring types."""
    from docling_core_spark.sources.jsonl import read_documents_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en",'
        ' "source": "s", "n_chars": 5}\n'
        "{this is not json at all\n"
        '{"doc_id": 2, "text": "world", "lang": "fr",'
        ' "source": "s", "n_chars": 5}\n'
    )
    df = read_documents_jsonl(spark, str(p))
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert sorted(r["doc_id"] for r in good) == [1, 2]
    assert len(bad) == 1 and bad[0]["doc_id"] is None
    assert df.schema["doc_id"].dataType.typeName() == "long"
