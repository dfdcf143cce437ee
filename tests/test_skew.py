"""Skew resilience (SURVEY.md §7 risk register): one pathological
many-span document among tiny ones must not break the pipeline, the
Arrow batch bounds, or the salted sharding."""

import pytest

from pyspark.sql import functions as F


def _skewed_docs(spark, n_small=64, monster_spans=20_000):
    import pandas as pd

    from docling_core_spark import schema as S

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                if i == 0:
                    spans = [
                        {"kind": "text", "text": f"monster paragraph {j}",
                         "media_ref": "", "offset": j}
                        for j in range(monster_spans)
                    ]
                else:
                    spans = [
                        {"kind": "text", "text": f"tiny {i}",
                         "media_ref": "", "offset": 0}
                    ]
                out.append({"doc_id": f"skew-{i:04d}", "spans": spans})
            yield pd.DataFrame(out, columns=["doc_id", "spans"])

    return (
        spark.range(0, n_small + 1, numPartitions=4)
        .mapInPandas(gen, schema=S.DOCS_SCHEMA)
    )


def test_monster_doc_processes_and_orders_all_spans(spark):
    from docling_core_spark.pipeline import run_pipeline

    docs = _skewed_docs(spark)
    out = run_pipeline(docs, salt_partitions=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 65
    monster = rows["skew-0000"]
    assert monster["n_spans_in"] == 20_000
    assert monster["n_items"] == 20_000
    assert monster["tree_valid"]
    assert monster["parse_anomalies"] == 0
    # span_seq preserved in order
    seq = monster["span_seq"]
    assert len(seq) == 20_000
    assert seq[0]["order"] == 0 and seq[-1]["order"] == 19_999
    assert seq[123]["text"] == "monster paragraph 123"
    # small docs unharmed
    assert all(
        rows[f"skew-{i:04d}"]["n_items"] == 1 for i in range(1, 65)
    )


def test_salting_spreads_docs_across_partitions(spark):
    from docling_core_spark.pipeline import run_pipeline

    docs = _skewed_docs(spark, n_small=32, monster_spans=100)
    out = run_pipeline(docs, salt_partitions=8)
    parts = (
        out.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(parts) >= 4  # docs actually spread over the salt space
