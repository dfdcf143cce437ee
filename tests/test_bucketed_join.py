"""Evidence for SCALE.md's bucketed co-location claim: a doc_id-
bucketed table pair joins with ZERO Exchange — the shuffle the
seg_dedup / curation rebuild joins pay on unbucketed inputs vanishes
when the production tables are bucketed on the join key (Spark buckets
are hash-partitioned at write time, so sort-merge join reads them
co-located)."""

import pytest


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    meta = docs.selectExpr("doc_id", "length(text) AS n")
    for name, df in (("b_docs", docs), ("b_meta", meta)):
        (df.write.format("parquet").bucketBy(4, "doc_id")
         .sortBy("doc_id").option("path", str(tmp_path / name))
         .mode("overwrite").saveAsTable(name))
    yield "b_docs", "b_meta"
    for name in ("b_docs", "b_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _joined(spark, left, right):
    return (
        spark.table(left).join(spark.table(right), "doc_id")
        .selectExpr("doc_id", "n", "length(text) AS m")
    )


def test_bucketed_join_is_exchange_free(spark, bucketed_pair):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _joined(spark, *bucketed_pair)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_unbucketed(spark, bucketed_pair):
    left, right = bucketed_pair
    got = sorted(tuple(r) for r in _joined(spark, left, right).collect())
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = sorted(
        tuple(r)
        for r in docs.selectExpr("doc_id", "length(text) AS n",
                                 "length(text) AS m").collect()
    )
    assert got == want and len(got) == 500
