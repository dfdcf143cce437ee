

def test_curation_funnel_is_monotone_and_parity(spark):
    import duckdb

    from docling_core_spark.corpus import curation as CC

    sd = "/root/testdata/sf0.001"
    got = CC.q_curation_funnel(spark, sd).collect()[0].asDict()
    assert (got["n_docs"] >= got["n_pass_quality"]
            >= got["n_pass_decontam"] >= got["n_final"] > 0)
    assert 0 < got["tokens_final"] <= got["tokens_total"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sd}/documents.parquet')"
    )
    want = con.execute(CC.sql_curation_funnel()).df().iloc[0].to_dict()
    assert {k: int(v) for k, v in got.items()} == {
        k: int(v) for k, v in want.items()
    }
