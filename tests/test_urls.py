"""Behavioral tests for the URL acquisition operators (cross-engine
parity is covered by the driver gate and test_corpus_ops.py; these
assert the SEMANTICS: which raw forms merge, who robots blocks, and
the frontier's caps)."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


def test_canonicalization_merges_mess_pairs(spark):
    from docling_core_spark.corpus import urls as CU

    rows = {r["doc_id"]: r for r in CU.q_url_normalize(spark, SF_DIR).collect()}
    n_pairs = 0
    for did, r in rows.items():
        # every canonical form: lowercase scheme+host, no default port,
        # no fragment, no dot segments, no tracking params, idempotent
        assert r["idempotent"], r
        c = r["url_canon"]
        assert c.startswith(("http://", "https://"))
        assert "#" not in c and "/../" not in c and "/./" not in c
        assert ":80/" not in c and ":443/" not in c
        assert "utm_" not in c and "%7E" not in c and "WWW" not in c
        # doc pairs (2k, 2k+1) share a page id; same source+lang pairs
        # must collapse to the SAME canonical URL
        if did % 2 == 0 and did + 1 in rows:
            n_pairs += 1
            assert rows[did + 1]["url_canon"] == c
            assert rows[did + 1]["url_raw"] != r["url_raw"]
    assert n_pairs > 0


def test_query_param_sort_and_tracking_drop(spark):
    from docling_core_spark.corpus import urls as CU
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("https://a.b.com/p?z=1&a=2&utm_x=9&b=3#f",)], ["u"]
    ).select(F.expr(CU._canon("u", False)).alias("c"))
    assert df.collect()[0]["c"] == "https://a.b.com/p?a=2&b=3&z=1"
    d = duckdb.sql(
        f"SELECT {CU._canon('u', True)} AS c FROM (SELECT"
        " 'https://a.b.com/p?z=1&a=2&utm_x=9&b=3#f' AS u)"
    ).fetchone()[0]
    assert d == "https://a.b.com/p?a=2&b=3&z=1"


def test_robots_blocks_exactly_the_ruled_prefixes(spark):
    from docling_core_spark.corpus import urls as CU

    verdicts = CU.q_robots_filter(spark, SF_DIR).collect()
    assert any(not r["allowed"] for r in verdicts)
    for r in verdicts:
        path = r["url_canon"].split(".com", 1)[1].split("?", 1)[0]
        blocked_all = path.startswith(CU.ROBOTS_ALL)
        if r["allowed"]:
            assert not blocked_all
        else:
            assert r["matched_rule"] in (CU.ROBOTS_ALL, CU.ROBOTS_EVEN)
            assert path.startswith(r["matched_rule"])


def test_frontier_caps_and_excludes_seen_and_blocked(spark):
    from docling_core_spark.corpus import urls as CU

    frontier = CU.q_crawl_frontier(spark, SF_DIR).collect()
    assert frontier
    per_domain = {}
    for r in frontier:
        per_domain.setdefault(r["domain"], []).append(r)
    for domain, rs in per_domain.items():
        assert len(rs) <= CU.FRONTIER_K
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))
    # no frontier URL is robots-blocked or already seen
    verdicts = {
        r["url_canon"]: r for r in CU.q_robots_filter(spark, SF_DIR).collect()
    }
    seen = {
        v["url_canon"]
        for v in verdicts.values()
        if v["doc_id"] % CU.SEEN_MOD == 0
    }
    for r in frontier:
        assert verdicts[r["url_canon"]]["allowed"]
        assert r["url_canon"] not in seen
