"""bench.py group coverage: every suite query must be benched in
exactly one fresh-JVM group (drift here would silently drop a query
from BENCH_r* or crash the bench mid-run)."""

import bench
import __spark_entry__ as E


def test_groups_cover_queries_exactly_once():
    suite = [n for n in E.queries() if not n.startswith("pipeline_")]
    grouped = bench.PIPELINE_SUITE + [
        n for g in bench.GROUPS.values() for n in g
    ]
    assert sorted(grouped) == sorted(suite)
    assert len(grouped) == len(set(grouped))
