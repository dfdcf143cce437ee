"""As-of join semantics on planted user timelines: inclusive bound,
no-prior-view NULLs, latest-wins, and per-(user, ts) tie determinism."""

import datetime as dt

import duckdb
import pandas as pd


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    df["value"] = 1.0
    df["props"] = "{}"
    # Spark's parquet reader rejects pandas' default nanosecond stamps
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(tmp_path / "events.parquet")


def test_events_asof_planted_timelines(spark, tmp_path):
    import __spark_entry__ as E

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: view(10) .. purchase(20) -> attributed to view 100
        (100, t(10), 1, "view"),
        (200, t(20), 1, "purchase"),
        # user 1: second purchase(30) still latest view = 100
        (201, t(30), 1, "purchase"),
        # user 2: purchase(5) BEFORE any view -> NULL attribution
        (202, t(5), 2, "purchase"),
        (101, t(9), 2, "view"),
        # user 2: purchase at the EXACT view ts -> inclusive, lag 0
        (203, t(9), 2, "purchase"),
        # user 3: two views at the SAME ts -> max event_id (103) wins
        (102, t(1), 3, "view"),
        (103, t(1), 3, "view"),
        (204, t(2), 3, "purchase"),
        # user 3: later view supersedes
        (104, t(7), 3, "view"),
        (205, t(8), 3, "purchase"),
    ]
    _write_events(tmp_path, rows)
    got = {
        r["p_id"]: (r["v_id"], r["lag_us"])
        for r in E.queries()["events_asof"](spark, str(tmp_path)).collect()
    }
    assert got == {
        200: (100, 10_000_000),
        201: (100, 20_000_000),
        202: (None, None),
        203: (101, 0),
        204: (103, 1_000_000),
        205: (104, 1_000_000),
    }
    # DuckDB's native ASOF JOIN agrees on the planted cases
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{tmp_path}/events.parquet')"
    )
    want = {
        r[0]: (r[2], r[3])
        for r in con.execute(E.oracle_sql()["events_asof"]).fetchall()
    }
    assert want == got


def test_events_range_join_planted_boundaries(spark, tmp_path):
    """Bucketed range join vs hand counts: exactly-1h-before counts
    (inclusive), one microsecond over does not, same-ts counts, other
    users never leak, empty windows report 0."""
    import __spark_entry__ as E

    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    base = dt.datetime(2024, 1, 2, 12, 0, 0)
    rows = [
        (300, base, 1, "purchase"),
        (110, base - h, 1, "view"),          # exactly 1h -> counts
        (111, base - h - us, 1, "view"),     # 1h + 1us -> out
        (112, base, 1, "view"),              # same ts -> counts
        (113, base - dt.timedelta(minutes=30), 1, "view"),
        (114, base - dt.timedelta(minutes=10), 2, "view"),  # other user
        (301, base, 3, "purchase"),          # no views at all
    ]
    _write_events(tmp_path, rows)
    got = {
        r["p_id"]: r["n_views_1h"]
        for r in E.queries()["events_range_join"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {300: 3, 301: 0}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{tmp_path}/events.parquet')"
    )
    want = {
        r[0]: r[2]
        for r in con.execute(
            E.oracle_sql()["events_range_join"]
        ).fetchall()
    }
    assert want == got


def test_events_retention_cohort_invariants(spark):
    """Offset-0 cells count each cohort's full membership; later
    offsets never exceed it; offsets are non-negative."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    rows = E.queries()["events_retention"](spark, sf).collect()
    assert rows
    base = {
        r["cohort_wk"]: r["n_users"]
        for r in rows
        if r["week_offset"] == 0
    }
    for r in rows:
        assert r["week_offset"] >= 0
        assert r["cohort_wk"] in base
        assert r["n_users"] <= base[r["cohort_wk"]]
