"""Deterministic micro-batch replays that put the streaming surface
under the cross-engine correctness gate.

The stateful dedup (stateful.py) and the watermarked window aggregation
(windowed.py) are real Structured Streaming operators — checkpointed
state, watermark-driven eviction, append-mode emission. Those semantics
are not directly SQL-expressible, but a DETERMINISTIC replay of them
is: split the input table into K batch files by a pure function of the
row key, feed them in order through AvailableNow drains against a
shared checkpoint — batch 0 in its own run, the rest as one-file
micro-batches of a second run resuming from the checkpoint (so both
the restart path and per-micro-batch state/watermark progression are
exercised; tests/test_windowed_stream.py pins the per-run cadence) —
and the final sink table becomes a pure function of the input — which a
DuckDB oracle can reproduce with window functions:

  - stream_dedup_replay: first-seen-wins across micro-batches ==
    row_number() OVER (PARTITION BY content ORDER BY batch, doc_id);
  - stream_windowed_replay: the watermark before batch k is
    max(event-time over batches < k) - delay (Spark tracks the max in
    MILLISECONDS — EventTimeStatsAccum — so the oracle floors to ms
    before subtracting); a row is accepted iff its window end exceeds
    that watermark, and a window is emitted iff its end is <= the
    final watermark. Both predicates are reproduced literally.

Each replay stages its batch files and checkpoint under a fresh
tempdir, which is removed before returning: the sink table (a handful
of digest/metric rows, never document bodies) is pinned with an eager
localCheckpoint so the caller's later action does not depend on the
deleted files.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import read_spread
from ..corpus.textstats import _h30_duck, _h30_spark

N_BATCHES = 4
WINDOW_S = 1800
DELAY_S = 3600


class _stream_width:
    """Temporarily narrow spark.sql.shuffle.partitions for the replay
    drains: the state store creates one store (and checkpoint delta)
    per shuffle partition per micro-batch, so at replay scale the
    per-drain fixed cost is ~partitions x drains, unrelated to data
    volume. The width is pinned at first checkpoint creation; every
    replay uses a fresh checkpoint so the narrow width is consistent.
    On a production cluster the width is sized to state volume instead
    (state is partitioned by key hash, uniform by construction)."""

    WIDTH = "8"

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.WIDTH)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def _drain(q, what: str) -> None:
    """Block until the AvailableNow drain finishes; a drain that
    outlives the timeout must fail loudly — letting the loop continue
    would start a second query against the same checkpoint (or read a
    sink missing the final batch)."""
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(f"{what}: AvailableNow drain exceeded 300s")


def _stage_batch(df, input_dir: str, idx: int) -> None:
    """One flat parquet FILE per batch (the file-stream source lists
    files, not nested dirs): write to staging, move the part file in.
    The file's mtime is pinned to a strictly increasing per-index
    instant so the file-stream source (which orders unseen files by
    modification time) processes batch k as micro-batch k even when
    several batches are staged before one drain."""
    staging = os.path.join(input_dir, f"_staging-{idx}")
    df.coalesce(1).write.parquet(staging, mode="overwrite")
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    dst = os.path.join(input_dir, f"batch-{idx}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(staging)
    t = 1_700_000_000 + idx * 60
    os.utime(dst, (t, t))


def _run_replay(spark, what: str, stage_k, make_query) -> None:
    """Drive one replay: stage batch 0 and drain it in its OWN run —
    the checkpoint-restart boundary the replay certifies (the second
    run must resume state/watermark/commit-log from the first's
    checkpoint) — then stage batches 1..N_BATCHES-1 and drain them in
    a SINGLE AvailableNow run. The sources read with
    maxFilesPerTrigger=1, so staged file k becomes micro-batch k and
    per-micro-batch state/watermark progression is identical to the
    round-4 one-run-per-batch cadence, at 2 stream startups instead of
    N_BATCHES (the startups dominated the replays' wall time)."""
    with _stream_width(spark):
        stage_k(0)
        _drain(make_query(), what)
        for k in range(1, N_BATCHES):
            stage_k(k)
        _drain(make_query(), what)


def q_stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the documents table through the stateful cross-batch
    dedup stream (stateful.py) in N_BATCHES deterministic micro-batches
    (batch = h30(doc_id) % N_BATCHES) and return the final sink: one
    row per distinct text, owned by the doc that reached the stream
    first (min (batch, doc_id)). State survives across the per-batch
    drains via the shared checkpoint — each drain is a restart."""
    from .stateful import dedup_text_stream

    base = tempfile.mkdtemp(prefix="dedup-replay-")
    input_dir, output_dir, ckpt = (
        f"{base}/in", f"{base}/out", f"{base}/ckpt"
    )
    try:
        os.makedirs(input_dir)
        docs = read_spread(spark, sf_dir, "documents").select(
            "doc_id", "text",
            F.expr(
                f"{_h30_spark('cast(doc_id as string)')} % {N_BATCHES}"
            ).alias("b"),
        )
        batch_schema = docs.drop("b").schema
        _run_replay(
            spark, "stream_dedup_replay",
            lambda k: _stage_batch(
                docs.filter(F.col("b") == k).select("doc_id", "text"),
                input_dir, k,
            ),
            lambda: dedup_text_stream(
                spark, input_dir, output_dir, ckpt, schema=batch_schema
            ),
        )
        return spark.read.parquet(output_dir).select(
            "content_hash", "doc_id",
            F.col("n_spans").cast("bigint").alias("n_chars"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sql_stream_dedup_replay() -> str:
    return f"""
        WITH b AS (
            SELECT doc_id, md5(text) AS content_hash,
                   length(text)::BIGINT AS n_chars,
                   {_h30_duck('doc_id::VARCHAR')} % {N_BATCHES} AS bi
            FROM documents
        )
        SELECT content_hash, doc_id::VARCHAR AS doc_id, n_chars FROM b
        QUALIFY row_number()
            OVER (PARTITION BY content_hash ORDER BY bi, doc_id) = 1
    """


def q_stream_sessionize_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table through the stateful gap-sessionizer
    (sessions.py) in N_BATCHES event-time-ordered micro-batches and
    return the final sink: every session CLOSED by a successor event.

    The batch cut is an event-time RANGE split (batch k = k-th quantile
    of the epoch-us range), so the feed is event-time monotonic across
    batches — the precondition under which the closed-session set is a
    pure function of the input (sessions.py docstring) and a DuckDB
    window oracle reproduces it exactly. The range bounds are a 2-value
    driver-side agg (same footprint as the snapshot pins in
    sources/table_io.py). Each user's final session never closes by
    successor and stays in state — exactly what a real perpetual ingest
    would hold open (the event_time timeout mode closes those; its
    firing instant is a watermark race, so the gate pins the
    deterministic core)."""
    from .sessions import sessionize_stream

    base = tempfile.mkdtemp(prefix="sessionize-replay-")
    input_dir, output_dir, ckpt = (
        f"{base}/in", f"{base}/out", f"{base}/ckpt"
    )
    try:
        os.makedirs(input_dir)
        events = read_spread(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts",
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ).cast("long").alias("ts_us"),
        )
        mn, mx = events.agg(
            F.min("ts_us"), F.max("ts_us")
        ).first()
        span = max(int(mx) - int(mn) + 1, 1)
        events = events.withColumn(
            "b",
            F.least(
                F.lit(N_BATCHES - 1),
                ((F.col("ts_us") - F.lit(int(mn)))
                 * N_BATCHES / F.lit(span)).cast("int"),
            ),
        )
        batch_schema = events.drop("b", "ts_us").schema
        _run_replay(
            spark, "stream_sessionize_replay",
            lambda k: _stage_batch(
                events.filter(F.col("b") == k)
                .select("event_id", "user_id", "ts"),
                input_dir, k,
            ),
            lambda: sessionize_stream(
                spark, input_dir, output_dir, ckpt,
                schema=batch_schema, timeout_mode="none",
            ),
        )
        return spark.read.parquet(output_dir).select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("session_start_us").cast("bigint")
            .alias("session_start_us"),
            F.col("session_end_us").cast("bigint")
            .alias("session_end_us"),
            F.col("n_events").cast("bigint").alias("n_events"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sql_stream_sessionize_replay() -> str:
    from .sessions import SESSION_GAP_US

    return f"""
        WITH e AS (
            SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS ts_us
            FROM events
        ),
        g AS (
            SELECT user_id, ts_us,
                   CASE WHEN lag(ts_us) OVER w IS NULL
                          OR ts_us - lag(ts_us) OVER w
                             > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS ns
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
        ),
        s AS (
            SELECT user_id, ts_us,
                   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS sid
            FROM g
        ),
        sess AS (
            SELECT user_id, sid,
                   MIN(ts_us)::BIGINT AS session_start_us,
                   MAX(ts_us)::BIGINT AS session_end_us,
                   COUNT(*)::BIGINT AS n_events
            FROM s GROUP BY user_id, sid
        )
        SELECT user_id, session_start_us, session_end_us, n_events
        FROM sess
        QUALIFY sid < MAX(sid) OVER (PARTITION BY user_id)
    """


def q_stream_windowed_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table through the watermarked tumbling-window
    aggregation (windowed.py) in N_BATCHES deterministic micro-batches
    (batch = event_id % N_BATCHES) and return the final append-mode
    sink: exactly the windows the advancing watermark finalized, with
    late-but-within-watermark events merged and too-late events
    dropped. Window bounds are returned as epoch seconds (BIGINT)."""
    from .windowed import run_windowed_stream

    base = tempfile.mkdtemp(prefix="windowed-replay-")
    input_dir, output_dir, ckpt = (
        f"{base}/in", f"{base}/out", f"{base}/ckpt"
    )
    try:
        os.makedirs(input_dir)
        events = read_spread(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "ts", "value",
            (F.col("event_id") % N_BATCHES).alias("b"),
        )
        _run_replay(
            spark, "stream_windowed_replay",
            lambda k: _stage_batch(
                events.filter(F.col("b") == k).drop("b"), input_dir, k,
            ),
            lambda: run_windowed_stream(
                spark, input_dir, output_dir, ckpt,
                window_size=f"{WINDOW_S} seconds",
                watermark_delay=f"{DELAY_S} seconds",
            ),
        )
        return spark.read.parquet(output_dir).select(
            F.unix_timestamp("window_start").cast("bigint")
            .alias("window_start_s"),
            F.unix_timestamp("window_end").cast("bigint")
            .alias("window_end_s"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("total_value_cents").cast("bigint")
            .alias("total_value_cents"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sql_stream_windowed_replay() -> str:
    w_us = WINDOW_S * 1_000_000
    delay_ms = DELAY_S * 1_000
    return f"""
        WITH e AS (
            SELECT event_type, value,
                   epoch_us(ts) AS ts_us,
                   event_id % {N_BATCHES} AS b,
                   (epoch_us(ts) // {w_us}) * {w_us} AS ws_us
            FROM events
        ),
        batch_max AS (
            SELECT b, max(ts_us) AS mx FROM e GROUP BY b
        ),
        wm AS (
            -- watermark in effect while batch b is processed: max
            -- event time over EARLIER batches, floored to ms (Spark's
            -- EventTimeStatsAccum tracks ms), minus the delay; the
            -- final watermark includes every batch
            SELECT b,
                   (max(mx) OVER (ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) // 1000 - {delay_ms})
                       * 1000 AS wm_us,
                   (max(mx) OVER () // 1000 - {delay_ms})
                       * 1000 AS final_wm_us
            FROM batch_max
        ),
        accepted AS (
            -- Spark drops a row iff its window END <= the current
            -- watermark; a window is emitted (append mode) iff its
            -- end <= the final watermark
            SELECT e.*, wm.final_wm_us
            FROM e JOIN wm USING (b)
            WHERE wm.wm_us IS NULL OR e.ws_us + {w_us} > wm.wm_us
        )
        SELECT (ws_us // 1000000)::BIGINT AS window_start_s,
               ((ws_us + {w_us}) // 1000000)::BIGINT AS window_end_s,
               event_type,
               COUNT(*)::BIGINT AS n_events,
               SUM(floor(value * 100 + 0.5)::BIGINT)::BIGINT
                   AS total_value_cents
        FROM accepted
        WHERE ws_us + {w_us} <= final_wm_us
        GROUP BY 1, 2, 3
    """


def q_stream_enrich_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the orders table through the stream-static broadcast-join
    enrichment (enrich.py) in N_BATCHES deterministic micro-batches
    (batch = o_orderkey % N_BATCHES), the static side being the pinned
    customer -> nation dimension snapshot, and return the final sink
    rolled up per nation: order count, distinct buying customers, and
    total order value in exact cents. Each drain is a restart against
    the shared checkpoint, so the rollup also certifies the file sink's
    exactly-once commit log (a replayed batch would double the
    counts)."""
    from .enrich import enrich_stream

    base = tempfile.mkdtemp(prefix="enrich-replay-")
    input_dir, output_dir, ckpt = (
        f"{base}/in", f"{base}/out", f"{base}/ckpt"
    )
    try:
        os.makedirs(input_dir)
        orders = read_spread(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice",
            (F.col("o_orderkey") % N_BATCHES).alias("b"),
        )
        # plain reads for the dimensions: read_spread's single-split
        # fan-out repartition is pure waste on tables that broadcast
        dim = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/nation.parquet"),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .select(
                F.col("c_custkey").alias("o_custkey"), "n_name"
            )
        )
        batch_schema = orders.drop("b").schema
        _run_replay(
            spark, "stream_enrich_replay",
            lambda k: _stage_batch(
                orders.filter(F.col("b") == k).drop("b"),
                input_dir, k,
            ),
            lambda: enrich_stream(
                spark, input_dir, output_dir, ckpt,
                schema=batch_schema, dim=dim, join_key="o_custkey",
            ),
        )
        return (
            spark.read.parquet(output_dir)
            .groupBy("n_name")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.countDistinct("o_custkey").cast("bigint")
                .alias("n_customers"),
                F.sum(
                    F.expr(
                        "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
                    )
                ).cast("bigint").alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def sql_stream_enrich_replay() -> str:
    return """
        SELECT n.n_name,
               COUNT(*)::BIGINT AS n_orders,
               COUNT(DISTINCT o.o_custkey)::BIGINT AS n_customers,
               SUM(floor(o.o_totalprice * 100 + 0.5)::BIGINT)::BIGINT
                   AS total_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """
