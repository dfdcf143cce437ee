"""Table-maintenance planning: the small-file compaction plan an
Iceberg/Delta table needs after streaming ingest (many under-sized data
files per partition degrade scan parallelism and planning time — the
problem `rewrite_data_files` exists to solve).

The planner consumes the table's FILE MANIFEST — metadata-scale input
(one row per data file; ~1e6-1e8 rows for a 100 TB table), never the
data — and emits one row per output bin: which contiguous run of files
each compaction task rewrites. Binning is greedy sequential WITHIN each
(source, lang) partition, matching how real table formats compact
(cross-partition merges would break partition pruning).

In this sandbox the manifest is synthesized deterministically from the
documents table (a "file" = a 256-doc_id-wide chunk of a partition,
bytes = its exact char mass); a production run reads the real manifest
and keeps everything below identical.

Reference analog: none (docling-core has no table layer; SURVEY.md
§2.8 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread

COMPACT_TARGET_BYTES = 1 << 19  # 512 KiB target bin at test scale
_FILE_CHUNK = 256               # doc_ids per synthesized "file"


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) greedy sequential bin packing of the file
    manifest: files ordered by chunk id, cumulative byte mass BEFORE
    each file decides its bin (floor(cum_before / target) — a file
    larger than the target gets its own bin and the next file starts
    fresh, the standard greedy-FFD-on-sorted-order compromise that
    keeps every bin a CONTIGUOUS file run, so each compaction task
    reads sequentially).

    100 TB story: the input is the manifest, not the data; the only
    window partitions by (source, lang) over that partition's file
    rows — bounded by files-per-partition (what the compactor itself
    bounds), never by document mass; the rollup is a map-side-combined
    groupBy on the (source, lang, bin) key. No global window, no
    corpus-sized shuffle."""
    docs = read_spread(spark, sf_dir, "documents")
    files = docs.groupBy(
        "source",
        "lang",
        F.expr(f"doc_id div {_FILE_CHUNK}").alias("chunk"),
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bytes"),
    )
    binned = files.select(
        "source",
        "lang",
        "chunk",
        "n_docs",
        "bytes",
        # integer div on the BIGINT cumulative mass — matches DuckDB's
        # // exactly (all values non-negative, no float step at all)
        F.expr(
            f"coalesce(sum(bytes) over (partition by source, lang"
            f" order by chunk rows between unbounded preceding"
            f" and 1 preceding), 0) div {COMPACT_TARGET_BYTES}"
        ).cast("bigint").alias("bin"),
    )
    return binned.groupBy("source", "lang", "bin").agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.min("chunk").cast("bigint").alias("first_chunk"),
        F.max("chunk").cast("bigint").alias("last_chunk"),
    )


def sql_compaction_plan() -> str:
    return f"""
        WITH files AS (
            SELECT source, lang, doc_id // {_FILE_CHUNK} AS chunk,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(n_chars)::BIGINT AS bytes
            FROM documents GROUP BY 1, 2, 3
        ),
        binned AS (
            SELECT source, lang, chunk, n_docs, bytes,
                   (COALESCE(SUM(bytes) OVER (
                        PARTITION BY source, lang ORDER BY chunk
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0)
                    // {COMPACT_TARGET_BYTES})::BIGINT AS bin
            FROM files
        )
        SELECT source, lang, bin,
               COUNT(*)::BIGINT AS n_files,
               SUM(n_docs)::BIGINT AS n_docs,
               SUM(bytes)::BIGINT AS total_bytes,
               MIN(chunk)::BIGINT AS first_chunk,
               MAX(chunk)::BIGINT AS last_chunk
        FROM binned GROUP BY 1, 2, 3
    """


# ---------------------------------------------------------------------------
# Z-order layout planning (OPTIMIZE ZORDER BY (user_id, ts) analog)
# ---------------------------------------------------------------------------

ZORDER_BITS = 8        # per-dimension rank resolution (8 bits -> 0..255)
ZORDER_FILES = 64      # target data files per rewrite

# Both dialects bake these constants into arithmetic that assumes the
# file count divides both the per-dim and the Morton code range — a
# non-divisor would emit file_id == ZORDER_FILES, and > 2^BITS would
# divide by zero in the oracle. Fail at import, not at gate time.
assert (1 << ZORDER_BITS) % ZORDER_FILES == 0, "files must divide 2^bits"
assert (1 << (2 * ZORDER_BITS)) % ZORDER_FILES == 0


def _rank_expr(col: str, mn: str, mx: str) -> str:
    """Exact integer 0..255 rank of `col` within [mn, mx] — identical
    text in both dialects (all-BIGINT, truncating div on non-negative
    operands)."""
    span = f"({mx} - {mn} + 1)"
    return f"(({col} - {mn}) * {1 << ZORDER_BITS} {{div}} {span})"


def _interleave_expr(u: str, t: str, div: str) -> str:
    """16-bit Morton code from two 8-bit ranks via pure integer
    arithmetic (no engine bit builtins — `x {div} 2^b % 2` extracts bit
    b identically in Spark and DuckDB for non-negative x)."""
    terms = []
    for b in range(ZORDER_BITS):
        terms.append(f"(({u}) {div} {1 << b} % 2) * {1 << (2 * b + 1)}")
        terms.append(f"(({t}) {div} {1 << b} % 2) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout planning for multi-dimensional data skipping (Delta
    OPTIMIZE ZORDER / Iceberg sort-order rewrite): assign each event a
    16-bit Morton code over (user_id rank, event-time rank) and bin the
    code range into ZORDER_FILES contiguous files; report each file's
    ZONE MAP (min/max rank per dimension) for BOTH the z-order layout
    and the naive time-ordered baseline. The z-order zone maps are
    narrow on *both* dimensions, so a predicate on either column skips
    most files — the baseline's user_id zone maps span the whole domain
    (every time slice contains every user), which is the measurable
    reason z-ordering exists.

    100 TB story: zero global sort — ranks come from 4 broadcast
    min/max scalars, the Morton code is a per-row integer expression,
    file assignment is a fixed-range integer division, and the zone-map
    rollup is a map-side-combined groupBy on the (layout, file_id) key
    (<= 2 x ZORDER_FILES groups). A production rewrite then shuffles
    once ON file_id to co-locate each file's rows — exactly one
    corpus-sized exchange, the rewrite itself. All arithmetic is BIGINT
    (truncating div == floor on the non-negative ranks), so both
    engines bin identically."""
    events = read_spread(spark, sf_dir, "events")
    base = events.select(
        F.col("user_id").cast("bigint").alias("u"),
        F.expr(
            "cast(timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) as bigint)"
        ).alias("t_us"),
    )
    scal = base.agg(
        F.min("u").alias("mn_u"), F.max("u").alias("mx_u"),
        F.min("t_us").alias("mn_t"), F.max("t_us").alias("mx_t"),
    )
    j = base.crossJoin(F.broadcast(scal))
    u8 = _rank_expr("u", "mn_u", "mx_u").format(div="div")
    t8 = _rank_expr("t_us", "mn_t", "mx_t").format(div="div")
    z = _interleave_expr(u8, t8, "div")
    n_bins = 1 << (2 * ZORDER_BITS)
    ranked = j.select(
        F.expr(u8).cast("bigint").alias("u8"),
        F.expr(t8).cast("bigint").alias("t8"),
        F.expr(
            f"{z} div {n_bins // ZORDER_FILES}"
        ).cast("bigint").alias("z_file"),
        F.expr(
            f"{t8} div {(1 << ZORDER_BITS) // ZORDER_FILES}"
        ).cast("bigint").alias("t_file"),
    )
    # ONE pass emits both layout rows per event (a unionAll of two
    # projections would re-execute the corpus-sized scan + rank
    # expressions once per branch — Spark does not share the subplan)
    both = ranked.select(
        F.explode(
            F.expr(
                "array(named_struct('layout', 'zorder',"
                "                   'file_id', z_file),"
                "      named_struct('layout', 'time',"
                "                   'file_id', t_file))"
            )
        ).alias("lf"),
        "u8",
        "t8",
    ).select(
        F.col("lf.layout").alias("layout"),
        F.col("lf.file_id").alias("file_id"),
        "u8",
        "t8",
    )
    return both.groupBy("layout", "file_id").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("u8").cast("bigint").alias("min_u8"),
        F.max("u8").cast("bigint").alias("max_u8"),
        F.min("t8").cast("bigint").alias("min_t8"),
        F.max("t8").cast("bigint").alias("max_t8"),
        # zone-map area this file's stats admit, in 1/65536 units of
        # the full domain — the fraction of arbitrary point predicates
        # that CANNOT skip this file
        F.expr(
            "cast((max(u8) - min(u8) + 1) * (max(t8) - min(t8) + 1)"
            " as bigint)"
        ).alias("zone_area"),
    )


def sql_zorder_layout() -> str:
    u8 = _rank_expr("u", "mn_u", "mx_u").format(div="//")
    t8 = _rank_expr("t_us", "mn_t", "mx_t").format(div="//")
    z = _interleave_expr(u8, t8, "//")
    n_bins = 1 << (2 * ZORDER_BITS)
    return f"""
        WITH base AS (
            SELECT user_id::BIGINT AS u, epoch_us(ts)::BIGINT AS t_us
            FROM events
        ),
        scal AS (
            SELECT MIN(u) AS mn_u, MAX(u) AS mx_u,
                   MIN(t_us) AS mn_t, MAX(t_us) AS mx_t
            FROM base
        ),
        ranked AS (
            SELECT {u8}::BIGINT AS u8, {t8}::BIGINT AS t8,
                   ({z} // {n_bins // ZORDER_FILES})::BIGINT AS z_file,
                   ({t8} // {(1 << ZORDER_BITS) // ZORDER_FILES})::BIGINT
                       AS t_file
            FROM base CROSS JOIN scal
        ),
        layouts AS (
            SELECT 'zorder' AS layout, z_file AS file_id, u8, t8
            FROM ranked
            UNION ALL
            SELECT 'time' AS layout, t_file AS file_id, u8, t8
            FROM ranked
        )
        SELECT layout, file_id,
               COUNT(*)::BIGINT AS n_rows,
               MIN(u8)::BIGINT AS min_u8, MAX(u8)::BIGINT AS max_u8,
               MIN(t8)::BIGINT AS min_t8, MAX(t8)::BIGINT AS max_t8,
               ((MAX(u8) - MIN(u8) + 1)
                * (MAX(t8) - MIN(t8) + 1))::BIGINT AS zone_area
        FROM layouts GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# ANALYZE TABLE analog: one-pass column statistics for the CBO / zone maps
# ---------------------------------------------------------------------------

_STATS_COLS = [
    ("doc_id", "bigint"),
    ("text", "string"),
    ("lang", "string"),
    ("source", "string"),
    ("n_chars", "bigint"),
]


def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level statistics over the documents table — what ANALYZE
    TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS feeds the cost-based
    optimizer (null counts, exact NDV, min/max, UTF-8 byte mass per
    column — octet_length/strlen, not character count, since the CBO
    sizes scans and partitions in bytes and a CJK-heavy source is ~3x
    its character count).
    One row per column, every stat exact and integer/string typed so
    both engines agree bit-for-bit (min/max rendered as strings AFTER
    being computed in the column's native type — lexicographic min of
    a numeric column would be wrong).

    100 TB story: ONE corpus pass computes every column's aggregates
    simultaneously (Spark evaluates the agg expressions in the same
    scan, map-side partial for all of them — count_distinct widens the
    partials but stays keyed by the constant group, i.e. a single
    reduce); the per-column unpivot happens on the 1-row aggregate.
    Production swaps exact NDV for HLL (the engine's hll_distinct
    operator) beyond memory bounds — noted, exact here to keep the
    oracle exact."""
    docs = read_spread(spark, sf_dir, "documents")
    aggs = []
    for c, _t in _STATS_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("bigint")
            .alias(f"{c}__nulls"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.sum(F.octet_length(F.col(c).cast("string")))
            .cast("bigint").alias(f"{c}__len"),
        ]
    one = docs.agg(F.count("*").cast("bigint").alias("n_rows"), *aggs)
    arms = ", ".join(
        f"named_struct('col_name', '{c}',"
        f" 'n_nulls', {c}__nulls, 'ndv', {c}__ndv,"
        f" 'min_val', {c}__min, 'max_val', {c}__max,"
        f" 'total_bytes', {c}__len)"
        for c, _t in _STATS_COLS
    )
    return one.select(
        "n_rows", F.explode(F.expr(f"array({arms})")).alias("s")
    ).select(
        "s.col_name", "n_rows", "s.n_nulls", "s.ndv",
        "s.min_val", "s.max_val", "s.total_bytes",
    )


def sql_table_stats() -> str:
    arms = []
    for c, _t in _STATS_COLS:
        arms.append(f"""
        SELECT '{c}' AS col_name,
               COUNT(*)::BIGINT AS n_rows,
               SUM(({c} IS NULL)::BIGINT)::BIGINT AS n_nulls,
               COUNT(DISTINCT {c})::BIGINT AS ndv,
               MIN({c})::VARCHAR AS min_val,
               MAX({c})::VARCHAR AS max_val,
               SUM(strlen({c}::VARCHAR))::BIGINT AS total_bytes
        FROM documents""")
    return " UNION ALL ".join(arms)


# ---------------------------------------------------------------------------
# CDC upsert planning (MERGE INTO analog over a change batch)
# ---------------------------------------------------------------------------

CDC_BATCH_MOD = 7  # doc_id % 7 == 0 simulates the incoming change batch


def q_merge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO planning: given the current table and an incoming
    change batch (CDC upserts — here the deterministic doc_id % 7
    slice re-keyed so ~half collide with existing rows and half are
    inserts), report per (source, lang) partition what the merge will
    do: rows matched (update), rows not matched (insert), and how many
    target FILES the rewrite touches (copy-on-write amplification —
    the number a production merge uses to decide copy-on-write vs
    merge-on-read).

    100 TB story: the change batch joins the target on the unique
    doc_id key — batch-sized probe against the target scan (at
    production scale the join prunes to the batch's partitions first);
    file touch counts reuse the compaction planner's manifest chunking
    (256-doc_id files), counted per DISTINCT touched chunk — a
    metadata-scale rollup. All counts exact BIGINTs."""
    docs = read_spread(spark, sf_dir, "documents")
    target = docs.select("doc_id", "source", "lang")
    batch = docs.where(
        F.expr(f"doc_id % {CDC_BATCH_MOD} = 0")
    ).select(
        # half the batch collides with existing keys (even multiples),
        # half lands beyond the current key range (inserts)
        F.expr(
            f"case when doc_id % {2 * CDC_BATCH_MOD} = 0 then doc_id"
            " else doc_id + 1000000000 end"
        ).alias("doc_id"),
        "source",
        "lang",
    )
    j = batch.alias("b").join(
        target.alias("t"),
        F.col("b.doc_id") == F.col("t.doc_id"),
        "left",
    )
    return j.groupBy(
        F.col("b.source").alias("source"), F.col("b.lang").alias("lang")
    ).agg(
        F.count("*").cast("bigint").alias("n_batch"),
        F.sum(
            F.col("t.doc_id").isNotNull().cast("long")
        ).cast("bigint").alias("n_matched"),
        F.sum(
            F.col("t.doc_id").isNull().cast("long")
        ).cast("bigint").alias("n_inserted"),
        F.expr(
            "cast(count(distinct case when t.doc_id is not null"
            f" then t.doc_id div {_FILE_CHUNK} end) as bigint)"
        ).alias("n_files_touched"),
    )


def sql_merge_plan() -> str:
    return f"""
        WITH batch AS (
            SELECT CASE WHEN doc_id % {2 * CDC_BATCH_MOD} = 0
                        THEN doc_id ELSE doc_id + 1000000000 END
                       AS doc_id,
                   source, lang
            FROM documents WHERE doc_id % {CDC_BATCH_MOD} = 0
        )
        SELECT b.source, b.lang,
               COUNT(*)::BIGINT AS n_batch,
               SUM((t.doc_id IS NOT NULL)::BIGINT)::BIGINT AS n_matched,
               SUM((t.doc_id IS NULL)::BIGINT)::BIGINT AS n_inserted,
               COUNT(DISTINCT CASE WHEN t.doc_id IS NOT NULL
                     THEN t.doc_id // {_FILE_CHUNK} END)::BIGINT
                   AS n_files_touched
        FROM batch b
        LEFT JOIN documents t ON b.doc_id = t.doc_id
        GROUP BY 1, 2
    """
