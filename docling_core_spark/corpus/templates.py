"""Template-skeleton dedup: collapse documents that differ only in
digits or whitespace runs onto one normalized skeleton, and elect a
keeper per skeleton.

Exact dedup (md5 of the raw text) misses the most common boilerplate
family in web corpora: the SAME page re-rendered with a different
counter, date stamp, view count or pagination index ("Rev 3 of 2024"
vs "Rev 17 of 1999"). The standard cheap catch — used before the much
more expensive MinHash chain — is a TEMPLATE key: lowercase, collapse
every digit run to a single '0', collapse whitespace runs, trim, then
hash. Two renders of one template collide; genuinely different pages
do not.

The driver's synthetic corpus is digit-free word salad, so the raw
table has zero template variants. To keep the operator's signal
verifiable at gate scale, the query deterministically INJECTS two
stamped renders per selected base doc (h30(doc_id) % TPL_INJECT_MOD
== 0) before detection — the injection arm is fixture synthesis, the
detection arm is the operator; both engines run the identical rule so
the cross-engine gate checks the detector, not the fixture.

Scale shape: injection (a per-row explode, one table pass) and
skeletonization are narrow expressions; the only exchanges are the
two phases of the distinct aggregate on (template hash, text hash) —
and the rows that shuffle are (16B+16B hashes, doc_id), never
document text, so shuffle bytes are O(rows), not O(corpus bytes),
with map-side partial dedup. Output is capped to variant groups
(n_docs > 1): corpus-sized input, duplicate-family-sized output.
Reference analog: none (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread
from .textstats import _h30_duck, _h30_spark

# one base doc in TPL_INJECT_MOD gets two stamped renders appended
TPL_INJECT_MOD = 7
# variant doc_ids live far above any real doc_id at every sf
TPL_VARIANT_BASE = 1_000_000_000


def _skeleton(col: str, spark: bool) -> str:
    """Per-engine skeleton: lower -> digit runs to '0' -> whitespace
    runs to one space -> trim. The whitespace class is spelled
    explicitly ([ \\t\\n\\r\\f]) because Java's \\s and RE2's \\s
    disagree on \\x0B. The two dialects need different spellings of
    the SAME regex: Spark's SQL lexer consumes one backslash level
    (and silently DROPS the backslash of unrecognized escapes like
    \\f, turning it into a literal 'f' — measured), so the Spark text
    doubles them; DuckDB passes literals through untouched but
    replaces only the FIRST match unless the 'g' flag is given."""
    if spark:
        ws = "'[ \\\\t\\\\n\\\\r\\\\f]+'"
        return (
            f"trim(regexp_replace(regexp_replace(lower({col}),"
            f" '[0-9]+', '0'), {ws}, ' '))"
        )
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}),"
        f" '[0-9]+', '0', 'g'), '[ \\t\\n\\r\\f]+', ' ', 'g'))"
    )


def _stamp_a(spark: bool) -> str:
    cast = "cast(doc_id % 97 as string)" if spark else "(doc_id % 97)::VARCHAR"
    return f"'Rev ' || {cast} || ' of 2024 - ' || text"


def _stamp_b(spark: bool) -> str:
    cast = "cast(doc_id % 13 as string)" if spark else "(doc_id % 13)::VARCHAR"
    return f"'rev ' || {cast} || '   of   1999 - ' || text"


def q_template_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per template with more than one member: the md5 of the
    skeleton, member count, count of DISTINCT raw texts (> 1 means the
    template caught renders exact dedup cannot), and the keeper
    (min doc_id)."""
    docs = read_spread(spark, sf_dir, "documents").select("doc_id", "text")
    sel = f"{_h30_spark('cast(doc_id as string)')} % {TPL_INJECT_MOD} = 0"
    # single-scan injection: each row explodes into (original [, two
    # stamped renders]) — one pass over the table instead of a 3-arm
    # union re-reading it
    aug = docs.select(
        F.explode(
            F.expr(
                f"CASE WHEN {sel} THEN array("
                " struct(doc_id, text),"
                f" struct(doc_id + {TPL_VARIANT_BASE} AS doc_id,"
                f"        {_stamp_a(True)} AS text),"
                f" struct(doc_id + {2 * TPL_VARIANT_BASE} AS doc_id,"
                f"        {_stamp_b(True)} AS text))"
                " ELSE array(struct(doc_id, text)) END"
            )
        ).alias("r")
    ).select(F.col("r.doc_id").alias("doc_id"), F.col("r.text").alias("text"))
    # hash BEFORE the exchange: (tpl_hash, text_hash, doc_id) shuffles,
    # never the text
    hashed = aug.select(
        "doc_id",
        F.expr(f"md5({_skeleton('text', spark=True)})").alias("tpl_hash"),
        F.md5(F.encode("text", "UTF-8")).alias("text_hash"),
    )
    return (
        hashed.groupBy("tpl_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("text_hash").cast("bigint").alias(
                "n_distinct_texts"
            ),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .where("n_docs > 1")
    )


def sql_template_dedup() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH base AS (SELECT doc_id, text FROM documents),
        aug AS (
            SELECT doc_id, text FROM base
            UNION ALL
            SELECT doc_id + {TPL_VARIANT_BASE} AS doc_id,
                   {_stamp_a(False)} AS text
            FROM base WHERE {h} % {TPL_INJECT_MOD} = 0
            UNION ALL
            SELECT doc_id + {2 * TPL_VARIANT_BASE} AS doc_id,
                   {_stamp_b(False)} AS text
            FROM base WHERE {h} % {TPL_INJECT_MOD} = 0
        ),
        hashed AS (
            SELECT doc_id,
                   md5({_skeleton('text', spark=False)}) AS tpl_hash,
                   md5(text) AS text_hash
            FROM aug
        )
        SELECT tpl_hash,
               COUNT(*)::BIGINT AS n_docs,
               COUNT(DISTINCT text_hash)::BIGINT AS n_distinct_texts,
               MIN(doc_id)::BIGINT AS keep_doc_id
        FROM hashed
        GROUP BY tpl_hash
        HAVING COUNT(*) > 1
    """


# ---------------------------------------------------------------------------
# bag-of-words (order-insensitive) dedup
# ---------------------------------------------------------------------------

# one base doc in BOW_INJECT_MOD gets a token-reversed render appended
BOW_INJECT_MOD = 5
BOW_VARIANT_BASE = 4_000_000_000


def _bow_key(spark: bool) -> str:
    """md5 of the SORTED token multiset (sort keeps duplicates): two
    documents with the same words in a different order collide; any
    word added/removed/repeated a different number of times does not."""
    if spark:
        return (
            "md5(encode(concat_ws(' ',"
            " array_sort(split(lower(trim(text)), '\\\\s+'))), 'UTF-8'))"
        )
    return (
        "md5(array_to_string(list_sort("
        r"regexp_split_to_array(lower(trim(text)), '\s+')), ' '))"
    )


def _bow_variant(spark: bool) -> str:
    """Deterministic word-shuffle render: the document's tokens in
    reverse order — same multiset, different text and different
    shingles."""
    if spark:
        return (
            "concat_ws(' ', reverse(split(lower(trim(text)), '\\\\s+')))"
        )
    return (
        "array_to_string(list_reverse("
        r"regexp_split_to_array(lower(trim(text)), '\s+')), ' ')"
    )


def q_bow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive duplicate groups: md5 of the sorted token
    multiset as the collision key. Catches word-shuffled re-renders
    that BOTH exact dedup (different bytes) and shingle MinHash
    (k-grams change under reordering, so Jaccard collapses) miss —
    scraped tables re-sorted by a different column, RSS items
    re-ordered, templated listings with permuted fields.

    Like template_dedup, the driver's word-salad corpus has no natural
    word-shuffles, so the query deterministically INJECTS one
    token-reversed render per selected base doc (h30(doc_id) %
    {BOW_INJECT_MOD} == 0) before detection; both engines run the
    identical rule, so the cross-engine gate checks the detector, not
    the fixture.

    Scale shape: sort-within-row is a narrow per-row expression (no
    exchange); the only shuffle is the groupBy on (bow_hash) carrying
    (16B hash, 16B text hash, doc_id) — O(rows) shuffle bytes, never
    document text, map-side combinable. Output is capped to collision
    groups (n_docs > 1). Reference analog: none (SURVEY.md §2.8).
    """
    docs = read_spread(spark, sf_dir, "documents").select("doc_id", "text")
    sel = f"{_h30_spark('cast(doc_id as string)')} % {BOW_INJECT_MOD} = 0"
    aug = docs.select(
        F.explode(
            F.expr(
                f"CASE WHEN {sel} THEN array("
                " struct(doc_id, text),"
                f" struct(doc_id + {BOW_VARIANT_BASE} AS doc_id,"
                f"        {_bow_variant(True)} AS text))"
                " ELSE array(struct(doc_id, text)) END"
            )
        ).alias("r")
    ).select(F.col("r.doc_id").alias("doc_id"), F.col("r.text").alias("text"))
    hashed = aug.select(
        "doc_id",
        F.expr(_bow_key(True)).alias("bow_hash"),
        F.md5(F.encode("text", "UTF-8")).alias("text_hash"),
    )
    return (
        hashed.groupBy("bow_hash")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("text_hash").cast("bigint").alias(
                "n_distinct_texts"
            ),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .where("n_docs > 1")
    )


def sql_bow_dedup() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH base AS (SELECT doc_id, text FROM documents),
        aug AS (
            SELECT doc_id, text FROM base
            UNION ALL
            SELECT doc_id + {BOW_VARIANT_BASE} AS doc_id,
                   {_bow_variant(False)} AS text
            FROM base WHERE {h} % {BOW_INJECT_MOD} = 0
        ),
        hashed AS (
            SELECT doc_id,
                   {_bow_key(False)} AS bow_hash,
                   md5(text) AS text_hash
            FROM aug
        )
        SELECT bow_hash,
               COUNT(*)::BIGINT AS n_docs,
               COUNT(DISTINCT text_hash)::BIGINT AS n_distinct_texts,
               MIN(doc_id)::BIGINT AS keep_doc_id
        FROM hashed
        GROUP BY bow_hash
        HAVING COUNT(*) > 1
    """
