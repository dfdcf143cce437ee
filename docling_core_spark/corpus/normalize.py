"""Text canonicalization — the normalization pass every exact-dedup
pipeline runs BEFORE hashing (C4/CCNet/RefinedWeb all hash a
canonical form, not raw bytes): case folding, accent stripping, curly
quote / long-dash normalization, quote removal, whitespace collapse.

The corpus text is already clean ASCII, so the operator synthesises a
MESSY observation of every document first (by doc_id % 4: unchanged,
UPPERCASED, accented vowels, curly-quoted + tab + doubled spaces) and
then canonicalizes it back — making the op self-validating: the
canonical form of the messy text must equal the canonical form of the
original (``recovered``), and the messy bytes must differ from the
original exactly where mess was injected (``changed``). The gate
hashes both booleans plus the canonical md5, so the two engines must
agree on every unicode mapping.

``normalize_uplift`` then quantifies what canonicalization buys exact
dedup: the duplicate-group census hashing the CANONICAL form vs
hashing the raw messy bytes — the extra dup mass a byte-exact dedup
misses. (Real corpora: case/quote/whitespace variants of the same
boilerplate are the biggest exact-dedup escape class.)

100 TB story: canonicalization is a zero-shuffle expression pipeline
(translate / regexp_replace / md5, whole-stage codegen); the uplift
query adds map-side-combined groupBys on uniform md5 keys whose
outputs are group-census-sized. No Python, no window, no corpus-wide
join.

Reference analog: none (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread

# accent fold (the set the messy classes inject plus the common
# western-European extras)
_ACCENT_FROM = "áàâäéèêëíìîïóòôöúùûüñç"
_ACCENT_TO = "aaaaeeeeiiiioooouuuunc"
# typographic fold: dashes -> '-', NBSP -> ' '; every quote variant
# (curly + straight) is REMOVED — translate() drops `from` chars past
# the end of `to` in BOTH engines
_TYPO_FROM = "–— “”‘’\"'"
_TYPO_TO = "-- "


def _canon(col: str, duck: bool) -> str:
    """Canonical form: lower, accent fold, typographic fold, whitespace
    collapse, trim. Identical call chain in both dialects."""
    e = f"lower({col})"
    e = f"translate({e}, '{_ACCENT_FROM}', '{_ACCENT_TO}')"
    tf = _TYPO_FROM.replace("'", "''")
    e = f"translate({e}, '{tf}', '{_TYPO_TO}')"
    ws = r"\s+" if duck else r"\\s+"
    flags = ", 'g'" if duck else ""
    e = f"trim(regexp_replace({e}, '{ws}', ' '{flags}))"
    return e


BOILER = (
    "We value your privacy. This site uses cookies to improve your "
    "experience - accept to continue."
)


def _base(duck: bool) -> str:
    """Every tenth document is a boilerplate interstitial (cookie
    notice) instead of its own content — the repeated-page mass that
    makes canonical-form dedup matter; the rest keep their text."""
    return f"CASE WHEN doc_id % 10 = 0 THEN '{BOILER}' ELSE text END"


def _messy(duck: bool) -> str:
    """The four deterministic mess classes over the base text;
    byte-identical output in both dialects."""
    cls = "(doc_id % 4)::INT" if duck else "cast(doc_id % 4 as int)"
    base = _base(duck)
    m2 = f"translate({base}, 'aeiou', 'áèîöü')"
    if duck:
        m3 = (f"'“' || replace({base}, ' ', '  ') || '”'"
              " || chr(9)")
    else:
        m3 = (f"concat('“', replace({base}, ' ', '  '), '”',"
              " chr(9))")
    return (f"CASE {cls} WHEN 0 THEN {base} WHEN 1 THEN upper({base})"
            f" WHEN 2 THEN {m2} ELSE {m3} END")


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(_messy(False)).alias("messy"),
        F.expr(_base(False)).alias("base"),
    ).select(
        "doc_id",
        F.md5(F.expr(_canon("messy", False))).alias("canon_md5"),
        F.expr("messy != base").alias("changed"),
        F.expr(
            f"{_canon('messy', False)} = {_canon('base', False)}"
        ).alias("recovered"),
    )


def sql_text_normalize() -> str:
    return f"""
        WITH m AS (
            SELECT doc_id, {_messy(True)} AS messy,
                   {_base(True)} AS base
            FROM documents
        )
        SELECT doc_id,
               md5({_canon("messy", True)}) AS canon_md5,
               messy <> base AS changed,
               {_canon("messy", True)} = {_canon("base", True)}
                   AS recovered
        FROM m
    """


def q_normalize_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dup-group census, raw-bytes hashing vs canonical hashing, per
    group size: canonical hashing must find at least as much duplicate
    mass (every raw-equal pair stays canonical-equal)."""
    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_messy(False)).alias("messy")
    )
    raw = (
        docs.groupBy(F.md5("messy").alias("h"))
        .count()
        .groupBy("count")
        .agg(F.count("*").cast("bigint").alias("n_groups_raw"))
        .withColumnRenamed("count", "group_size")
    )
    canon = (
        docs.groupBy(F.md5(F.expr(_canon("messy", False))).alias("h"))
        .count()
        .groupBy("count")
        .agg(F.count("*").cast("bigint").alias("n_groups_canon"))
        .withColumnRenamed("count", "group_size")
    )
    return (
        raw.join(canon, "group_size", "full")
        .select(
            F.col("group_size").cast("bigint").alias("group_size"),
            F.coalesce("n_groups_raw", F.lit(0)).alias("n_groups_raw"),
            F.coalesce("n_groups_canon", F.lit(0)).alias(
                "n_groups_canon"
            ),
        )
    )


def sql_normalize_uplift() -> str:
    return f"""
        WITH m AS (
            SELECT doc_id, {_messy(True)} AS messy FROM documents
        ),
        raw AS (
            SELECT cnt AS group_size, COUNT(*)::BIGINT AS n_groups_raw
            FROM (SELECT md5(messy) h, COUNT(*) cnt FROM m GROUP BY 1)
            GROUP BY cnt
        ),
        canon AS (
            SELECT cnt AS group_size, COUNT(*)::BIGINT AS n_groups_canon
            FROM (SELECT md5({_canon("messy", True)}) h, COUNT(*) cnt
                  FROM m GROUP BY 1)
            GROUP BY cnt
        )
        SELECT COALESCE(raw.group_size, canon.group_size)::BIGINT
                   AS group_size,
               COALESCE(n_groups_raw, 0) AS n_groups_raw,
               COALESCE(n_groups_canon, 0) AS n_groups_canon
        FROM raw FULL JOIN canon USING (group_size)
    """
