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


# ---------------------------------------------------------------------------
# de-hyphenation: PDF line-break hyphen repair
# ---------------------------------------------------------------------------
# PDF text extraction yields words split across line breaks as
# "exam- ple"; every PDF-corpus pipeline (including the pipelines that
# feed docling-style parsers) repairs them by merging a
# hyphen-terminated token with its successor. Same self-validating
# synthesis discipline as text_normalize: deterministically SPLIT every
# 7th token of length >= 5 into 'left- right', then repair — the
# repaired token stream must equal the original exactly (`recovered`),
# and the hyphenated stream must differ wherever a split was injected
# (`changed`). Injection guarantees no two adjacent splits, so the
# repair never chains (real corpora can chain across pages; the rule
# iterates there — one extra pass per chain depth).
#
# The repair is two LINEAR transforms over the token array (mark
# successors of a hyphen-token, merge, drop the hyphen-tokens) — no
# fold with an array accumulator (O(n^2) copying, the re-split trap
# SCALE.md documents). Zero shuffles; everything is per-row lambda
# expressions inside whole-stage codegen.

DEHYPH_EVERY = 7
DEHYPH_MIN_LEN = 5


def _hyph_split(duck: bool) -> str:
    """Token array with every DEHYPH_EVERY-th long token split into
    'xxx-' + 'yyy' (flattened)."""
    if duck:
        return (
            "flatten(list_transform(range(1, len(toks) + 1),"
            f" i -> CASE WHEN (i - 1) % {DEHYPH_EVERY} = 0"
            f"  AND len(toks[i]) >= {DEHYPH_MIN_LEN}"
            " THEN [toks[i][1:2] || '-', toks[i][3:]]"
            " ELSE [toks[i]] END))"
        )
    return (
        "flatten(transform(sequence(0, size(toks) - 1),"
        f" i -> CASE WHEN i % {DEHYPH_EVERY} = 0"
        f"  AND length(toks[i]) >= {DEHYPH_MIN_LEN}"
        " THEN array(concat(substring(toks[i], 1, 2), '-'),"
        " substring(toks[i], 3))"
        " ELSE array(toks[i]) END))"
    )


def _dehyph(duck: bool) -> str:
    """Linear repair over `hy`: merge 'xxx-' with the next token."""
    if duck:
        merged = (
            "list_transform(range(1, len(hy) + 1),"
            " i -> CASE WHEN hy[i][-1:] = '-' THEN NULL"
            " WHEN i > 1 AND hy[i - 1][-1:] = '-'"
            # DuckDB slice bounds are INCLUSIVE (unlike Python): [:-1]
            # keeps the final char, so drop-last is [:-2]
            " THEN hy[i - 1][:-2] || hy[i]"
            " ELSE hy[i] END)"
        )
        return f"list_filter({merged}, t -> t IS NOT NULL)"
    merged = (
        "transform(sequence(0, size(hy) - 1),"
        " i -> CASE WHEN substring(hy[i], -1) = '-' THEN NULL"
        " WHEN i > 0 AND substring(hy[i - 1], -1) = '-'"
        " THEN concat(substring(hy[i - 1], 1, length(hy[i - 1]) - 1),"
        " hy[i])"
        " ELSE hy[i] END)"
    )
    return f"filter({merged}, t -> t IS NOT NULL)"


def q_dehyphenate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import TOKENS_SPARK

    docs = read_spread(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.expr(TOKENS_SPARK).alias("toks")
    ).select(
        "doc_id", "toks", F.expr(_hyph_split(False)).alias("hy")
    ).select(
        "doc_id", "toks", "hy", F.expr(_dehyph(False)).alias("fixed")
    )
    return base.select(
        "doc_id",
        F.expr("cast(size(toks) as bigint)").alias("n_tokens"),
        F.expr("cast(size(hy) - size(toks) as bigint)").alias("n_splits"),
        F.expr("fixed = toks").alias("recovered"),
        F.expr("(size(hy) > size(toks)) = (hy != toks)").alias("changed_iff_split"),
        F.expr("md5(array_join(fixed, ' '))").alias("fixed_md5"),
    )


def sql_dehyphenate() -> str:
    from .textstats import TOKENS_DUCK

    return f"""
        WITH base AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        hyph AS (
            SELECT doc_id, toks, {_hyph_split(True)} AS hy FROM base
        ),
        fix AS (
            SELECT doc_id, toks, hy, {_dehyph(True)} AS fixed FROM hyph
        )
        SELECT doc_id,
               len(toks)::BIGINT AS n_tokens,
               (len(hy) - len(toks))::BIGINT AS n_splits,
               fixed = toks AS recovered,
               (len(hy) > len(toks)) = (hy != toks) AS changed_iff_split,
               md5(list_aggregate(list_transform(fixed, x -> x),
                   'string_agg', ' ')) AS fixed_md5
        FROM fix
    """
