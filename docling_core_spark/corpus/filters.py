"""Corpus filter operators for training-data curation: Gopher-style
quality rules, duplicate-n-gram repetition stats, and PII scrubbing.

Spark side is pure JVM expressions / built-in DataFrame ops (whole-stage
codegen; zero Python UDFs); each op ships a DuckDB oracle built from the
same constants so the correctness gate checks both engines bit-for-bit.

Reference analog: docling-core has no corpus curation (SURVEY.md §2's
training-data extension surface). Rule semantics follow the public
Gopher data-quality recipe (Rae et al. 2021, "Scaling Language Models",
appendix A1.1) adapted to word-level signals — this corpus is
single-line text, so the line-shape rules (bullet/ellipsis lines) are
inapplicable and the word-level ladder is implemented in full. PII
patterns follow the public BigScience/ROOTS scrubbing recipe (regex
email/IPv4/phone redaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import constants as C, read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK, _spark_re

# ---------------------------------------------------------------------------
# Gopher word-level quality rules (public thresholds)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1     # '#' or '...' per word
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8  # words containing >= 1 [a-z]
GOPHER_MIN_STOPWORD_HITS = 2      # distinct required stopwords present

# the 'required words' set: Gopher uses {the, be, to, of, and, that,
# have, with}; we use the overlap with the engine's stopword list so
# both dialects share one constant source
GOPHER_REQUIRED = [w for w in C.STOPWORDS["en"] if w in
                   ("the", "to", "of", "and", "that", "for", "is", "was")]


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule signals, one boolean per rule, and the
    AND'd keep decision. Zero shuffles: narrow per-row expressions over
    a pruned (doc_id, text) scan."""
    docs = read_spread(spark, sf_dir, "documents")
    req = "array(" + ", ".join(f"'{w}'" for w in GOPHER_REQUIRED) + ")"
    base = docs.select(
        "doc_id",
        F.expr(f"size({TOKENS_SPARK})").alias("n_words"),
        F.expr(
            f"aggregate(transform({TOKENS_SPARK}, t -> length(t)),"
            f" 0, (acc, x) -> acc + x)"
        ).alias("sum_word_len"),
        F.expr(
            "(length(text) - length(replace(text, '#', '')))"
            " + (length(text) - length(replace(text, '...', ''))) div 3"
        ).alias("n_symbols"),
        F.expr(
            f"size(filter({TOKENS_SPARK}, t -> t rlike '[a-z]'))"
        ).alias("n_alpha_words"),
        F.expr(
            f"size(filter({req}, w -> array_contains({TOKENS_SPARK}, w)))"
        ).alias("n_required_hits"),
    )
    mean_len = "round(sum_word_len / cast(n_words as double), 6)"
    sym = "round(n_symbols / cast(n_words as double), 6)"
    alpha = "round(n_alpha_words / cast(n_words as double), 6)"
    rules = {
        "r_word_count": (
            f"n_words >= {GOPHER_MIN_WORDS}"
            f" AND n_words <= {GOPHER_MAX_WORDS}"
        ),
        "r_mean_word_len": (
            f"{mean_len} >= {GOPHER_MIN_MEAN_WORD_LEN}"
            f" AND {mean_len} <= {GOPHER_MAX_MEAN_WORD_LEN}"
        ),
        "r_symbol_ratio": f"{sym} <= {GOPHER_MAX_SYMBOL_RATIO}",
        "r_alpha_words": f"{alpha} >= {GOPHER_MIN_ALPHA_WORD_FRAC}",
        "r_stopwords": f"n_required_hits >= {GOPHER_MIN_STOPWORD_HITS}",
    }
    return base.select(
        "doc_id",
        "n_words",
        F.expr(mean_len).alias("mean_word_len"),
        F.expr(sym).alias("symbol_ratio"),
        F.expr(alpha).alias("alpha_word_frac"),
        "n_required_hits",
        *[F.expr(e).alias(name) for name, e in rules.items()],
        F.expr(" AND ".join(f"({e})" for e in rules.values())).alias(
            "keep"
        ),
    )


def sql_gopher_quality() -> str:
    req = "[" + ", ".join(f"'{w}'" for w in GOPHER_REQUIRED) + "]"
    mean_len = "round(sum_word_len / n_words::DOUBLE, 6)"
    sym = "round(n_symbols / n_words::DOUBLE, 6)"
    alpha = "round(n_alpha_words / n_words::DOUBLE, 6)"
    rules = {
        "r_word_count": (
            f"n_words >= {GOPHER_MIN_WORDS}"
            f" AND n_words <= {GOPHER_MAX_WORDS}"
        ),
        "r_mean_word_len": (
            f"{mean_len} >= {GOPHER_MIN_MEAN_WORD_LEN}"
            f" AND {mean_len} <= {GOPHER_MAX_MEAN_WORD_LEN}"
        ),
        "r_symbol_ratio": f"{sym} <= {GOPHER_MAX_SYMBOL_RATIO}",
        "r_alpha_words": f"{alpha} >= {GOPHER_MIN_ALPHA_WORD_FRAC}",
        "r_stopwords": f"n_required_hits >= {GOPHER_MIN_STOPWORD_HITS}",
    }
    rule_cols = ",\n               ".join(
        f"{e} AS {name}" for name, e in rules.items()
    )
    keep = " AND ".join(f"({e})" for e in rules.values())
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len({TOKENS_DUCK}) AS n_words,
                   list_sum(list_transform({TOKENS_DUCK},
                            t -> length(t)))::BIGINT AS sum_word_len,
                   (length(text) - length(replace(text, '#', '')))
                     + (length(text) - length(replace(text, '...', '')))
                       // 3 AS n_symbols,
                   len(list_filter({TOKENS_DUCK},
                       t -> regexp_matches(t, '[a-z]'))) AS n_alpha_words,
                   len(list_filter({req},
                       w -> list_contains({TOKENS_DUCK}, w)))
                       AS n_required_hits
            FROM documents
        )
        SELECT doc_id, n_words,
               {mean_len} AS mean_word_len,
               {sym} AS symbol_ratio,
               {alpha} AS alpha_word_frac,
               n_required_hits,
               {rule_cols},
               {keep} AS keep
        FROM base
    """


# ---------------------------------------------------------------------------
# duplicate-n-gram repetition stats (Gopher repetition ladder, bigrams)
# ---------------------------------------------------------------------------

def q_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram repetition: total bigrams, the modal bigram's
    share, and the fraction of bigram mass in duplicated bigrams —
    Gopher's top-n-gram / dup-n-gram rules at n=2.

    Two shuffles, both on uniform keys: groupBy (doc_id, gram) — gram
    cardinality is huge so no hot keys — then groupBy doc_id. A left
    join from the corpus covers <2-token documents with zero rows."""
    docs = read_spread(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr(TOKENS_SPARK).alias("toks")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(toks) >= 2 then"
                " transform(sequence(1, size(toks) - 1),"
                "   i -> concat(element_at(toks, i), ' ',"
                "               element_at(toks, i + 1)))"
                " else array() end"
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(
        F.count("*").alias("cnt")
    )
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.max("cnt").alias("top_bigram_n"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
            "dup_mass"
        ),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
            F.expr(
                "case when n_bigrams > 0 then"
                " round(top_bigram_n / cast(n_bigrams as double), 6)"
                " else cast(0.0 as double) end"
            ).alias("top_bigram_frac"),
            F.expr(
                "case when n_bigrams > 0 then"
                " round(coalesce(dup_mass, 0)"
                "       / cast(n_bigrams as double), 6)"
                " else cast(0.0 as double) end"
            ).alias("dup_bigram_frac"),
        )
    )


def sql_dup_ngrams() -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        grams AS (
            SELECT doc_id, unnest(list_transform(
                       range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS gram
            FROM toks
        ),
        per_gram AS (
            SELECT doc_id, gram, COUNT(*) AS cnt
            FROM grams GROUP BY doc_id, gram
        ),
        per_doc AS (
            SELECT doc_id,
                   SUM(cnt)::BIGINT AS n_bigrams,
                   MAX(cnt)::BIGINT AS top_bigram_n,
                   SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::BIGINT
                       AS dup_mass
            FROM per_gram GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_bigrams, 0) AS n_bigrams,
               COALESCE(p.top_bigram_n, 0) AS top_bigram_n,
               CASE WHEN COALESCE(p.n_bigrams, 0) > 0 THEN
                   round(p.top_bigram_n / p.n_bigrams::DOUBLE, 6)
               ELSE 0.0 END AS top_bigram_frac,
               CASE WHEN COALESCE(p.n_bigrams, 0) > 0 THEN
                   round(COALESCE(p.dup_mass, 0) / p.n_bigrams::DOUBLE, 6)
               ELSE 0.0 END AS dup_bigram_frac
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


# ---------------------------------------------------------------------------
# PII scrubbing (email / IPv4 / phone redaction)
# ---------------------------------------------------------------------------

# patterns restricted to syntax with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): no backrefs, no lookaround
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"
_PII = [("email", PII_EMAIL, "<EMAIL>"), ("ipv4", PII_IPV4, "<IP>"),
        ("phone", PII_PHONE, "<PHONE>")]


def scrub_expr_spark(col: str) -> str:
    """Nested regexp_replace applying all three redactions; phone/IP
    before email is irrelevant here because the patterns are disjoint
    (an IPv4 inside an email-like token fails \\b)."""
    e = col
    for _, pat, tag in _PII:
        e = f"regexp_replace({e}, '{_spark_re(pat)}', '{tag}')"
    return e


def scrub_expr_duck(col: str) -> str:
    e = col
    for _, pat, tag in _PII:
        e = f"regexp_replace({e}, '{pat}', '{tag}', 'g')"
    return e


_CODE_PUNCT_RE = r"[{}();=\[\]<>]"


def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document code-vs-prose signals and the routing decision —
    the cheap pre-filter every mixed web corpus runs before tokenizer
    / dedup-granularity / quality rules diverge for code: code
    punctuation density (ppm), code-keyword token hits, structurally
    indented line fraction (ppm), and the AND/OR routing rule from
    constants.py. The synthetic corpus is prose, so is_code is false
    throughout at gate scale; the signals and rule are exercised on
    crafted code fixtures in tests/test_filters.py.

    100 TB story: zero shuffles — every signal is a narrow per-row
    regex/array expression over a pruned (doc_id, text) scan, exactly
    the gopher_quality shape."""
    docs = read_spread(spark, sf_dir, "documents")
    kw = "array(" + ", ".join(f"'{w}'" for w in C.CODE_KEYWORDS) + ")"
    base = docs.select(
        "doc_id",
        F.expr("greatest(length(text), 1)").alias("n_chars"),
        F.expr(
            f"size(regexp_extract_all(text,"
            f" '{_spark_re(_CODE_PUNCT_RE)}', 0))"
        ).alias("n_code_punct"),
        F.expr(
            f"size(filter({TOKENS_SPARK},"
            f" t -> array_contains({kw}, t)))"
        ).alias("kw_hits"),
        F.expr(r"greatest(size(split(text, '\n')), 1)").alias(
            "n_lines"
        ),
        F.expr(
            r"size(filter(split(text, '\n'),"
            r" l -> l rlike '^(\\s\\s|\\t)'))"
        ).alias("n_indent_lines"),
    )
    return base.select(
        "doc_id",
        F.col("n_code_punct").cast("bigint").alias("n_code_punct"),
        F.col("kw_hits").cast("bigint").alias("kw_hits"),
        F.expr("cast((n_code_punct * 1000000) div n_chars as bigint)")
        .alias("sym_ppm"),
        F.expr(
            "cast((n_indent_lines * 1000000) div n_lines as bigint)"
        ).alias("indent_ppm"),
        F.expr(
            f"((n_code_punct * 1000000) div n_chars"
            f" >= {C.CODE_SYM_PPM_MIN}"
            f" AND kw_hits >= {C.CODE_KW_HITS_MIN})"
            f" OR (n_indent_lines * 1000000) div n_lines"
            f" >= {C.CODE_INDENT_PPM_MIN}"
        ).alias("is_code"),
    )


def sql_code_detect() -> str:
    kw = "[" + ", ".join(f"'{w}'" for w in C.CODE_KEYWORDS) + "]"
    return f"""
        WITH base AS (
            SELECT doc_id,
                   greatest(len(text), 1) AS n_chars,
                   len(regexp_extract_all(text, '{_CODE_PUNCT_RE}'))
                       AS n_code_punct,
                   len(list_filter({TOKENS_DUCK},
                       t -> list_contains({kw}, t))) AS kw_hits,
                   greatest(len(string_split(text, chr(10))), 1)
                       AS n_lines,
                   len(list_filter(string_split(text, chr(10)),
                       l -> regexp_matches(l, '^(\\s\\s|\\t)')))
                       AS n_indent_lines
            FROM documents
        )
        SELECT doc_id,
               n_code_punct::BIGINT AS n_code_punct,
               kw_hits::BIGINT AS kw_hits,
               ((n_code_punct * 1000000) // n_chars)::BIGINT AS sym_ppm,
               ((n_indent_lines * 1000000) // n_lines)::BIGINT
                   AS indent_ppm,
               (((n_code_punct * 1000000) // n_chars
                     >= {C.CODE_SYM_PPM_MIN}
                 AND kw_hits >= {C.CODE_KW_HITS_MIN})
                OR (n_indent_lines * 1000000) // n_lines
                     >= {C.CODE_INDENT_PPM_MIN}) AS is_code
        FROM base
    """


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction counts per category plus the md5 of the scrubbed text —
    the gate proves the two engines' regex stacks redact identically.
    Zero shuffles; the scrub itself is the column a production run
    writes back. The synthetic corpus contains no PII (every count is
    0 and scrub_md5 == md5(text)) — the redaction behavior itself is
    pytest-asserted on crafted fixtures (tests/test_filters.py)."""
    docs = read_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        *[
            F.expr(
                f"size(regexp_extract_all(text, '{_spark_re(pat)}', 0))"
            ).alias(f"n_{name}")
            for name, pat, _ in _PII
        ],
        F.expr(
            f"md5(encode({scrub_expr_spark('text')}, 'utf-8'))"
        ).alias("scrub_md5"),
    )


def sql_pii_scrub() -> str:
    counts = ",\n               ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in _PII
    )
    return f"""
        SELECT doc_id,
               {counts},
               md5({scrub_expr_duck('text')}) AS scrub_md5
        FROM documents
    """

# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out eval set)
# ---------------------------------------------------------------------------

# Word-level n-gram size: the public decontamination recipes use 8-13
# grams (GPT-3 appendix C uses 13-grams, Gopher/MassiveText 8-grams; we
# follow the 8-gram variant). The "eval set" here is a deterministic
# pseudo-benchmark carved out of the corpus itself: doc_id % DECON_MOD ==
# DECON_RESIDUE (~1% of docs) — in production it would be the real
# benchmark suites, which are similarly tiny next to a 100 TB corpus.
DECON_NGRAM = 8
DECON_MOD = 97
DECON_RESIDUE = 13

_DECON_EVAL_PRED = f"doc_id % {DECON_MOD} = {DECON_RESIDUE}"


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing any word-level 8-gram with the eval
    set (contamination), with per-doc hit counts.

    100 TB story: the eval side is benchmark-sized (thousands of docs)
    regardless of corpus scale, so its distinct-gram table is broadcast
    — the training side never shuffles its exploded grams; the only
    wide exchange is the final per-doc aggregation on uniform doc_id.
    Eval docs are excluded from the output (they trivially self-match)."""
    n = DECON_NGRAM
    docs = read_spread(spark, sf_dir, "documents")
    gram_expr = (
        f"case when size(toks) >= {n} then"
        f" transform(sequence(1, size(toks) - {n - 1}),"
        f"   i -> concat_ws(' ', slice(toks, i, {n})))"
        f" else array() end"
    )
    toks = docs.select(
        "doc_id", F.expr(TOKENS_SPARK).alias("toks")
    )
    eval_grams = (
        toks.where(_DECON_EVAL_PRED)
        .select(F.explode(F.expr(gram_expr)).alias("gram"))
        .distinct()
    )
    train_toks = toks.where(f"NOT ({_DECON_EVAL_PRED})")
    train = train_toks.select(
        "doc_id", F.explode(F.expr(gram_expr)).alias("gram")
    )
    hits = (
        train.join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hit_grams"))
    )
    # per-doc gram counts come from the un-exploded token table — no
    # second pass over the exploded gram rows
    sizes = train_toks.select(
        "doc_id", F.expr(f"size({gram_expr})").alias("n_grams")
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).cast("bigint").alias(
                "n_hit_grams"
            ),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def sql_decontaminate() -> str:
    n = DECON_NGRAM
    return f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        gr AS (
            SELECT doc_id, len(toks) AS n_toks,
                   CASE WHEN len(toks) >= {n} THEN
                       list_transform(range(1, len(toks) - {n - 2}),
                           i -> array_to_string(toks[i:i + {n - 1}], ' '))
                   ELSE [] END AS grams
            FROM toks
        ),
        eval_grams AS (
            SELECT DISTINCT unnest(grams) AS gram
            FROM gr WHERE {_DECON_EVAL_PRED}
        ),
        train AS (
            SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
            FROM gr WHERE NOT ({_DECON_EVAL_PRED})
        ),
        hits AS (
            SELECT t.doc_id, COUNT(DISTINCT t.gram) AS n_hit_grams
            FROM train t
            WHERE t.gram IN (SELECT gram FROM eval_grams)
            GROUP BY t.doc_id
        ),
        sizes AS (
            SELECT doc_id, len(grams) AS n_grams
            FROM gr WHERE NOT ({_DECON_EVAL_PRED})
        )
        SELECT s.doc_id,
               COALESCE(s.n_grams, 0)::BIGINT AS n_grams,
               COALESCE(h.n_hit_grams, 0)::BIGINT AS n_hit_grams,
               COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
        FROM sizes s
        LEFT JOIN hits h USING (doc_id)
    """


# ---------------------------------------------------------------------------
# Bloom-filter decontamination probe
# ---------------------------------------------------------------------------

# The sketch path of `decontaminate`: instead of broadcasting the eval
# set's distinct 8-grams (which grows with the benchmark suite), build a
# BLOOM_M-bit Bloom filter over them (BLOOM_D universal hashes) and
# probe every training gram against it. At 100 TB the filter is a fixed
# BLOOM_M/8-byte broadcast no matter how many eval grams exist, and a
# probe is BLOOM_D arithmetic ops + O(1) lookups — no join against the
# gram table at all. Bloom guarantees zero false negatives; the report
# carries the exact join alongside so the gate verifies both the
# soundness invariant (every exact hit is a bloom hit) and the measured
# false-positive mass. Geometry: m/n ~ 16384/~3.5k eval grams at the
# bench sf, k=4 -> expected fp rate ~ (1 - e^(-kn/m))^4 ~ 0.1 (visible
# FP mass by design; production would size m/n ~ 10-15 per key).
#
# The filter is represented as a BLOOM_M-char '0'/'1' string and probed
# with substring() — plain codegen'd string indexing. The first cut
# carried a sorted positions ARRAY probed via forall(array_contains):
# higher-order-function lambdas are interpreted, not codegen'd, and at
# ~7k set bits that probe measured ~140x slower than this bitmap
# (4 minutes vs seconds over ~340k grams at sf0.1).
BLOOM_M = 16384
BLOOM_D = 4


def _gen_bloom_params():
    g = C._lcg(20260817)
    out = []
    for _ in range(BLOOM_D):
        a = (next(g) % (C.H30_MOD - 1)) | 1
        b = next(g) % C.H30_MOD
        out.append((a, b))
    return out


BLOOM_PARAMS = _gen_bloom_params()


def _bloom_pos(d: int, h: str) -> str:
    """Bit position of hash expr `h` under hash function d — valid in
    both dialects. Inner modulus MUST be the prime MINHASH_P: BLOOM_M
    divides H30_MOD, so reducing mod 2^30 then mod BLOOM_M would make
    all D rows functions of (h % BLOOM_M) and kill the independence."""
    a, b = BLOOM_PARAMS[d]
    return f"((({a} * {h} + {b}) % {C.MINHASH_P}) % {BLOOM_M})"


def _decon_gram_expr_spark() -> str:
    n = DECON_NGRAM
    return (
        f"case when size(toks) >= {n} then"
        f" transform(sequence(1, size(toks) - {n - 1}),"
        f"   i -> concat_ws(' ', slice(toks, i, {n})))"
        f" else array() end"
    )


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-training-doc Bloom probe vs the exact eval-gram join: n_grams,
    bloom-positive distinct grams, exact distinct hits, the
    false-positive surplus, and the zero-false-negative soundness bit.

    100 TB story: the filter is built once from the benchmark-sized eval
    side and crossed in as ONE bitmap-string row (the BLOOM_M-bit bitset
    a production run would broadcast); the training scan stays narrow,
    the probe is BLOOM_D multiply-adds + O(1) substring lookups per gram
    (whole-stage codegen — no lambda, no array scan), and the only wide
    exchange is the per-doc aggregation. The exact join rides along only
    as the report's ground truth."""
    from .textstats import _h30_spark

    n = DECON_NGRAM
    docs = read_spread(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.expr(TOKENS_SPARK).alias("toks"))
    gram_expr = _decon_gram_expr_spark()
    eval_grams = (
        toks.where(_DECON_EVAL_PRED)
        .select(F.explode(F.expr(gram_expr)).alias("gram"))
        .distinct()
    )
    pos_list = ", ".join(
        _bloom_pos(d, _h30_spark("gram")) for d in range(BLOOM_D)
    )
    # '0'/'1' bitmap built from the sorted set-bit positions by emitting
    # the zero-gap before each set bit, then the tail zeros
    gap = (
        "transform(sequence(1, size(ps)), i -> concat(repeat('0',"
        " cast(element_at(ps, i) - (case when i = 1 then -1L"
        " else element_at(ps, i - 1) end) - 1 as int)), '1'))"
    )
    bitmap = (
        f"case when size(ps) = 0 then repeat('0', {BLOOM_M})"
        f" else concat(concat_ws('', {gap}), repeat('0',"
        f" cast({BLOOM_M} - 1 - element_at(ps, -1) as int))) end"
    )
    bits = eval_grams.select(
        F.explode(F.expr(f"array({pos_list})")).alias("pos")
    ).distinct().agg(
        F.expr("sort_array(collect_list(pos))").alias("ps")
    ).select(F.expr(bitmap).alias("bitmap"))
    # h materialized INSIDE the generator row (named_struct in the
    # exploded transform): projections after a generate are collapsed
    # and would otherwise inline the md5 chain once per probe
    train = (
        toks.where(f"NOT ({_DECON_EVAL_PRED})")
        .select("doc_id", F.explode(F.expr(
            f"transform({gram_expr}, g -> named_struct("
            f"'gram', g, 'h', {_h30_spark('g')}))"
        )).alias("gh"))
        .select("doc_id", F.col("gh.gram").alias("gram"),
                F.col("gh.h").alias("h"))
    )
    probe_pred = " AND ".join(
        f"substring(bitmap, cast({_bloom_pos(d, 'h')} as int) + 1, 1)"
        " = '1'"
        for d in range(BLOOM_D)
    )
    probed = train.crossJoin(F.broadcast(bits)).select(
        "doc_id", "gram",
        F.expr(probe_pred).alias("bloom_hit"),
    )
    # eval_grams is distinct, so this broadcast join marks rows without
    # multiplying them — the exact ground truth rides the same scan
    marker = eval_grams.withColumn("exact_hit", F.lit(True))
    per_doc = (
        probed.join(F.broadcast(marker), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").cast("bigint").alias("n_grams"),
            F.countDistinct(F.when(F.col("bloom_hit"), F.col("gram")))
            .cast("bigint").alias("n_bloom_hits"),
            F.countDistinct(F.when(F.col("exact_hit"), F.col("gram")))
            .cast("bigint").alias("n_exact_hits"),
        )
    )
    return per_doc.select(
        "doc_id", "n_grams", "n_bloom_hits", "n_exact_hits",
        (F.col("n_bloom_hits") - F.col("n_exact_hits"))
        .cast("bigint").alias("n_false_positives"),
        (F.col("n_bloom_hits") >= F.col("n_exact_hits")).alias("sound"),
    )


def sql_bloom_decontaminate() -> str:
    from .textstats import _h30_duck

    n = DECON_NGRAM
    h = _h30_duck("gram")
    pos_list = ", ".join(_bloom_pos(d, h) for d in range(BLOOM_D))
    return f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        gr AS (
            SELECT doc_id,
                   CASE WHEN len(toks) >= {n} THEN
                       list_transform(range(1, len(toks) - {n - 2}),
                           i -> array_to_string(toks[i:i + {n - 1}], ' '))
                   ELSE [] END AS grams
            FROM toks
        ),
        eval_grams AS (
            SELECT DISTINCT unnest(grams) AS gram
            FROM gr WHERE {_DECON_EVAL_PRED}
        ),
        posarr AS (
            SELECT list_sort(list(DISTINCT pos)) AS ps FROM (
                SELECT unnest([{pos_list}]) AS pos FROM eval_grams
            )
        ),
        bits AS (
            SELECT CASE WHEN len(ps) = 0 THEN repeat('0', {BLOOM_M})
                   ELSE array_to_string(
                            list_transform(range(1, len(ps) + 1),
                                i -> repeat('0', (ps[i] -
                                    (CASE WHEN i = 1 THEN -1
                                     ELSE ps[i - 1] END) - 1)::INT)
                                    || '1'),
                            '')
                        || repeat('0',
                                  ({BLOOM_M} - 1 - ps[len(ps)])::INT)
                   END AS bitmap
            FROM posarr
        ),
        train AS (
            SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id, unnest(grams) AS gram
                FROM gr WHERE NOT ({_DECON_EVAL_PRED})
            )
        ),
        probed AS (
            SELECT doc_id, gram,
                   {" AND ".join(
                       f"substring(bitmap, ({_bloom_pos(d, h)})::INT + 1,"
                       " 1) = '1'"
                       for d in range(BLOOM_D)
                   )} AS bloom_hit,
                   gram IN (SELECT gram FROM eval_grams) AS exact_hit
            FROM train, bits
        )
        SELECT doc_id,
               COUNT(*)::BIGINT AS n_grams,
               COUNT(*) FILTER (bloom_hit)::BIGINT AS n_bloom_hits,
               COUNT(*) FILTER (exact_hit)::BIGINT AS n_exact_hits,
               (COUNT(*) FILTER (bloom_hit)
                - COUNT(*) FILTER (exact_hit))::BIGINT
                   AS n_false_positives,
               COUNT(*) FILTER (bloom_hit)
                   >= COUNT(*) FILTER (exact_hit) AS sound
        FROM probed
        GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# full Gopher repetition ladder (top n-grams 2-4, duplicate n-grams 5-6)
# ---------------------------------------------------------------------------

# Public thresholds from Rae et al. 2021 (table A1): top-n-gram char
# fraction caps for n=2..4 and duplicate-n-gram char fraction caps for
# n=5,6 (the paper's ladder continues to n=10 with caps 0.13..0.10;
# this corpus' documents are <=~120 tokens so n>6 rungs are all-zero
# and add nothing but expression width).
REP_TOP_THRESH = {2: 0.20, 3: 0.18, 4: 0.16}
REP_DUP_THRESH = {5: 0.15, 6: 0.14}


def _rep_grams_spark(n: int) -> str:
    return (
        f"case when size(toks) >= {n} then"
        f" transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> concat_ws(' ', slice(toks, i, {n})))"
        " else cast(array() as array<string>) end"
    )


def _rep_grams_duck(n: int) -> str:
    return (
        f"CASE WHEN len(toks) >= {n} THEN"
        f" list_transform(range(1, len(toks) - {n - 2}),"
        f" i -> array_to_string(toks[i:i + {n - 1}], ' '))"
        " ELSE []::VARCHAR[] END"
    )


def q_repetition_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher repetition ladder, in full (Rae et al. 2021
    A1.1): for n in {2,3,4} the fraction of token characters claimed by
    the MOST FREQUENT n-gram (count x the gram's token chars / total
    token chars); for n in {5,6} the fraction of token characters
    COVERED by any duplicated n-gram, counting each covered token once
    even when overlapping duplicated grams claim it repeatedly — the
    paper's "taking care not to count characters ... more than once"
    rule, which `dup_ngrams`' mass ratio deliberately simplifies away.

    Ties for the modal gram break to the lexicographically smallest
    gram (both engines sort ASCII byte-wise), making the char count
    deterministic. The count x gram-chars product is capped at 1.0 of
    the doc's chars: overlapping occurrences of the modal gram (e.g. a
    doc that IS one phrase repeated) otherwise claim more characters
    than the document has.

    100 TB story: ZERO shuffles — the whole ladder is array lambdas
    (transform/filter/exists/aggregate) inside one codegen stage over a
    pruned (doc_id, text) scan. Per-row cost is O(G^2) in the gram
    count G of one document, the classic per-doc in-memory formulation
    every public Gopher implementation uses; for a long-document corpus
    (G >~ 10^3) the groupBy(doc_id, gram) form `dup_ngrams` uses is the
    shuffle-paying fallback. No join, no window, no Python."""
    docs = read_spread(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        F.expr(TOKENS_SPARK).alias("toks"),
    ).select(
        "doc_id",
        F.expr("size(toks)").alias("n_tokens"),
        F.expr(
            "aggregate(toks, 0, (acc, t) -> acc + length(t))"
        ).alias("tot_chars"),
        "toks",
        *[
            F.expr(_rep_grams_spark(n)).alias(f"g{n}")
            for n in (*REP_TOP_THRESH, *REP_DUP_THRESH)
        ],
    )
    # modal-gram rungs: count of the most frequent n-gram, then its
    # token-char mass (gram length minus the n-1 joining spaces)
    for n in REP_TOP_THRESH:
        out = out.withColumn(
            f"topcnt{n}",
            F.expr(
                f"coalesce(array_max(transform(g{n},"
                f" x -> size(filter(g{n}, y -> y = x)))), 0)"
            ),
        ).withColumn(
            f"topchars{n}",
            F.expr(
                f"case when topcnt{n} = 0 then 0 else"
                f" topcnt{n} * (length(element_at(array_sort("
                f"   filter(g{n}, x -> size(filter(g{n}, y -> y = x))"
                f"     = topcnt{n})), 1)) - {n - 1}) end"
            ),
        )
    # duplicate-gram rungs: token positions covered by any gram value
    # occurring >= 2x in the doc, each position's chars counted once.
    # The duplicated-position array is the FIRST ARGUMENT of the fold,
    # so it is evaluated once per row even after projection collapse
    # (as a column reference inside the lambda it would re-run the
    # O(G^2) scan per token); the fold then merges the [i, i+n-1]
    # coverage intervals left to right, summing each token's chars the
    # first time an interval claims it — O(|dup positions| x n) after
    # the single O(G^2) scan, and free for the dup-free common case.
    for n in REP_DUP_THRESH:
        a = "greatest(i, acc.ce + 1)"          # first uncovered pos
        b = f"i + {n - 1}"                     # interval end
        out = out.withColumn(
            f"dupchars{n}",
            F.expr(
                f"aggregate("
                f" filter("
                f"   if(size(g{n}) = 0, cast(array() as array<int>),"
                f"      sequence(1, size(g{n}))),"
                f"   i -> size(filter(g{n},"
                f"          y -> y = element_at(g{n}, i))) >= 2),"
                f" named_struct('ch', 0, 'ce', 0),"
                f" (acc, i) -> named_struct("
                f"   'ch', acc.ch + if({b} >= {a},"
                f"     aggregate(slice(toks, {a}, {b} - ({a}) + 1), 0,"
                f"       (c, t) -> c + length(t)), 0),"
                f"   'ce', greatest(acc.ce, {b})),"
                f" acc -> acc.ch)"
            ),
        )
    frac_cols = []
    for n in REP_TOP_THRESH:
        frac_cols.append(
            F.expr(
                f"case when tot_chars > 0 then"
                f" round(least(1.0, topchars{n}"
                f" / cast(tot_chars as double)), 6)"
                f" else cast(0.0 as double) end"
            ).alias(f"top_frac_{n}")
        )
    for n in REP_DUP_THRESH:
        frac_cols.append(
            F.expr(
                f"case when tot_chars > 0 then"
                f" round(dupchars{n} / cast(tot_chars as double), 6)"
                f" else cast(0.0 as double) end"
            ).alias(f"dup_frac_{n}")
        )
    keep = " and ".join(
        [f"top_frac_{n} <= {t}" for n, t in REP_TOP_THRESH.items()]
        + [f"dup_frac_{n} <= {t}" for n, t in REP_DUP_THRESH.items()]
    )
    return out.select("doc_id", "n_tokens", "tot_chars", *frac_cols).select(
        "*", F.expr(keep).alias("keep")
    )


def sql_repetition_ladder() -> str:
    gram_cols = ",\n                   ".join(
        f"{_rep_grams_duck(n)} AS g{n}"
        for n in (*REP_TOP_THRESH, *REP_DUP_THRESH)
    )
    top_cols = []
    for n in REP_TOP_THRESH:
        top_cols.append(
            f"coalesce(list_max(list_transform(g{n},"
            f" x -> len(list_filter(g{n}, y -> y = x)))), 0)"
            f" AS topcnt{n}"
        )
    # dp{n} is hoisted into its own CTE column so the O(G^2) scan runs
    # once per row; the per-token membership test then reads the list
    # value (DuckDB materializes projection columns, so no recompute)
    dp_cols = [
        f"""list_filter(generate_series(1, len(g{n})),
                i -> len(list_filter(g{n}, y -> y = g{n}[i])) >= 2)
            AS dp{n}"""
        for n in REP_DUP_THRESH
    ]
    dup_cols = []
    for n in REP_DUP_THRESH:
        dup_cols.append(
            f"""coalesce(list_sum(list_transform(
                   generate_series(1, len(toks)),
                   t -> CASE WHEN len(list_filter(dp{n},
                       i -> i <= t AND t <= i + {n - 1})) > 0
                   THEN len(toks[t]) ELSE 0 END)), 0)::BIGINT
                AS dupchars{n}"""
        )
    topchar_cols = []
    for n in REP_TOP_THRESH:
        topchar_cols.append(
            f"""CASE WHEN topcnt{n} = 0 THEN 0 ELSE
                topcnt{n} * (len((list_sort(list_filter(g{n},
                    x -> len(list_filter(g{n}, y -> y = x))
                         = topcnt{n})))[1]) - {n - 1}) END
                AS topchars{n}"""
        )
    fracs = []
    for n in REP_TOP_THRESH:
        fracs.append(
            f"CASE WHEN tot_chars > 0 THEN"
            f" round(least(1.0, topchars{n} / tot_chars::DOUBLE), 6)"
            f" ELSE 0.0 END AS top_frac_{n}"
        )
    for n in REP_DUP_THRESH:
        fracs.append(
            f"CASE WHEN tot_chars > 0 THEN"
            f" round(dupchars{n} / tot_chars::DOUBLE, 6)"
            f" ELSE 0.0 END AS dup_frac_{n}"
        )
    keep = " AND ".join(
        [f"top_frac_{n} <= {t}" for n, t in REP_TOP_THRESH.items()]
        + [f"dup_frac_{n} <= {t}" for n, t in REP_DUP_THRESH.items()]
    )
    return f"""
        WITH toks AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        gr AS (
            SELECT doc_id, toks,
                   len(toks) AS n_tokens,
                   coalesce(list_sum(list_transform(toks,
                       t -> len(t))), 0)::BIGINT AS tot_chars,
                   {gram_cols}
            FROM toks
        ),
        dps AS (
            SELECT *, {", ".join(dp_cols)} FROM gr
        ),
        cnts AS (
            SELECT *, {", ".join(top_cols)}, {", ".join(dup_cols)}
            FROM dps
        ),
        chars AS (
            SELECT *, {", ".join(topchar_cols)} FROM cnts
        ),
        fr AS (
            SELECT doc_id, n_tokens, tot_chars, {", ".join(fracs)}
            FROM chars
        )
        SELECT *, ({keep}) AS keep FROM fr
    """


# ---------------------------------------------------------------------------
# Encoding-damage (mojibake) census
# ---------------------------------------------------------------------------
# A crawl pipeline sees three classic encoding failures: UTF-8 bytes
# decoded as Latin-1/cp1252 (the "A-tilde" digraph families), U+FFFD
# replacement characters left by lossy decodes, and stray C0 control
# characters. The census counts all three per source so a corpus
# owner can route damaged slices to a re-decode pass instead of
# training on them. The driver's synthetic corpus is clean ASCII, so
# the query deterministically INJECTS damage into a selected slice
# (h30(doc_id) % MOJI_*_MOD) before detection — injection is fixture
# synthesis, detection is the operator; both engines run the same
# rule, so the gate verifies the detector. n_injected is reported
# next to n_flagged per source: equality is the detector's recall
# evidence, visible in the gate row itself.
#
# Scale shape: injection and all three counters are narrow per-row
# string expressions (replace()-length deltas and one anchored
# regexp_replace); the only exchange is the final groupBy on source —
# map-side combined, output is source-table-sized.

# one doc in 13 gets the cp1252-mojibake stamp; a DISJOINT one-in-17
# slice (mod 13 wins ties) gets a replacement-char stamp
MOJI_CP1252_MOD = 13
MOJI_REPL_MOD = 17
# the canonical mojibake of a right single quote (U+2019 encoded as
# UTF-8, then decoded as cp1252): 'A-tilde cent euro trademark'
_MOJI_STAMP = "Ã¢â‚¬â„¢"
_REPL_CHAR = "�"
# C0 control class, spelled as explicit escapes (the same regex in
# Java regex and RE2); excludes \t \n \r which are legitimate
# whitespace. Two spellings because Spark's SQL lexer consumes one
# backslash level (and DROPS the backslash of escapes it does not
# recognize, \x included — measured), while DuckDB passes the literal
# through to RE2 untouched.
_CTRL_RE_SPARK = (
    "[\\\\x00-\\\\x08\\\\x0b\\\\x0c\\\\x0e-\\\\x1f]"
)
_CTRL_RE_DUCK = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def q_mojibake_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source encoding-damage census over the (deterministically
    damaged) corpus: docs flagged by each signal, total signal counts,
    and the injected-doc count the flags must equal."""
    from .textstats import _h30_spark

    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    h = _h30_spark("cast(doc_id as string)")
    damaged = docs.select(
        "doc_id",
        "source",
        F.expr(
            f"CASE WHEN {h} % {MOJI_CP1252_MOD} = 0"
            f" THEN text || ' don{_MOJI_STAMP}t'"
            f" WHEN {h} % {MOJI_REPL_MOD} = 0"
            f" THEN text || ' caf{_REPL_CHAR}'"
            " ELSE text END"
        ).alias("text"),
        F.expr(
            f"cast({h} % {MOJI_CP1252_MOD} = 0"
            f" OR {h} % {MOJI_REPL_MOD} = 0 as bigint)"
        ).alias("injected"),
    )
    sig = damaged.select(
        "source",
        "injected",
        F.expr(
            "length(text) - length(replace(text, 'Ã', ''))"
        ).alias("n_atilde"),
        F.expr(
            f"length(text) - length(replace(text, '{_REPL_CHAR}', ''))"
        ).alias("n_repl"),
        F.expr(
            "length(text) - length(regexp_replace(text,"
            f" '{_CTRL_RE_SPARK}', ''))"
        ).alias("n_ctrl"),
    ).withColumn(
        "flagged",
        F.expr("cast(n_atilde > 0 OR n_repl > 0 OR n_ctrl > 0 as bigint)"),
    )
    return sig.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("injected").cast("bigint").alias("n_injected"),
        F.sum("flagged").cast("bigint").alias("n_flagged"),
        F.sum("n_atilde").cast("bigint").alias("tot_atilde"),
        F.sum("n_repl").cast("bigint").alias("tot_repl"),
        F.sum("n_ctrl").cast("bigint").alias("tot_ctrl"),
    )


def sql_mojibake_census() -> str:
    from .textstats import _h30_duck

    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH damaged AS (
            SELECT source,
                   CASE WHEN {h} % {MOJI_CP1252_MOD} = 0
                        THEN text || ' don{_MOJI_STAMP}t'
                        WHEN {h} % {MOJI_REPL_MOD} = 0
                        THEN text || ' caf{_REPL_CHAR}'
                        ELSE text END AS text,
                   (CASE WHEN {h} % {MOJI_CP1252_MOD} = 0
                         OR {h} % {MOJI_REPL_MOD} = 0
                         THEN 1 ELSE 0 END)::BIGINT AS injected
            FROM documents
        ),
        sig AS (
            SELECT source, injected,
                   length(text) - length(replace(text, 'Ã', ''))
                       AS n_atilde,
                   length(text) - length(replace(text, '{_REPL_CHAR}', ''))
                       AS n_repl,
                   length(text)
                     - length(regexp_replace(text, '{_CTRL_RE_DUCK}', '', 'g'))
                       AS n_ctrl
            FROM damaged
        )
        SELECT source,
               COUNT(*)::BIGINT AS n_docs,
               SUM(injected)::BIGINT AS n_injected,
               SUM(CASE WHEN n_atilde > 0 OR n_repl > 0 OR n_ctrl > 0
                        THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
               SUM(n_atilde)::BIGINT AS tot_atilde,
               SUM(n_repl)::BIGINT AS tot_repl,
               SUM(n_ctrl)::BIGINT AS tot_ctrl
        FROM sig
        GROUP BY source
    """


# ---------------------------------------------------------------------------
# Filter ablation: per-rule marginal impact of the Gopher gate
# ---------------------------------------------------------------------------
# When tuning a quality gate the question is never "how many docs fail
# rule R" but "how many docs does R reject that NOTHING ELSE rejects" —
# a rule with zero unique rejections is free to drop; a rule uniquely
# rejecting 20% of tokens deserves a threshold review. One row per
# Gopher rule: total failures, unique failures (the doc fails ONLY
# that rule), and the token mass lost uniquely, next to corpus totals.
#
# Scale shape: rides the zero-shuffle per-row Gopher signals; the
# whole ablation is ONE fixed-width aggregate (15 sums) collapsed
# map-side to a single row, then unpivoted to 5 rule rows. No new
# corpus pass beyond gopher_quality's scan.

GOPHER_RULES = (
    "r_word_count", "r_mean_word_len", "r_symbol_ratio",
    "r_alpha_words", "r_stopwords",
)


def q_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = q_gopher_quality(spark, sf_dir)
    fails = g.select(
        "n_words",
        *[
            F.expr(f"cast(NOT {r} as bigint)").alias(f"f_{r}")
            for r in GOPHER_RULES
        ],
    ).withColumn(
        "n_fails",
        sum(F.col(f"f_{r}") for r in GOPHER_RULES).cast("bigint"),
    )
    aggs = [
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.expr("cast(n_fails > 0 as bigint)"))
        .cast("bigint").alias("n_rejected"),
    ]
    for r in GOPHER_RULES:
        aggs += [
            F.sum(f"f_{r}").cast("bigint").alias(f"fail_{r}"),
            F.sum(
                F.expr(f"cast(f_{r} = 1 AND n_fails = 1 as bigint)")
            ).cast("bigint").alias(f"uniq_{r}"),
            F.sum(
                F.expr(
                    f"case when f_{r} = 1 AND n_fails = 1"
                    " then n_words else 0 end"
                )
            ).cast("bigint").alias(f"uniqtok_{r}"),
        ]
    one = fails.agg(*aggs)
    stack_args = ", ".join(
        f"'{r}', fail_{r}, uniq_{r}, uniqtok_{r}" for r in GOPHER_RULES
    )
    return one.selectExpr(
        f"stack({len(GOPHER_RULES)}, {stack_args})"
        " as (rule, n_fail, n_unique_fail, uniq_tokens_lost)",
        "n_docs",
        "n_rejected",
    )


def sql_filter_ablation() -> str:
    fail_exprs = ",\n                   ".join(
        f"(CASE WHEN NOT {r} THEN 1 ELSE 0 END)::BIGINT AS f_{r}"
        for r in GOPHER_RULES
    )
    n_fails = " + ".join(f"f_{r}" for r in GOPHER_RULES)
    per_rule = ",\n                   ".join(
        f"SUM(f_{r})::BIGINT AS fail_{r},"
        f" SUM(CASE WHEN f_{r} = 1 AND n_fails = 1 THEN 1 ELSE 0"
        f" END)::BIGINT AS uniq_{r},"
        f" SUM(CASE WHEN f_{r} = 1 AND n_fails = 1 THEN n_words ELSE 0"
        f" END)::BIGINT AS uniqtok_{r}"
        for r in GOPHER_RULES
    )
    arms = "\n            UNION ALL\n            ".join(
        f"SELECT '{r}' AS rule, fail_{r} AS n_fail,"
        f" uniq_{r} AS n_unique_fail, uniqtok_{r} AS uniq_tokens_lost,"
        " n_docs, n_rejected FROM one"
        for r in GOPHER_RULES
    )
    return f"""
        WITH g AS ({sql_gopher_quality()}),
        fails AS (
            SELECT n_words,
                   {fail_exprs}
            FROM g
        ),
        withn AS (
            SELECT *, ({n_fails})::BIGINT AS n_fails FROM fails
        ),
        one AS (
            SELECT COUNT(*)::BIGINT AS n_docs,
                   SUM(CASE WHEN n_fails > 0 THEN 1 ELSE 0
                       END)::BIGINT AS n_rejected,
                   {per_rule}
            FROM withn
        )
        {arms}
    """


# ---------------------------------------------------------------------------
# C4 word-blocklist filter ("badwords")
# ---------------------------------------------------------------------------
# C4 (Raffel et al. 2020, JMLR 21(140) §2.2) drops any document
# containing a word on the public "List of Dirty, Naughty, Obscene or
# Otherwise Bad Words" — single tokens AND multi-word phrases. The
# mechanism is what ships here: a broadcast-constant blocklist folded
# into per-row expressions (token membership for unigram entries, an
# adjacent-token scan for phrase entries — counted at word level, so
# overlapping-substring miscounts cannot occur). The list itself is a
# deterministic sandbox surrogate drawn from the corpus vocabulary;
# swapping in the real LDNOOBW list is a constant change.
#
# 100 TB story: zero shuffles — the blocklist is a literal in the
# codegen'd expression (a real deployment broadcasts it), every signal
# is per-row, and the decision column gates the scan downstream ops
# read, so predicate pushdown removes dropped docs before any exchange.

BADWORDS_TOKENS = ["dup", "crash"]
BADWORDS_PHRASES = [("hash", "join")]


def q_badwords_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document blocklist census: total blocklisted-token
    occurrences, distinct blocklisted terms, phrase occurrences, and
    the C4 keep decision (drop on ANY hit)."""
    docs = read_spread(spark, sf_dir, "documents")
    toks_arr = "array(" + ", ".join(f"'{w}'" for w in BADWORDS_TOKENS) + ")"
    base = docs.select(
        "doc_id", F.expr(TOKENS_SPARK).alias("toks")
    )
    w1, w2 = BADWORDS_PHRASES[0]
    return base.select(
        "doc_id",
        F.expr(
            f"cast(size(filter(toks, t -> array_contains({toks_arr}, t)))"
            " as bigint)"
        ).alias("n_token_hits"),
        F.expr(
            f"cast(size(array_intersect(toks, {toks_arr})) as bigint)"
        ).alias("n_terms_hit"),
        F.expr(
            "cast(case when size(toks) < 2 then 0 else"
            f" size(filter(sequence(0, size(toks) - 2),"
            f" i -> toks[i] = '{w1}' and toks[i + 1] = '{w2}'))"
            " end as bigint)"
        ).alias("n_phrase_hits"),
    ).select(
        "doc_id", "n_token_hits", "n_terms_hit", "n_phrase_hits",
        F.expr("n_token_hits + n_phrase_hits = 0").alias("keep"),
    )


def sql_badwords_filter() -> str:
    toks_list = "[" + ", ".join(f"'{w}'" for w in BADWORDS_TOKENS) + "]"
    w1, w2 = BADWORDS_PHRASES[0]
    return f"""
        WITH base AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks FROM documents
        ),
        sig AS (
            SELECT doc_id,
                   len(list_filter(toks,
                       t -> list_contains({toks_list}, t)))::BIGINT
                       AS n_token_hits,
                   len(list_intersect(toks, {toks_list}))::BIGINT
                       AS n_terms_hit,
                   (CASE WHEN len(toks) < 2 THEN 0 ELSE
                       len(list_filter(range(1, len(toks)),
                           i -> toks[i] = '{w1}' AND toks[i + 1] = '{w2}'))
                    END)::BIGINT AS n_phrase_hits
            FROM base
        )
        SELECT doc_id, n_token_hits, n_terms_hit, n_phrase_hits,
               n_token_hits + n_phrase_hits = 0 AS keep
        FROM sig
    """


# ---------------------------------------------------------------------------
# Flesch reading-ease census
# ---------------------------------------------------------------------------

# Flesch (1948) reading-ease bands, the standard public thresholds
FRE_EASY = 70.0    # >= 70: easy ("plain English" and below)
FRE_HARD = 50.0    # <  50: hard (college and above)


def _fre_micro(duck: bool) -> str:
    """Per-doc Flesch reading ease in micro units:
    206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words).
    `n_words`, `n_sents`, `n_syll` are BIGINT (>= 1 by construction);
    the double expression is written once, identical operator order in
    both dialects (the lm_score rule)."""
    def d(col: str) -> str:
        return col if duck else f"cast({col} as double)"

    expr = (
        f"206.835 - 1.015 * ({d('n_words')} / {d('n_sents')})"
        f" - 84.6 * ({d('n_syll')} / {d('n_words')})"
    )
    if duck:
        return f"floor(({expr}) * 1000000)::BIGINT"
    return f"cast(floor(({expr}) * 1000000) as bigint)"


def _fre_parts_spark() -> dict:
    """n_words / n_sents / n_syll Spark expressions. Syllables per word
    = max(1, count of [aeiouy]+ vowel groups) — the standard cheap
    heuristic; sentences = non-blank [.!?]+ segments (min 1)."""
    return {
        "n_words": f"cast(greatest(1, size({TOKENS_SPARK})) as bigint)",
        "n_sents": (
            "cast(greatest(1, size(filter(split(text, '[.!?]+'),"
            " s -> length(trim(s)) > 0))) as bigint)"
        ),
        "n_syll": (
            f"cast(aggregate({TOKENS_SPARK}, 0L, (acc, w) -> acc +"
            " greatest(1, size(regexp_extract_all(w, '[aeiouy]+', 0))))"
            " as bigint)"
        ),
    }


def _fre_parts_duck() -> dict:
    return {
        "n_words": f"greatest(1, len({TOKENS_DUCK}))::BIGINT",
        "n_sents": (
            "greatest(1, len(list_filter(regexp_split_to_array(text,"
            " '[.!?]+'), s -> length(trim(s)) > 0)))::BIGINT"
        ),
        "n_syll": (
            f"coalesce(list_sum(list_transform({TOKENS_DUCK}, w ->"
            " greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))),"
            " 0)::BIGINT"
        ),
    }


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch reading-ease census: doc count, mean FRE, and
    band counts (easy >= 70, 50 <= medium < 70, hard < 50) — the
    curation dashboard's readability axis, complementing the Gopher
    rule ladder (pass/fail) with a graded difficulty signal quality
    classifiers routinely bucket on.

    Scale shape: all three FRE components are narrow per-row
    expressions over the tokenized text (syllable counting is a
    per-word vowel-group regex inside one array-aggregate — no
    explode, no exchange); the only shuffle is the map-side-combinable
    groupBy(source), a tiny dimension. Per-doc FRE is integerised to
    micro BEFORE the sum so aggregation order cannot move the mean.
    Reference analog: none (SURVEY.md §2.8)."""
    p = _fre_parts_spark()
    docs = read_spread(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.expr(p["n_words"]).alias("n_words"),
        F.expr(p["n_sents"]).alias("n_sents"),
        F.expr(p["n_syll"]).alias("n_syll"),
    ).select("source", F.expr(_fre_micro(False)).alias("fre_micro"))
    easy = int(FRE_EASY * 1_000_000)
    hard = int(FRE_HARD * 1_000_000)
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(
            "round(sum(fre_micro) / (count(*) * cast(1000000 as"
            " double)), 6)"
        ).alias("avg_fre"),
        F.sum(F.expr(f"case when fre_micro >= {easy} then 1 else 0 end"))
        .cast("bigint").alias("n_easy"),
        F.sum(F.expr(
            f"case when fre_micro >= {hard} and fre_micro < {easy}"
            " then 1 else 0 end"
        )).cast("bigint").alias("n_medium"),
        F.sum(F.expr(f"case when fre_micro < {hard} then 1 else 0 end"))
        .cast("bigint").alias("n_hard"),
    )


def sql_readability() -> str:
    p = _fre_parts_duck()
    easy = int(FRE_EASY * 1_000_000)
    hard = int(FRE_HARD * 1_000_000)
    return f"""
        WITH parts AS (
            SELECT source,
                   {p['n_words']} AS n_words,
                   {p['n_sents']} AS n_sents,
                   {p['n_syll']} AS n_syll
            FROM documents
        ),
        per_doc AS (
            SELECT source, {_fre_micro(True)} AS fre_micro FROM parts
        )
        SELECT source,
               COUNT(*)::BIGINT AS n_docs,
               round(SUM(fre_micro) / (COUNT(*) * 1000000.0), 6)
                   AS avg_fre,
               SUM(CASE WHEN fre_micro >= {easy} THEN 1 ELSE 0 END)
                   ::BIGINT AS n_easy,
               SUM(CASE WHEN fre_micro >= {hard} AND fre_micro < {easy}
                   THEN 1 ELSE 0 END)::BIGINT AS n_medium,
               SUM(CASE WHEN fre_micro < {hard} THEN 1 ELSE 0 END)
                   ::BIGINT AS n_hard
        FROM per_doc
        GROUP BY source
    """
