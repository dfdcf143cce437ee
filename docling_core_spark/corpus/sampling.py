"""Deterministic sampling operators: a balanced per-(source, lang)
stratified sample and a token-weighted priority sample — both selected
by hash order so the samples are reproducible across runs, engines,
and cluster sizes (no RNG state).

Scale design (the part that matters at 100 TB): a naive "row_number
per stratum, keep <= K" window ranks EVERY row of every stratum — a
mega-stratum with 10^10 docs single-tasks its whole partition. Instead:

1. one tiny agg computes stratum sizes (as many rows as strata);
2. it is BROADCAST back onto the corpus;
3. a map-side hash prefilter keeps only rows whose 30-bit doc hash
   falls under ``ceil(K * SAFETY * H30_MOD / n_stratum)`` — an expected
   K*SAFETY survivors per stratum, integer math, engine-exact;
4. the top-K-by-hash window then runs on the tiny survivor set only.

The oracle applies the IDENTICAL prefilter, so both engines agree
bit-for-bit even in the (astronomically unlikely at SAFETY=8) case the
prefilter under-selects a stratum. Strata smaller than K pass through
whole.

Reference analog: none — training-data extension surface (SURVEY.md §2
addendum; dev-scale corpus carving, eval splits, per-source caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import constants as C, read_spread
from .textstats import TOKENS_DUCK, _h30_duck, _h30_spark

# K is a job parameter; 3 keeps the gate corpus' ~5-doc strata actually
# selecting (a production carve would use thousands per stratum).
SAMPLE_K = 3
SAMPLE_SAFETY = 8  # prefilter over-selection factor


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang",
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    )
    sizes = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_stratum")
    )
    bound = (
        f"least(cast({C.H30_MOD} as bigint),"
        f" cast(ceil({SAMPLE_K} * {SAMPLE_SAFETY} * cast({C.H30_MOD} as"
        f" bigint) / n_stratum) as bigint))"
    )
    pre = docs.join(F.broadcast(sizes), ["source", "lang"]).where(
        F.expr(f"h < {bound}")
    )
    w = Window.partitionBy("source", "lang").orderBy(
        F.asc("h"), F.asc("doc_id")
    )
    return (
        pre.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("source", "lang", "rk", "doc_id", "n_stratum")
    )


def sql_stratified_sample() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    bound = (
        f"least({C.H30_MOD}::BIGINT,"
        f" ceil({SAMPLE_K} * {SAMPLE_SAFETY} * {C.H30_MOD}::BIGINT"
        f" / n_stratum)::BIGINT)"
    )
    return f"""
        WITH hashed AS (
            SELECT doc_id, source, lang, {h} AS h FROM documents
        ),
        sizes AS (
            SELECT source, lang, COUNT(*)::BIGINT AS n_stratum
            FROM documents GROUP BY source, lang
        ),
        pre AS (
            SELECT hashed.*, sizes.n_stratum
            FROM hashed JOIN sizes USING (source, lang)
            WHERE h < {bound}
        ),
        ranked AS (
            SELECT source, lang, doc_id, n_stratum,
                   row_number() OVER (
                       PARTITION BY source, lang ORDER BY h ASC, doc_id ASC
                   )::BIGINT AS rk
            FROM pre
        )
        SELECT source, lang, rk, doc_id, n_stratum
        FROM ranked WHERE rk <= {SAMPLE_K}
    """


# ---------------------------------------------------------------------------
# weighted (priority) sampling
# ---------------------------------------------------------------------------

# Priority sampling (Duffield/Lund/Thorup 2007): priority = u / w with
# u uniform; the K smallest priorities form a weight-proportional
# sample without replacement. u is the deterministic 30-bit doc hash,
# w the token count — heavier documents get proportionally more chance,
# and the sample is reproducible across runs, engines, cluster sizes.
WEIGHTED_K = 100


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted deterministic sample of WEIGHTED_K documents.

    100 TB story: priority is a narrow per-row expression; the global
    bottom-K is a TakeOrderedAndProject (distributed top-k, never a
    single-partition sort); the rank window runs on the K-row cut
    only. The priority double is a SINGLE division of two exact
    integers — identical bit pattern in both engines, no accumulation."""
    from pyspark.sql import Window

    from .textstats import TOKENS_SPARK

    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("n_tokens"),
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    ).where("n_tokens > 0")
    pri = "h / cast(n_tokens as double)"
    top = (
        docs.select(
            "doc_id", "n_tokens", F.expr(pri).alias("priority")
        )
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
    )
    w = Window.orderBy(F.asc("priority"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rk"),
        "doc_id",
        "n_tokens",
        F.expr("round(priority, 6)").alias("priority"),
    )


def sql_weighted_sample() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len({TOKENS_DUCK})::BIGINT AS n_tokens,
                   {h} AS h
            FROM documents
        ),
        pri AS (
            SELECT doc_id, n_tokens,
                   h / n_tokens::DOUBLE AS priority
            FROM base WHERE n_tokens > 0
        ),
        top AS (
            SELECT * FROM pri
            ORDER BY priority ASC, doc_id ASC LIMIT {WEIGHTED_K}
        )
        SELECT row_number() OVER (
                   ORDER BY priority ASC, doc_id ASC
               )::BIGINT AS rk,
               doc_id, n_tokens, round(priority, 6) AS priority
        FROM top
        ORDER BY rk
    """


# ---------------------------------------------------------------------------
# mixture rebalancing weights (uniform-target importance weights)
# ---------------------------------------------------------------------------

def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) stratum: token mass, observed corpus share,
    the uniform target share, and the importance weight
    target/observed a mixture-rebalanced sampler would apply (the
    static-weights step of data-mixing recipes — The Pile's per-set
    epochs, DoReMi's reweighted sampling; here the target is uniform
    over the observed strata). All shares/weights are exact
    micro-unit BIGINTs (integer floor division), so both engines agree
    bit-for-bit with no float summation anywhere.

    100 TB story: one map-side-combinable agg whose key space is the
    stratum count (dozens), then arithmetic on that tiny table against
    a broadcast one-row total — the corpus is scanned exactly once,
    pruned to (source, lang, text). BIGINT headroom: tokens*10^6 must
    stay < 2^63, i.e. total corpus tokens < ~9.2*10^12; past that a
    production run right-shifts both numerator and denominator by a
    common factor (tokens div 2^10) before the share division — same
    micro precision, the fixture-scale gate keeps the unshifted form
    because the shift floors tiny strata to 0."""
    from .textstats import TOKENS_SPARK

    docs = read_spread(spark, sf_dir, "documents")
    strata = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(f"cast(sum(size({TOKENS_SPARK})) as bigint)").alias(
            "tokens"
        ),
    )
    totals = strata.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("n_strata"),
    )
    return (
        strata.crossJoin(F.broadcast(totals))
        .select(
            "source", "lang", "n_docs", "tokens",
            F.expr(
                "cast(tokens * 1000000 div total_tokens as bigint)"
            ).alias("observed_micro"),
            F.expr(
                "cast(1000000 div n_strata as bigint)"
            ).alias("target_micro"),
            # Guard: a stratum under 1ppm of corpus token mass floors
            # observed_micro to 0; ANSI Spark would raise
            # DIVIDE_BY_ZERO while DuckDB yields NULL — emit NULL in
            # BOTH dialects so degenerate inputs neither crash nor
            # diverge.
            F.expr(
                "cast(case when tokens * 1000000 div total_tokens = 0"
                " then null"
                " else (1000000 div n_strata) * 1000000"
                " div (tokens * 1000000 div total_tokens) end"
                " as bigint)"
            ).alias("weight_micro"),
        )
    )


def sql_mixture_weights() -> str:
    return f"""
        WITH strata AS (
            SELECT source, lang,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(len({TOKENS_DUCK}))::BIGINT AS tokens
            FROM documents
            GROUP BY source, lang
        ),
        totals AS (
            SELECT SUM(tokens)::BIGINT AS total_tokens,
                   COUNT(*)::BIGINT AS n_strata
            FROM strata
        )
        SELECT source, lang, n_docs, tokens,
               (tokens * 1000000 // total_tokens)::BIGINT
                   AS observed_micro,
               (1000000 // n_strata)::BIGINT AS target_micro,
               (CASE WHEN tokens * 1000000 // total_tokens = 0
                     THEN NULL
                     ELSE (1000000 // n_strata) * 1000000
                          // (tokens * 1000000 // total_tokens)
                END)::BIGINT
                   AS weight_micro
        FROM strata CROSS JOIN totals
    """


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------
# Select raw-corpus documents that look like a TARGET distribution:
# featurize every doc as hashed {uni,bi}gram counts, fit two smoothed
# bag-of-buckets models (target vs raw), score each doc by the summed
# log importance ratio log p_target(doc) - log p_raw(doc), then take
# the Gumbel-perturbed top-K (the "resampling" half of the paper —
# Gumbel-top-K over log weights IS sampling without replacement
# proportional to the importance weights).
#
# Cross-engine float discipline (same as lm_score): each bucket's two
# log-probs are integerised to micro-nats BEFORE any aggregation, so
# engines sum exact integers in any order. The Gumbel noise is a pure
# function of the 30-bit doc hash — deterministic, reproducible across
# runs, engines, and cluster sizes — and is itself integerised.
#
# 100 TB story: gram explosion is a narrow per-row expression; both
# model fits are map-side-combined groupBys onto a FIXED 4096-bucket
# key space (output size is constant regardless of corpus size, the
# hot natural-language head spreads over buckets by hash); the scoring
# join broadcasts the 4096-row log-ratio table onto the gram stream
# (no shuffle); the per-doc sum aggregates on uniform doc_id; the
# final cut is a TakeOrderedAndProject top-K, never a global sort.
# Reference analog: none — training-data extension surface.

DSIR_BUCKETS = 4096
DSIR_K = 100
DSIR_TARGET = "lang = 'en'"  # the target slice a curator would swap


def _dsir_grams_spark() -> str:
    """Unigram + bigram multiset (occurrence counts, not distinct)."""
    return (
        "concat(t, CASE WHEN size(t) < 2"
        " THEN cast(array() as array<string>)"
        " ELSE transform(sequence(1, size(t) - 1),"
        " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        " END)"
    )


def _dsir_grams_duck() -> str:
    return (
        "list_concat(t, CASE WHEN len(t) < 2 THEN []::VARCHAR[]"
        " ELSE list_transform(generate_series(1, len(t) - 1),"
        " i -> t[i] || ' ' || t[i + 1]) END)"
    )


def _dsir_lr_micro(duck: bool) -> str:
    """Per-bucket integerised log importance ratio. Smoothing mirrors
    lm_score's exact-rational +1/2; the bucket space is the full
    DSIR_BUCKETS so unseen buckets are defined in both models. The
    arithmetic inside ln() is the IDENTICAL left-to-right float
    expression in both dialects (int + 0.5 promotes to double in
    each), then each log-prob is floored to micro-nats separately."""
    half_b = DSIR_BUCKETS / 2  # exact in binary: 2048.0

    def _f(expr: str) -> str:
        if duck:
            return f"floor({expr} * 1000000)::BIGINT"
        return f"cast(floor({expr} * 1000000) as bigint)"

    pt = f"ln((ct + 0.5) / (nt + {half_b}))"
    pr = f"ln((cr + 0.5) / (nr + {half_b}))"
    return f"{_f(pt)} - {_f(pr)}"


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc summed log importance ratio (micro-nats) + gram count."""
    from .textstats import TOKENS_SPARK

    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.expr(TOKENS_SPARK).alias("t")
    )
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(F.expr(_dsir_grams_spark())).alias("g"),
    ).select(
        "doc_id",
        "lang",
        F.expr(
            f"pmod({_h30_spark('g')}, {DSIR_BUCKETS})"
        ).alias("b"),
    )
    raw = grams.groupBy("b").agg(F.count("*").cast("bigint").alias("cr"))
    tgt = (
        grams.where(DSIR_TARGET)
        .groupBy("b")
        .agg(F.count("*").cast("bigint").alias("ct"))
    )
    ratio = (
        raw.join(tgt, "b", "left")
        .select("b", "cr", F.coalesce("ct", F.lit(0)).alias("ct"))
        .crossJoin(
            F.broadcast(
                raw.agg(F.sum("cr").cast("bigint").alias("nr"))
            )
        )
        .crossJoin(
            F.broadcast(
                tgt.agg(F.sum("ct").cast("bigint").alias("nt"))
            )
        )
        .select("b", F.expr(_dsir_lr_micro(False)).alias("lr_micro"))
    )
    return (
        grams.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("lr_micro").cast("bigint").alias("li_micro"),
        )
    )


_DSIR_SCORED_DUCK = """
    toks AS (SELECT doc_id, lang, {tokens} AS t FROM documents),
    grams AS (
        SELECT doc_id, lang,
               ({h30}) % {buckets} AS b
        FROM (SELECT doc_id, lang, unnest({grams}) AS g FROM toks)
    ),
    raw AS (SELECT b, COUNT(*)::BIGINT AS cr FROM grams GROUP BY b),
    tgt AS (SELECT b, COUNT(*)::BIGINT AS ct FROM grams
            WHERE {target} GROUP BY b),
    ratio AS (
        SELECT r.b, {lr} AS lr_micro
        FROM (SELECT raw.b, cr, COALESCE(ct, 0) AS ct
              FROM raw LEFT JOIN tgt USING (b)) r
        CROSS JOIN (SELECT SUM(cr)::BIGINT AS nr FROM raw)
        CROSS JOIN (SELECT SUM(ct)::BIGINT AS nt FROM tgt)
    ),
    scored AS (
        SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
               SUM(lr_micro)::BIGINT AS li_micro
        FROM grams JOIN ratio USING (b)
        GROUP BY doc_id
    )
"""


def _dsir_scored_cte() -> str:
    from .textstats import TOKENS_DUCK

    return _DSIR_SCORED_DUCK.format(
        tokens=TOKENS_DUCK,
        h30=_h30_duck("g"),
        buckets=DSIR_BUCKETS,
        grams=_dsir_grams_duck(),
        target=DSIR_TARGET,
        lr=_dsir_lr_micro(True),
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc DSIR importance weight (sum + per-gram average)."""
    return _dsir_scored(spark, sf_dir).select(
        "doc_id",
        "n_grams",
        "li_micro",
        F.expr(
            "round(li_micro / cast(n_grams as double) / 1000000.0, 6)"
        ).alias("li_avg"),
    )


def sql_dsir_weights() -> str:
    return f"""
        WITH {_dsir_scored_cte()}
        SELECT doc_id, n_grams, li_micro,
               round(li_micro / n_grams::DOUBLE / 1000000.0, 6)
                   AS li_avg
        FROM scored
    """


def _dsir_gumbel(duck: bool) -> str:
    """Integerised Gumbel(0,1) noise as a pure function of the 30-bit
    doc hash: g = -ln(-ln(u)), u = (h + 0.5) / 2^30 in (0, 1)."""
    h = (
        _h30_duck("doc_id::VARCHAR")
        if duck
        else _h30_spark("cast(doc_id as string)")
    )
    u = f"(({h}) + 0.5) / {float(C.H30_MOD)}"
    if duck:
        return f"floor(-ln(-ln({u})) * 1000000)::BIGINT"
    return f"cast(floor(-ln(-ln({u})) * 1000000) as bigint)"


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-K resampled selection: the DSIR_K docs with the
    highest li_micro + gumbel_micro — sampling without replacement
    proportional to the importance weights, fully deterministic.
    TakeOrderedAndProject does the global cut; the rank window runs on
    the K-row result only."""
    scored = _dsir_scored(spark, sf_dir).select(
        "doc_id",
        "li_micro",
        F.expr(_dsir_gumbel(False)).alias("g_micro"),
    ).select(
        "doc_id",
        "li_micro",
        "g_micro",
        (F.col("li_micro") + F.col("g_micro")).alias("key_micro"),
    )
    top = scored.orderBy(
        F.desc("key_micro"), F.asc("doc_id")
    ).limit(DSIR_K)
    w = Window.orderBy(F.desc("key_micro"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rk"),
        "doc_id",
        "li_micro",
        "g_micro",
        "key_micro",
    )


def sql_dsir_select() -> str:
    return f"""
        WITH {_dsir_scored_cte()},
        keyed AS (
            SELECT doc_id, li_micro,
                   {_dsir_gumbel(True)} AS g_micro,
                   li_micro + {_dsir_gumbel(True)} AS key_micro
            FROM scored
        )
        SELECT row_number() OVER
                   (ORDER BY key_micro DESC, doc_id) ::BIGINT AS rk,
               doc_id, li_micro, g_micro, key_micro
        FROM keyed
        ORDER BY key_micro DESC, doc_id
        LIMIT {DSIR_K}
    """


# ---------------------------------------------------------------------------
# temperature-scaled language sampling (XLM-R / mBERT recipe)
# ---------------------------------------------------------------------------
# Multilingual pretraining flattens the language distribution with
# q_l = p_l^alpha / sum_m p_m^alpha (Conneau et al. 2020, XLM-R, using
# alpha = 0.3; Devlin et al. 2019 used 0.7): low-resource languages get
# upsampled, the head language downsampled, alpha=1 reproduces the
# corpus and alpha=0 the uniform mixture. Float discipline: p_l is an
# IEEE double from one division; power(p, alpha) is the ONLY
# transcendental — rounded to 6dp and integerised to micro BEFORE the
# normalizing sum, so the sum and every later ratio are exact integer
# math (libm pow can differ across engines in the last ulp; the 6dp
# rounding absorbs it — same discipline as the cosine/LLR operators).

TEMP_ALPHA = 0.3


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per language: token mass, observed share, the alpha-tempered
    sampling share, and the resulting up/down-sampling ratio — all
    exact micro-unit BIGINTs past the single pow().

    100 TB story: one map-side-combinable agg on the language key
    (dozens of values), then arithmetic on that tiny table against a
    broadcast one-row total; the corpus is scanned once, pruned to
    (lang, text)."""
    from .textstats import TOKENS_SPARK

    docs = read_spread(spark, sf_dir, "documents")
    langs = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.expr(f"cast(sum(size({TOKENS_SPARK})) as bigint)").alias(
            "tokens"
        ),
    )
    totals = langs.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens")
    )
    q = (
        langs.crossJoin(F.broadcast(totals))
        .select(
            "lang", "n_docs", "tokens",
            F.expr(
                "cast(tokens * 1000000 div total_tokens as bigint)"
            ).alias("observed_micro"),
            F.expr(
                "cast(floor(round(power(cast(tokens as double)"
                f" / cast(total_tokens as double), {TEMP_ALPHA}), 6)"
                " * 1000000) as bigint)"
            ).alias("q_micro"),
        )
    )
    qt = q.agg(F.sum("q_micro").cast("bigint").alias("sum_q_micro"))
    return (
        q.crossJoin(F.broadcast(qt))
        .select(
            "lang", "n_docs", "tokens", "observed_micro",
            F.expr(
                "cast(q_micro * 1000000 div sum_q_micro as bigint)"
            ).alias("sample_micro"),
            F.expr(
                "cast(case when observed_micro = 0 then null else"
                " (q_micro * 1000000 div sum_q_micro) * 1000000"
                " div observed_micro end as bigint)"
            ).alias("ratio_micro"),
        )
    )


def sql_temperature_mixture() -> str:
    from .textstats import TOKENS_DUCK

    return f"""
        WITH langs AS (
            SELECT lang,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(len({TOKENS_DUCK}))::BIGINT AS tokens
            FROM documents
            GROUP BY lang
        ),
        totals AS (
            SELECT SUM(tokens)::BIGINT AS total_tokens FROM langs
        ),
        q AS (
            SELECT lang, n_docs, tokens,
                   (tokens * 1000000 // total_tokens)::BIGINT
                       AS observed_micro,
                   floor(round(pow(tokens::DOUBLE / total_tokens::DOUBLE,
                                   {TEMP_ALPHA}), 6)
                         * 1000000)::BIGINT AS q_micro
            FROM langs CROSS JOIN totals
        ),
        qt AS (SELECT SUM(q_micro)::BIGINT AS sum_q_micro FROM q)
        SELECT lang, n_docs, tokens, observed_micro,
               (q_micro * 1000000 // sum_q_micro)::BIGINT AS sample_micro,
               (CASE WHEN observed_micro = 0 THEN NULL ELSE
                    (q_micro * 1000000 // sum_q_micro) * 1000000
                    // observed_micro
                END)::BIGINT AS ratio_micro
        FROM q CROSS JOIN qt
    """
