"""Distributed Naive-Bayes token classifier (the fastText recipe —
CCNet's langid gate, fineweb-edu's quality scorer — reduced to its
exactly-aggregatable core): take cheap noisy labels, train a unigram
model in ONE distributed pass, score every document with the learned
log-likelihood-ratio margin.

Production classifiers of this family are linear models over token
features; their training is a per-(token, class) count aggregation and
their scoring is a per-doc sum of learned weights — both exactly the
map-side-combinable shapes Spark does best. The sandbox has no
fastText, so the model here is multinomial Naive Bayes with add-1/2
smoothing: the same noisy-label bootstrap, the same one-pass count
training, the same linear scoring join, with the n-gram/subword
feature ladder as the production upgrade path.

The concrete task mirrors CCNet (Wenzek et al. 2020 §3.1): predict
is-English from vocabulary, supervised by the corpus's own `lang`
metadata column (in production: a CLD3/heuristic tag — noisy, which is
the point; the trained model both smooths over tag errors and, via
`nb_pred != label`, SURFACES them, complementing the rule-based
langid_confusion dashboard). Honesty note for the gate corpus: the
driver's synthetic documents draw every doc's tokens from one shared
pool, so `lang` is independent of vocabulary there and the learned
model correctly collapses to the class prior; the learning property is
proven on constructed class-separated corpora in
tests/test_classifier.py, and the gate rows verify the distributed
training/scoring arithmetic bit-for-bit.

Cross-engine float discipline (the lm_score discipline): each class's
token log-prob integerises to micro-nats independently —
floor(ln((c+0.5)/(n+0.5*V)) * 1e6) — and the LLR is the DIFFERENCE of
two such integers, so every later aggregate is order-independent
integer math. |llr| <= ~4e7 micro-nats; summed over 1e5 tokens/doc
stays < 4e12, far inside BIGINT.

100 TB story: training is one vocabulary-sized groupBy on the uniform
term key (map-side partial counts collapse each partition to <= |V|
rows before the single exchange); the model table is |V|-sized
regardless of corpus size; scoring joins the model back on term
(broadcast at small |V|, sort-merge at web-vocab scale) and aggregates
per uniform doc_id. The label is a narrow per-row expression over an
existing column — no label join, no second scan. No floats cross an
exchange un-integerised. Reference analog: none (docling-core has no
corpus analytics; SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK

# the positive class of the binary model
NB_POS_LANG = "en"
# top-K most discriminative features surfaced by nb_top_features, and
# the minimum total support for a token to be eligible (hapax tokens
# have huge noisy LLRs; production classifiers prune them the same way)
NB_TOP_K = 50
NB_MIN_SUPPORT = 5

_LABEL = f"lang = '{NB_POS_LANG}'"


# per-class smoothed log-prob, integerised to micro-nats. The float ops
# are identical left-to-right in both dialects BEFORE the floor, so the
# integer is bit-identical; the LLR is then an exact integer difference.
def _logp_micro_spark(c: str) -> str:
    return (
        f"cast(floor(ln(({c} + 0.5) / (n{c[-1]} + 0.5 * vocab))"
        f" * 1000000) as bigint)"
    )


def _logp_micro_duck(c: str) -> str:
    return (
        f"floor(ln(({c} + 0.5) / (n{c[-1]} + 0.5 * vocab))"
        f" * 1000000)::BIGINT"
    )


def _llr_spark() -> str:
    return f"({_logp_micro_spark('c1')} - {_logp_micro_spark('c0')})"


def _llr_duck() -> str:
    return f"({_logp_micro_duck('c1')} - {_logp_micro_duck('c0')})"


# class-prior margin in micro-nats (corpus-constant)
_PRIOR_SPARK = (
    "(cast(floor(ln((d1 + 0.5) / (d1 + d0 + 1.0)) * 1000000) as bigint)"
    " - cast(floor(ln((d0 + 0.5) / (d1 + d0 + 1.0)) * 1000000) as bigint))"
)
_PRIOR_DUCK = (
    "(floor(ln((d1 + 0.5) / (d1 + d0 + 1.0)) * 1000000)::BIGINT"
    " - floor(ln((d0 + 0.5) / (d1 + d0 + 1.0)) * 1000000)::BIGINT)"
)


def q_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the NB is-English model on the corpus's own noisy labels
    and score every document: one vocab-sized training exchange, one
    scoring join, one per-doc aggregate. Output: the noisy label, token
    count, exact micro-nat NB margin, and the model's prediction."""
    docs = read_spread(spark, sf_dir, "documents")
    # bind tokens ONCE per row (the tokenize-once discipline)
    labeled = docs.select(
        "doc_id",
        F.expr(TOKENS_SPARK).alias("toks"),
        F.expr(_LABEL).alias("label"),
    )
    terms = labeled.select(
        "doc_id", "label", F.explode("toks").alias("term")
    )
    counts = terms.groupBy("term").agg(
        F.expr(
            "cast(sum(case when label then 1 else 0 end) as bigint)"
        ).alias("c1"),
        F.expr(
            "cast(sum(case when label then 0 else 1 end) as bigint)"
        ).alias("c0"),
    )
    scalars = counts.agg(
        F.expr("cast(sum(c1) as bigint)").alias("n1"),
        F.expr("cast(sum(c0) as bigint)").alias("n0"),
        F.expr("cast(count(*) as bigint)").alias("vocab"),
    )
    priors = labeled.agg(
        F.expr(
            "cast(sum(case when label then 1 else 0 end) as bigint)"
        ).alias("d1"),
        F.expr(
            "cast(sum(case when label then 0 else 1 end) as bigint)"
        ).alias("d0"),
    )
    scored = (
        terms.join(counts, "term")
        .crossJoin(F.broadcast(scalars))
        .select("doc_id", "label", F.expr(_llr_spark()).alias("llr_micro"))
    )
    per_doc = scored.groupBy("doc_id", "label").agg(
        F.expr("cast(count(*) as bigint)").alias("n_tokens"),
        F.expr("cast(sum(llr_micro) as bigint)").alias("sum_llr_micro"),
    )
    return (
        per_doc.crossJoin(F.broadcast(priors))
        .select(
            "doc_id",
            F.col("label").alias("label_noisy"),
            "n_tokens",
            F.expr(
                f"cast({_PRIOR_SPARK} + sum_llr_micro as bigint)"
            ).alias("margin_micro"),
            F.expr(
                f"{_PRIOR_SPARK} + sum_llr_micro >= 0"
            ).alias("nb_pred"),
        )
    )


def sql_nb_langid() -> str:
    return f"""
        WITH labeled AS (
            SELECT doc_id, {TOKENS_DUCK} AS toks, {_LABEL} AS label
            FROM documents
        ),
        terms AS (
            SELECT doc_id, label, unnest(toks) AS term FROM labeled
        ),
        counts AS (
            SELECT term,
                   sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS c1,
                   sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS c0
            FROM terms GROUP BY term
        ),
        scalars AS (
            SELECT sum(c1)::BIGINT AS n1, sum(c0)::BIGINT AS n0,
                   COUNT(*)::BIGINT AS vocab
            FROM counts
        ),
        priors AS (
            SELECT sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS d1,
                   sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS d0
            FROM labeled
        ),
        scored AS (
            SELECT t.doc_id, t.label, {_llr_duck()} AS llr_micro
            FROM terms t JOIN counts USING (term) CROSS JOIN scalars
        ),
        per_doc AS (
            SELECT doc_id, label,
                   COUNT(*)::BIGINT AS n_tokens,
                   sum(llr_micro)::BIGINT AS sum_llr_micro
            FROM scored GROUP BY doc_id, label
        )
        SELECT doc_id, label AS label_noisy, n_tokens,
               ({_PRIOR_DUCK} + sum_llr_micro)::BIGINT AS margin_micro,
               {_PRIOR_DUCK} + sum_llr_micro >= 0 AS nb_pred
        FROM per_doc CROSS JOIN priors
    """


def q_nb_top_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned model's most discriminative tokens: top-|LLR| terms
    with minimum support — the model-inspection dashboard every
    production classifier ships with (what IS the model keying on?).
    Deterministic order: |llr| desc, then term. TakeOrderedAndProject
    over the vocab-sized model table — no full sort."""
    docs = read_spread(spark, sf_dir, "documents")
    terms = docs.select(
        F.expr(_LABEL).alias("label"),
        F.explode(F.expr(TOKENS_SPARK)).alias("term"),
    )
    counts = terms.groupBy("term").agg(
        F.expr(
            "cast(sum(case when label then 1 else 0 end) as bigint)"
        ).alias("c1"),
        F.expr(
            "cast(sum(case when label then 0 else 1 end) as bigint)"
        ).alias("c0"),
    )
    scalars = counts.agg(
        F.expr("cast(sum(c1) as bigint)").alias("n1"),
        F.expr("cast(sum(c0) as bigint)").alias("n0"),
        F.expr("cast(count(*) as bigint)").alias("vocab"),
    )
    return (
        counts.filter(F.expr(f"c1 + c0 >= {NB_MIN_SUPPORT}"))
        .crossJoin(F.broadcast(scalars))
        .select(
            "term", "c1", "c0",
            F.expr(_llr_spark()).alias("llr_micro"),
        )
        .orderBy(F.expr("abs(llr_micro)").desc(), F.col("term"))
        .limit(NB_TOP_K)
    )


def sql_nb_top_features() -> str:
    return f"""
        WITH terms AS (
            SELECT {_LABEL} AS label, unnest({TOKENS_DUCK}) AS term
            FROM documents
        ),
        counts AS (
            SELECT term,
                   sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS c1,
                   sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS c0
            FROM terms GROUP BY term
        ),
        scalars AS (
            SELECT sum(c1)::BIGINT AS n1, sum(c0)::BIGINT AS n0,
                   COUNT(*)::BIGINT AS vocab
            FROM counts
        )
        SELECT term, c1, c0, {_llr_duck()} AS llr_micro
        FROM counts CROSS JOIN scalars
        WHERE c1 + c0 >= {NB_MIN_SUPPORT}
        ORDER BY abs(llr_micro) DESC, term
        LIMIT {NB_TOP_K}
    """


# ---------------------------------------------------------------------------
# labeler_kappa: chance-corrected agreement between two labelers
# ---------------------------------------------------------------------------


def q_labeler_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the two independent is-English labelers
    this engine ships — the stopword heuristic (lang_id's pred_lang)
    and the trained NB model (nb_langid's nb_pred) — the standard
    annotation-quality dial a labeling pipeline watches before trusting
    machine labels (raw agreement flatters; kappa corrects for chance).

    Float discipline: the contingency counts are exact BIGINTs; po, pe
    and kappa derive from them in single left-to-right double
    expressions rounded to 6dp — bit-identical in both engines, the
    mean_cos pattern.

    100 TB story: both labeler signals are zero/low-shuffle per-doc
    expressions; the join runs on the uniform doc_id key; the
    contingency rollup is ONE fixed-width (4-counter) aggregate
    collapsed map-side to a single row."""
    from .textstats import q_lang_id

    heur = q_lang_id(spark, sf_dir).select(
        "doc_id", (F.col("pred_lang") == "en").alias("h_en")
    )
    nb = q_nb_langid(spark, sf_dir).select("doc_id", "nb_pred")
    cont = heur.join(nb, "doc_id").agg(
        F.expr(
            "cast(sum(case when h_en and nb_pred then 1 else 0 end)"
            " as bigint)"
        ).alias("n11"),
        F.expr(
            "cast(sum(case when h_en and not nb_pred then 1 else 0 end)"
            " as bigint)"
        ).alias("n10"),
        F.expr(
            "cast(sum(case when not h_en and nb_pred then 1 else 0 end)"
            " as bigint)"
        ).alias("n01"),
        F.expr(
            "cast(sum(case when not h_en and not nb_pred then 1 else 0"
            " end) as bigint)"
        ).alias("n00"),
    )
    # divide each marginal by N as DOUBLE BEFORE multiplying: the raw
    # marginal product (n11+n10)*(n11+n01) overflows BIGINT past ~3e9
    # docs — and overflows DIFFERENTLY per engine (Spark wraps, DuckDB
    # raises). Computed once here; the projections only round.
    raw = cont.select(
        "n11", "n10", "n01", "n00",
        F.expr(
            "(n11 + n00) / cast(n11 + n10 + n01 + n00 as double)"
        ).alias("po_raw"),
        F.expr(
            "((n11 + n10) / cast(n11 + n10 + n01 + n00 as double))"
            " * ((n11 + n01) / cast(n11 + n10 + n01 + n00 as double))"
            " + ((n00 + n01) / cast(n11 + n10 + n01 + n00 as double))"
            " * ((n00 + n10) / cast(n11 + n10 + n01 + n00 as double))"
        ).alias("pe_raw"),
    )
    return raw.select(
        "n11", "n10", "n01", "n00",
        F.expr("round(po_raw, 6)").alias("po"),
        F.expr("round(pe_raw, 6)").alias("pe"),
        # pe = 1 (both labelers constant and identical) makes kappa
        # 0/0 — emit NULL explicitly in both engines
        F.expr(
            "case when pe_raw = 1.0 then null else"
            " round((po_raw - pe_raw) / (1.0 - pe_raw), 6) end"
        ).alias("kappa"),
    )


def sql_labeler_kappa() -> str:
    from .textstats import sql_lang_id

    return f"""
        WITH heur AS (
            SELECT doc_id, pred_lang = 'en' AS h_en
            FROM ({sql_lang_id()})
        ),
        nb AS (
            SELECT doc_id, nb_pred FROM ({sql_nb_langid()})
        ),
        cont AS (
            SELECT
                sum(CASE WHEN h_en AND nb_pred THEN 1 ELSE 0
                    END)::BIGINT AS n11,
                sum(CASE WHEN h_en AND NOT nb_pred THEN 1 ELSE 0
                    END)::BIGINT AS n10,
                sum(CASE WHEN NOT h_en AND nb_pred THEN 1 ELSE 0
                    END)::BIGINT AS n01,
                sum(CASE WHEN NOT h_en AND NOT nb_pred THEN 1 ELSE 0
                    END)::BIGINT AS n00
            FROM heur JOIN nb USING (doc_id)
        ),
        raw AS (
            SELECT n11, n10, n01, n00,
                   (n11 + n00) / (n11 + n10 + n01 + n00)::DOUBLE
                       AS po_raw,
                   ((n11 + n10) / (n11 + n10 + n01 + n00)::DOUBLE)
                   * ((n11 + n01) / (n11 + n10 + n01 + n00)::DOUBLE)
                   + ((n00 + n01) / (n11 + n10 + n01 + n00)::DOUBLE)
                   * ((n00 + n10) / (n11 + n10 + n01 + n00)::DOUBLE)
                       AS pe_raw
            FROM cont
        )
        SELECT n11, n10, n01, n00,
               round(po_raw, 6) AS po,
               round(pe_raw, 6) AS pe,
               CASE WHEN pe_raw = 1.0 THEN NULL ELSE
                   round((po_raw - pe_raw) / (1.0 - pe_raw), 6)
               END AS kappa
        FROM raw
    """
