"""Behavioral assertions for the round-4 census operators: template
dedup, the mojibake census, the adaptive quality gate, and the
vocabulary-growth curve. Cross-engine value parity is covered by
test_corpus_ops.py / the driver gate; these tests pin the SEMANTICS —
the injected fixtures are caught exactly, the quantile gate drops the
quartile it claims, and the growth curve is a valid cumulative curve.
"""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    yield con
    con.close()


def test_template_dedup_groups_exactly_the_injected_renders(spark, duck):
    from docling_core_spark.corpus.templates import (
        TPL_INJECT_MOD,
        TPL_VARIANT_BASE,
        q_template_dedup,
    )
    from docling_core_spark.corpus.textstats import _h30_duck

    rows = q_template_dedup(spark, SF_DIR).collect()
    h = _h30_duck("doc_id::VARCHAR")
    n_selected = duck.execute(
        f"SELECT COUNT(*) FROM documents WHERE {h} % {TPL_INJECT_MOD} = 0"
    ).fetchone()[0]
    # the raw corpus is variant-free, so every group is one injected
    # pair: two stamped renders of one base doc, differing only in
    # digits/whitespace (distinct raw texts, one skeleton)
    assert len(rows) == n_selected > 0
    for r in rows:
        assert r.n_docs == 2
        assert r.n_distinct_texts == 2
        # the keeper is the smaller variant id, never a base doc
        assert TPL_VARIANT_BASE <= r.keep_doc_id < 2 * TPL_VARIANT_BASE


def test_template_skeleton_kills_digits_and_whitespace_only(spark):
    from docling_core_spark.corpus.templates import _skeleton

    df = spark.createDataFrame(
        [
            ("Rev 3 of 2024 - hello world",),
            ("rev  99   of 1999 - hello  world",),
            ("rev 99 of 1999 - hello there",),
        ],
        "t string",
    )
    df.createOrReplaceTempView("sk_probe")
    out = [
        r.s
        for r in spark.sql(
            f"SELECT {_skeleton('t', spark=True)} AS s FROM sk_probe"
        ).collect()
    ]
    assert out[0] == out[1] == "rev 0 of 0 - hello world"
    assert out[2] != out[0]


def test_mojibake_census_flags_exactly_the_injected_docs(spark):
    from docling_core_spark.corpus.filters import q_mojibake_census

    rows = q_mojibake_census(spark, SF_DIR).collect()
    assert rows
    tot_injected = sum(r.n_injected for r in rows)
    tot_flagged = sum(r.n_flagged for r in rows)
    # detector recall == 1 and precision == 1 on the synthetic corpus:
    # the raw text is clean ASCII, so flags come only from injection
    assert tot_injected == tot_flagged > 0
    # the control-char counter stays zero — nothing injects C0 bytes
    assert sum(r.tot_ctrl for r in rows) == 0
    # cp1252 stamps contribute 4 'A-tilde'-class chars each; at least
    # one replacement-char doc exists in the 1-in-17 slice
    assert sum(r.tot_atilde for r in rows) > 0
    assert sum(r.tot_repl for r in rows) > 0


def test_adaptive_quality_drops_at_least_the_quartile(spark):
    from docling_core_spark.corpus.curation import (
        QA_DROP_PCT,
        q_adaptive_quality,
    )

    rows = q_adaptive_quality(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_docs
        # threshold = first bucket reaching ceil(n * pct / 100), so the
        # drop count can only overshoot the quartile (bucket ties drop)
        assert r.n_dropped >= -(-r.n_docs * QA_DROP_PCT // 100)
        assert r.kept_ppm == r.n_kept * 1_000_000 // r.n_docs
        assert 0 <= r.thr_micro <= 1_000_000
    # the gate must not degenerate into drop-everything on real data
    assert sum(r.n_kept for r in rows) > 0


def test_vocab_growth_is_a_valid_saturating_curve(spark, duck):
    from docling_core_spark.corpus.textstats import (
        TOKENS_DUCK,
        VG_POINTS,
        q_vocab_growth,
    )

    rows = sorted(q_vocab_growth(spark, SF_DIR).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == list(range(1, VG_POINTS + 1))
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs_cum >= a.n_docs_cum
        assert b.n_tokens_cum >= a.n_tokens_cum
        assert b.vocab_cum >= a.vocab_cum
    n_docs = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    n_vocab = duck.execute(
        f"SELECT COUNT(DISTINCT tok) FROM"
        f" (SELECT unnest({TOKENS_DUCK}) AS tok FROM documents)"
    ).fetchone()[0]
    assert rows[-1].n_docs_cum == n_docs
    assert rows[-1].vocab_cum == n_vocab
    # Heaps: the type-token ratio declines as the corpus grows (the
    # fixed generator vocabulary saturates long before the last slice)
    assert rows[-1].ttr_ppm < rows[0].ttr_ppm


def test_filter_ablation_identities(spark):
    from docling_core_spark.corpus.filters import (
        GOPHER_RULES,
        q_filter_ablation,
    )

    rows = q_filter_ablation(spark, SF_DIR).collect()
    assert sorted(r.rule for r in rows) == sorted(GOPHER_RULES)
    n_docs = rows[0].n_docs
    n_rejected = rows[0].n_rejected
    assert 0 < n_rejected <= n_docs
    for r in rows:
        assert (r.n_docs, r.n_rejected) == (n_docs, n_rejected)
        assert 0 <= r.n_unique_fail <= r.n_fail <= n_docs
        if r.n_unique_fail == 0:
            assert r.uniq_tokens_lost == 0
    # unique failures are disjoint doc sets, so they cannot exceed the
    # total rejected population
    assert sum(r.n_unique_fail for r in rows) <= n_rejected


def test_dedup_agreement_identities(spark):
    from docling_core_spark.corpus.dedup import q_dedup_agreement

    r = q_dedup_agreement(spark, SF_DIR).collect()[0]
    assert r.n_both <= min(r.n_minhash, r.n_simhash)
    assert r.only_minhash == r.n_minhash - r.n_both
    assert r.only_simhash == r.n_simhash - r.n_both
    union = r.n_minhash + r.n_simhash - r.n_both
    if union:
        assert r.pairset_jaccard_micro == r.n_both * 1_000_000 // union


def test_split_ks_pairs_and_bounds(spark):
    from docling_core_spark.corpus.splits import q_data_split, q_split_ks

    rows = q_split_ks(spark, SF_DIR).collect()
    assert sorted((r.split_a, r.split_b) for r in rows) == [
        ("test", "train"), ("test", "val"), ("train", "val"),
    ]
    sizes = {
        r.split: r.n_docs for r in q_data_split(spark, SF_DIR).collect()
    }
    for r in rows:
        assert 0 <= r.ks_ppm <= 1_000_000
        assert r.n_a == sizes[r.split_a]
        assert r.n_b == sizes[r.split_b]
