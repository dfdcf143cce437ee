"""Distributed Naive-Bayes token classifier: learning beyond the noisy
labels, cross-engine integerised parity, model inspection, and plan
shape."""

import duckdb

from docling_core_spark.corpus import classifier as NB

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_margin_follows_vocabulary_not_label(spark, tmp_path):
    """Docs of positive-class vocabulary must out-margin docs of
    negative-class vocabulary — and a doc whose METADATA label is wrong
    but whose vocabulary is positive-class must still score positive
    (the trained model smooths over tag errors; that's why production
    pipelines train a classifier instead of trusting the tag)."""
    en = "hello world common english words appear here often " * 4
    fr = "bonjour monde mots francais apparaissent ici souvent " * 4
    rows = [
        (1, en, "en", "s", len(en)),
        (2, en, "en", "s", len(en)),
        (3, fr, "fr", "s", len(fr)),
        (4, fr, "fr", "s", len(fr)),
        # mis-tagged: French label, English vocabulary
        (5, "hello world common english words", "fr", "s", 32),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r["doc_id"]: r
           for r in NB.q_nb_langid(spark, str(tmp_path)).collect()}
    assert got[1]["label_noisy"] is True
    assert got[3]["label_noisy"] is False
    assert got[1]["margin_micro"] > got[3]["margin_micro"]
    assert got[1]["nb_pred"] is True
    assert got[3]["nb_pred"] is False
    # the mis-tagged doc: label false, prediction true
    assert got[5]["label_noisy"] is False
    assert got[5]["nb_pred"] is True


def test_nb_quality_cross_engine_parity(spark):
    con = _duck()
    got = (NB.q_nb_langid(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = (con.execute(NB.sql_nb_langid()).df()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 500
    for c in sorted(got.columns):
        assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c
    # the driver's synthetic corpus draws every doc's tokens from ONE
    # shared pool, so lang is statistically independent of vocabulary:
    # the correct learned behavior here is the class prior (agreement
    # tracks the majority share, NOT high accuracy). The learning
    # property itself is proven on constructed data above.
    agree = (got["label_noisy"] == got["nb_pred"]).mean()
    assert agree >= 0.5
    assert got["margin_micro"].abs().min() > 0


def test_nb_top_features_cross_engine_parity(spark):
    con = _duck()
    got = NB.q_nb_top_features(spark, SF).toPandas()
    want = con.execute(NB.sql_nb_top_features()).df()
    # sf0.001's >=5-support vocabulary is smaller than TOP_K
    assert 0 < len(got) <= NB.NB_TOP_K and len(got) == len(want)
    for c in sorted(got.columns):
        assert [str(x) for x in got[c]] == [str(x) for x in want[c]], c
    assert (got["c1"] + got["c0"] >= NB.NB_MIN_SUPPORT).all()


def test_plan_shape(spark):
    for q in (NB.q_nb_langid, NB.q_nb_top_features):
        plan = (q(spark, SF)._jdf.queryExecution()
                .executedPlan().toString())
        assert "CartesianProduct" not in plan     # scalars broadcast
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # top-features must not global-sort the model table
    plan = (NB.q_nb_top_features(spark, SF)._jdf.queryExecution()
            .executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_labeler_kappa_identities(spark):
    """Contingency counts cover the corpus; po/pe/kappa satisfy their
    defining identities recomputed in Python from the exact counts."""
    from docling_core_spark.corpus.classifier import q_labeler_kappa

    r = q_labeler_kappa(spark, SF).collect()[0]
    n = r.n11 + r.n10 + r.n01 + r.n00
    assert n > 0
    po = (r.n11 + r.n00) / n
    # same left-to-right order as the engines: divide-first marginals
    pe = ((r.n11 + r.n10) / n) * ((r.n11 + r.n01) / n) \
        + ((r.n00 + r.n01) / n) * ((r.n00 + r.n10) / n)
    assert abs(r.po - round(po, 6)) < 1e-9
    assert abs(r.pe - round(pe, 6)) < 1e-9
    if pe == 1.0:
        assert r.kappa is None
    else:
        assert abs(r.kappa - round((po - pe) / (1 - pe), 6)) < 1e-9
        assert -1.0 <= r.kappa <= 1.0
