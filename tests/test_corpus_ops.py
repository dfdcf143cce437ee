"""Spark-vs-DuckDB parity for the corpus training-data operators.

Each operator ships a DuckDB oracle generated from the same constants;
this test runs both on sf0.001 and compares the order-insensitive value
multiset — the same check the driver's correctness gate performs.
"""

import datetime
import decimal
import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, decimal.Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(list(r)[i]) for i in order) for r in rows]
    out.sort()
    return out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _pairs():
    from docling_core_spark.corpus import (
        bm25 as CB,
        budget as CBU,
        cohesion as CCO,
        curation as CCU,
        dedup as CD,
        domains as CDQ,
        drift as CDR,
        fertility as CFE,
        filters as CF,
        heldout as CHO,
        keywords as CK,
        lm2 as CL2,
        mining as CMI,
        multimodal as CM,
        normalize as CN,
        packing as CP2,
        similarity as CS,
        splits as CSP,
        templates as CTP,
        textstats as CT,
        urls as CU,
        webextract as CW,
    )

    return {
        "template_dedup": (
            CTP.q_template_dedup, CTP.sql_template_dedup,
        ),
        "bow_dedup": (CTP.q_bow_dedup, CTP.sql_bow_dedup),
        "token_stats": (CT.q_token_stats, CT.sql_token_stats),
        "token_entropy": (CT.q_token_entropy, CT.sql_token_entropy),
        "lang_id": (CT.q_lang_id, CT.sql_lang_id),
        "quality": (CT.q_quality, CT.sql_quality),
        "fingerprint": (CT.q_fingerprint, CT.sql_fingerprint),
        "minhash_signatures": (
            CD.q_minhash_signatures, CD.sql_minhash_signatures,
        ),
        "lsh_buckets": (CD.q_lsh_buckets, CD.sql_lsh_buckets),
        "neardup_pairs": (CD.q_neardup_pairs, CD.sql_neardup_pairs),
        "neardup_edit": (CD.q_neardup_edit, CD.sql_neardup_edit),
        "lsh_scurve": (CD.q_lsh_scurve, CD.sql_lsh_scurve),
        "cluster_density": (CD.q_cluster_density, CD.sql_cluster_density),
        "dedup_clusters": (CD.q_dedup_clusters, CD.sql_dedup_clusters),
        "jaccard_pairs": (CD.q_jaccard_pairs, CD.sql_jaccard_pairs),
        "containment_pairs": (
            CD.q_containment_pairs, CD.sql_containment_pairs,
        ),
        "shingle_novelty": (CD.q_shingle_novelty, CD.sql_shingle_novelty),
        "source_overlap": (CD.q_source_overlap, CD.sql_source_overlap),
        "cluster_size_hist": (
            CD.q_cluster_size_hist, CD.sql_cluster_size_hist,
        ),
        "dedup_savings_by_source": (
            CD.q_dedup_savings_by_source, CD.sql_dedup_savings_by_source,
        ),
        "code_detect": (CF.q_code_detect, CF.sql_code_detect),
        "quality_calibration": (
            CCU.q_quality_calibration, CCU.sql_quality_calibration,
        ),
        "adaptive_quality": (
            CCU.q_adaptive_quality, CCU.sql_adaptive_quality,
        ),
        "filter_ablation": (
            CF.q_filter_ablation, CF.sql_filter_ablation,
        ),
        "dedup_agreement": (
            CD.q_dedup_agreement, CD.sql_dedup_agreement,
        ),
        "split_ks": (CSP.q_split_ks, CSP.sql_split_ks),
        "mojibake_census": (
            CF.q_mojibake_census, CF.sql_mojibake_census,
        ),
        "vocab_growth": (CT.q_vocab_growth, CT.sql_vocab_growth),
        "dedup_savings": (CD.q_dedup_savings, CD.sql_dedup_savings),
        "simhash": (CD.q_simhash, CD.sql_simhash),
        "simhash_neardup": (CD.q_simhash_neardup, CD.sql_simhash_neardup),
        "dup_passages_apply": (
            CD.q_dup_passages_apply, CD.sql_dup_passages_apply,
        ),
        "winnow_fingerprint": (
            CD.q_winnow_fingerprint, CD.sql_winnow_fingerprint,
        ),
        "winnow_overlap": (
            CD.q_winnow_overlap, CD.sql_winnow_overlap,
        ),
        "cdc_segments": (CD.q_cdc_segments, CD.sql_cdc_segments),
        "cdc_dup_chunks": (CD.q_cdc_dup_chunks, CD.sql_cdc_dup_chunks),
        "dup_passages": (CD.q_dup_passages, CD.sql_dup_passages),
        "link_pagerank": (CW.q_link_pagerank, CW.sql_link_pagerank),
        "link_hits": (CW.q_link_hits, CW.sql_link_hits),
        "anchor_text_agg": (CW.q_anchor_text_agg, CW.sql_anchor_text_agg),
        "link_cocitation": (CW.q_link_cocitation, CW.sql_link_cocitation),
        "knn_bruteforce": (CS.q_knn_bruteforce, CS.sql_knn_bruteforce),
        "lsh_bucket_stats": (CS.q_lsh_bucket_stats, CS.sql_lsh_bucket_stats),
        "ann_lsh_topk": (CS.q_ann_lsh_topk, CS.sql_ann_lsh_topk),
        # oracle embeds the per-sf centroid artifact -> bind the test sf
        "ann_ivf_topk": (
            CS.q_ann_ivf_topk, lambda: CS.sql_ann_ivf_topk(SF_DIR),
        ),
        "ann_recall": (
            CS.q_ann_recall, lambda: CS.sql_ann_recall(SF_DIR),
        ),
        "ivf_cluster_stats": (
            CS.q_ivf_cluster_stats,
            lambda: CS.sql_ivf_cluster_stats(SF_DIR),
        ),
        "cluster_purity": (
            CS.q_cluster_purity,
            lambda: CS.sql_cluster_purity(SF_DIR),
        ),
        "pq_encode": (
            CS.q_pq_encode, lambda: CS.sql_pq_encode(SF_DIR),
        ),
        "pq_search": (
            CS.q_pq_search, lambda: CS.sql_pq_search(SF_DIR),
        ),
        "ivfpq_search": (
            CS.q_ivfpq_search, lambda: CS.sql_ivfpq_search(SF_DIR),
        ),
        "pq_recall": (
            CS.q_pq_recall, lambda: CS.sql_pq_recall(SF_DIR),
        ),
        "neardup_cosine": (CS.q_neardup_cosine, CS.sql_neardup_cosine),
        "semdedup_clusters": (
            CS.q_semdedup_clusters, CS.sql_semdedup_clusters,
        ),
        "corpus_stats": (CT.q_corpus_stats, CT.sql_corpus_stats),
        "hist_quantiles": (CT.q_hist_quantiles, CT.sql_hist_quantiles),
        "langid_confusion": (
            CT.q_langid_confusion, CT.sql_langid_confusion,
        ),
        "gopher_quality": (CF.q_gopher_quality, CF.sql_gopher_quality),
        "readability": (CF.q_readability, CF.sql_readability),
        "dup_ngrams": (CF.q_dup_ngrams, CF.sql_dup_ngrams),
        "repetition_ladder": (
            CF.q_repetition_ladder, CF.sql_repetition_ladder,
        ),
        "pii_scrub": (CF.q_pii_scrub, CF.sql_pii_scrub),
        "decode_features": (CM.q_decode_features, CM.sql_decode_features),
        "media_resize": (CM.q_media_resize, CM.sql_media_resize),
        "frame_sample": (CM.q_frame_sample, CM.sql_frame_sample),
        "media_dedup": (CM.q_media_dedup, CM.sql_media_dedup),
        "url_normalize": (CU.q_url_normalize, CU.sql_url_normalize),
        "domain_stats": (CU.q_domain_stats, CU.sql_domain_stats),
        "robots_filter": (CU.q_robots_filter, CU.sql_robots_filter),
        "crawl_frontier": (CU.q_crawl_frontier, CU.sql_crawl_frontier),
        "crossdedup_lsh": (CD.q_crossdedup_lsh, CD.sql_crossdedup_lsh),
        "fuzzy_decontaminate": (
            CD.q_fuzzy_decontaminate, CD.sql_fuzzy_decontaminate,
        ),
        "neardup_transitivity": (
            CD.q_neardup_transitivity, CD.sql_neardup_transitivity,
        ),
        "minhash_oph": (CD.q_minhash_oph, CD.sql_minhash_oph),
        "corpus_rollup": (CT.q_corpus_rollup, CT.sql_corpus_rollup),
        "texttiling": (CT.q_texttiling, CT.sql_texttiling),
        "bm25_topk": (CB.q_bm25_topk, CB.sql_bm25_topk),
        "rrf_fusion": (CB.q_rrf_fusion, CB.sql_rrf_fusion),
        "text_normalize": (CN.q_text_normalize, CN.sql_text_normalize),
        "normalize_uplift": (
            CN.q_normalize_uplift, CN.sql_normalize_uplift,
        ),
        "lm2_score": (CL2.q_lm2_score, CL2.sql_lm2_score),
        "domain_quality": (CDQ.q_domain_quality, CDQ.sql_domain_quality),
        "data_split": (CSP.q_data_split, CSP.sql_data_split),
        "split_by_domain": (
            CSP.q_split_by_domain, CSP.sql_split_by_domain,
        ),
        "split_emb_drift": (
            CSP.q_split_emb_drift, CSP.sql_split_emb_drift,
        ),
        "split_leakage": (CSP.q_split_leakage, CSP.sql_split_leakage),
        "hard_negatives": (CMI.q_hard_negatives, CMI.sql_hard_negatives),
        "source_drift": (CDR.q_source_drift, CDR.sql_source_drift),
        "source_lang_entropy": (
            CDR.q_source_lang_entropy, CDR.sql_source_lang_entropy,
        ),
        "source_length_quantiles": (
            CT.q_source_length_quantiles, CT.sql_source_length_quantiles,
        ),
        "heldout_ppl": (CHO.q_heldout_ppl, CHO.sql_heldout_ppl),
        "label_cohesion": (CCO.q_label_cohesion, CCO.sql_label_cohesion),
        "emb_covariance": (CCO.q_emb_covariance, CCO.sql_emb_covariance),
        "coreset_kcenter": (
            CCO.q_coreset_kcenter, CCO.sql_coreset_kcenter,
        ),
        "emb_dim_stats": (CCO.q_emb_dim_stats, CCO.sql_emb_dim_stats),
        "emb_norm_hist": (CCO.q_emb_norm_hist, CCO.sql_emb_norm_hist),
        "tok_fertility": (
            CFE.q_tok_fertility, lambda: CFE.sql_tok_fertility(SF_DIR),
        ),
        "pmi_pairs": (CK.q_pmi_pairs, CK.sql_pmi_pairs),
        "kmv_source_overlap": (
            CK.q_kmv_source_overlap, CK.sql_kmv_source_overlap,
        ),
        "zipf_fit": (CK.q_zipf_fit, CK.sql_zipf_fit),
        "token_budget_select": (
            CBU.q_token_budget_select, CBU.sql_token_budget_select,
        ),
        "pack_efficiency": (CP2.q_pack_efficiency, CP2.sql_pack_efficiency),
    }


@pytest.mark.parametrize("name", sorted(_pairs()))
def test_corpus_op_matches_oracle(name, spark, duck):
    q, sql = _pairs()[name]
    df = q(spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    cols = df.columns
    orc = duck.execute(sql())
    ocols = [d[0] for d in orc.description]
    orows = orc.fetchall()
    assert sorted(cols) == sorted(ocols)
    a = _normalize(rows, cols)
    b = _normalize(orows, ocols)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    assert a == b, f"{name}: value mismatch"


def test_neardup_pairs_find_planted_duplicates(spark):
    """The driver's synthetic corpus plants near-duplicate documents;
    MinHash-LSH + Jaccard verification must surface them (non-empty) and
    every surviving pair must clear the threshold."""
    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus import dedup as CD

    rows = CD.q_neardup_pairs(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r["jaccard"] >= C.JACCARD_THRESHOLD for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_lsh_scurve_monotone_and_consistent(spark):
    """The S-curve table: candidate rate must be a probability in
    [0, 10^6] micro units; the top decile (true near-dups) must show a
    HIGHER empirical candidate rate than the bottom decile (banding is
    doing its job); theo follows the closed form at decile midpoints."""
    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus import dedup as CD

    rows = {r["bucket"]: r for r in
            CD.q_lsh_scurve(spark, SF_DIR).collect()}
    assert rows
    b, r_ = C.LSH_BANDS, C.ROWS_PER_BAND
    for bk, r in rows.items():
        assert 0 <= bk <= 9
        assert 0 <= r["n_cand"] <= r["n_pairs"]
        assert 0 <= r["emp_micro"] <= 1_000_000
        mid = (bk * 2 + 1) / 20.0
        theo = 1.0 - (1.0 - mid ** r_) ** b
        assert r["theo_micro"] == int(theo * 1_000_000 + 0.5)
    lo, hi = min(rows), max(rows)
    if lo != hi:
        assert rows[hi]["emp_micro"] >= rows[lo]["emp_micro"]


def test_neardup_edit_bounds_and_coverage(spark):
    """Edit verification covers every verified pair exactly once, the
    distance is within [0, EDIT_PREFIX], and similarity is a proper
    [0, 1] normalization of it; identical prefixes score exactly 1."""
    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus import dedup as CD

    pairs = {(r["doc_a"], r["doc_b"])
             for r in CD.q_neardup_pairs(spark, SF_DIR).collect()}
    rows = CD.q_neardup_edit(spark, SF_DIR).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == pairs
    assert len(rows) == len(pairs)
    for r in rows:
        assert 0 <= r["edit_dist"] <= C.EDIT_PREFIX
        assert 0.0 <= r["edit_sim"] <= 1.0
        if r["edit_dist"] == 0:
            assert r["edit_sim"] == 1.0


def test_lsh_pairs_subset_of_exact_jaccard(spark):
    """The MinHash-LSH path can only MISS pairs (banding recall), never
    invent them: every LSH-verified near-dup pair must appear in the
    exact inverted-index Jaccard join with the identical score."""
    from docling_core_spark.corpus import dedup as CD

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in CD.q_jaccard_pairs(spark, SF_DIR).collect()
    }
    lsh = CD.q_neardup_pairs(spark, SF_DIR).collect()
    assert 0 < len(lsh) <= len(exact)
    for r in lsh:
        assert exact[(r["doc_a"], r["doc_b"])] == r["jaccard"]


def test_dedup_clusters_transitive_chain(spark):
    """Min-label propagation must merge a CHAIN a-b, b-c, c-d into one
    component even though a-d is not a direct pair (diameter 3 > 1
    round), and leave untouched nodes as singletons."""
    from docling_core_spark.corpus.dedup import _min_label_components

    docs = spark.createDataFrame([(i,) for i in range(7)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in _min_label_components(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_cc_iterative_path_matches_local_union_find(spark, monkeypatch):
    """`_min_label_components` finishes locally (single-task union-find)
    under CC_LOCAL_EDGE_LIMIT and iterates pointer-jumping min-label
    rounds above it; both paths must produce identical labels — checked
    on the real sf0.001 near-dup graph AND a chain whose diameter (17)
    exercises multiple jump rounds."""
    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus import dedup as CD

    def labels_for(docs, pairs):
        return {
            r["doc_id"]: r["cluster_id"]
            for r in CD._min_label_components(docs, pairs).collect()
        }

    chain_docs = spark.createDataFrame(
        [(i,) for i in range(20)], ["doc_id"]
    )
    chain_pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(2, 19)], ["doc_a", "doc_b"]
    )
    real_docs = CD.read_spread(spark, SF_DIR, "documents").select("doc_id")
    real_pairs = CD.q_neardup_pairs(spark, SF_DIR).select("doc_a", "doc_b")

    local = (labels_for(chain_docs, chain_pairs),
             labels_for(real_docs, real_pairs))
    monkeypatch.setattr(C, "CC_LOCAL_EDGE_LIMIT", 0)
    iterative = (labels_for(chain_docs, chain_pairs),
                 labels_for(real_docs, real_pairs))
    assert local == iterative
    assert local[0][19] == 2 and local[0][0] == 0  # chain semantics


def test_dedup_clusters_consistent_with_pairs(spark):
    """Every verified near-dup pair lands in one cluster; every cluster
    id is the minimum member; canonical flags mark exactly one doc per
    cluster."""
    from docling_core_spark.corpus import dedup as CD

    clusters = CD.q_dedup_clusters(spark, SF_DIR).collect()
    lbl = {r["doc_id"]: r["cluster_id"] for r in clusters}
    for p in CD.q_neardup_pairs(spark, SF_DIR).collect():
        assert lbl[p["doc_a"]] == lbl[p["doc_b"]]
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        assert sum(m["is_canonical"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)


def test_knn_is_superset_quality_of_ann(spark):
    """ANN results are drawn from the same bucket only; every ANN
    neighbor's cosine must be <= the true (brute-force) best at the same
    rank — sanity that the approximation never 'beats' exact search."""
    from docling_core_spark.corpus import similarity as CS

    knn = {
        (r["q_id"], r["rank"]): r["cos_sim"]
        for r in CS.q_knn_bruteforce(spark, SF_DIR).collect()
    }
    ann = CS.q_ann_lsh_topk(spark, SF_DIR).collect()
    assert len(ann) > 0
    for r in ann:
        exact = knn.get((r["q_id"], r["rank"]))
        if exact is not None:
            assert r["cos_sim"] <= exact + 1e-9


def test_decode_real_is_gated():
    from docling_core_spark.corpus import multimodal as CM

    with pytest.raises(NotImplementedError):
        CM.decode_real(b"bytes", "image")


def test_neardup_hot_bucket_cap(spark):
    """max_bucket drops mega-buckets before the O(bucket^2) pair
    expansion (the boilerplate-duplicate skew guard); the capped run is
    a subset of the uncapped run."""
    from docling_core_spark.corpus.dedup import q_neardup_pairs

    sf = "/root/testdata/sf0.001"
    full = {(r["doc_a"], r["doc_b"])
            for r in q_neardup_pairs(spark, sf).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in q_neardup_pairs(spark, sf, max_bucket=2).collect()}
    assert capped <= full
    # cap of 1 excludes every bucket (all candidate buckets have >= 2)
    assert q_neardup_pairs(spark, sf, max_bucket=1).count() == 0


def test_neardup_cosine_hot_bucket_cap(spark):
    from docling_core_spark.corpus.similarity import q_neardup_cosine

    sf = "/root/testdata/sf0.001"
    full = {(r["vec_a"], r["vec_b"])
            for r in q_neardup_cosine(spark, sf).collect()}
    capped = {(r["vec_a"], r["vec_b"])
              for r in q_neardup_cosine(spark, sf, max_bucket=3).collect()}
    assert capped <= full


def test_ann_recall_report_consistent(spark):
    """Both ANN methods report a recall row whose integers are
    internally consistent (0 <= hits <= truth, recall = hits/truth in
    micro units, truth = queries x k when every query has k exact
    neighbors)."""
    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus import similarity as CS

    rows = {r["method"]: r
            for r in CS.q_ann_recall(spark, SF_DIR).collect()}
    assert set(rows) == {"lsh", "ivf", "lsh_mp"}
    for r in rows.values():
        assert r["k"] == C.ANN_K
        assert 0 <= r["n_hits"] <= r["n_truth"]
        assert r["recall_micro"] == r["n_hits"] * 1_000_000 // r["n_truth"]
        assert r["meets_floor"], r
    assert rows["lsh"]["n_truth"] == rows["ivf"]["n_truth"]
    # Operating-point FLOORS, not just a report (round-3 VERDICT ask).
    # Single source of truth: the production floors the meets_floor
    # column already enforced above come from ANN_RECALL_FLOOR_MICRO
    # (ivf@NPROBE=8 >= 0.5, single-probe lsh at its documented
    # near-uniform worst case, multi-probe >= 0.6); assert the test
    # sees those exact constants rather than hand-copied duplicates.
    for method, r in rows.items():
        assert r["floor_micro"] == CS.ANN_RECALL_FLOOR_MICRO[method]
        assert r["recall_micro"] >= r["floor_micro"], r
    assert rows["lsh_mp"]["recall_micro"] > rows["lsh"]["recall_micro"]


def test_dup_passages_merges_planted_islands(spark, tmp_path):
    """Two docs sharing a 10-token passage -> one maximal island per
    doc covering exactly the shared tokens (8-gram resolution); the
    within-doc repeated passage in doc 3 is detected too; doc 4 (all
    unique) reports nothing."""
    import pandas as pd
    from docling_core_spark.corpus.dedup import q_dup_passages

    shared = " ".join(f"w{i}" for i in range(10))  # 10 shared tokens
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{uniq('a', 5)} {shared} {uniq('b', 5)}",
                f"{uniq('c', 3)} {shared}",
                f"{shared} {uniq('d', 4)} {shared}",
                uniq("e", 30),
            ],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "t"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")

    rows = {
        (r["doc_id"], r["passage_idx"]): (r["start_tok"], r["end_tok"])
        for r in q_dup_passages(spark, str(tmp_path)).collect()
    }
    # doc 1: shared passage occupies tokens 6..15 (1-based)
    assert rows[(1, 1)] == (6, 15)
    # doc 2: tokens 4..13
    assert rows[(2, 1)] == (4, 13)
    # doc 3: both copies of the passage; the second starts at token 15
    assert rows[(3, 1)] == (1, 10) and rows[(3, 2)] == (15, 24)
    assert not any(d == 4 for d, _ in rows)


def test_link_pagerank_properties(spark):
    """Structural PageRank facts on the doc->hub fixture graph: the
    static hubs ("/", "/ad", "/t", "/p") each receive an in-edge from
    every doc so they tie for the top score, while source/lang hubs
    split the doc population; every doc node is rank-source-only so
    it sits at exactly base = floor(floor(0.15 * 1e9) / N); scores are
    non-negative integers summing to <= 1e9 (floor division only ever
    loses mass)."""
    from docling_core_spark.corpus.webextract import q_link_pagerank

    rows = {r["node"]: r["score_p9"]
            for r in q_link_pagerank(spark, "/root/testdata/sf0.001").collect()}
    n = len(rows)
    base = (1_000_000_000 * 15 // 100) // n
    top_score = max(rows.values())
    top_nodes = {k for k, v in rows.items() if v == top_score}
    assert top_nodes == {"/", "/ad", "/t", "/p"}
    assert all(
        rows[h] < top_score
        for h in rows if h.startswith(("/s/", "/l/"))
    )
    doc_scores = {v for k, v in rows.items() if k.startswith("doc:")}
    assert doc_scores == {base}
    assert all(v >= 0 for v in rows.values())
    assert sum(rows.values()) <= 1_000_000_000


def test_link_hits_properties(spark):
    """Structural HITS facts on the bipartite doc->hub fixture graph:
    docs only point (pure hubs, auth_p9 = 0 after renormalization over
    a graph where no doc has an in-edge); hrefs only receive (pure
    authorities, hub_p9 = 0); the static all-doc hubs ("/", "/ad",
    "/t", "/p") tie for top authority; L1 mass per side is <= 1e9
    (floor division only ever loses mass)."""
    from docling_core_spark.corpus.webextract import q_link_hits

    rows = {r["node"]: (r["hub_p9"], r["auth_p9"])
            for r in q_link_hits(spark, "/root/testdata/sf0.001").collect()}
    docs = {k for k in rows if k.startswith("doc:")}
    hrefs = set(rows) - docs
    assert docs and hrefs
    assert all(rows[d][1] == 0 for d in docs)
    assert all(rows[h][0] == 0 for h in hrefs)
    top_auth = max(v[1] for v in rows.values())
    assert {k for k, v in rows.items() if v[1] == top_auth} == {
        "/", "/ad", "/t", "/p"}
    assert sum(v[0] for v in rows.values()) <= 1_000_000_000
    assert sum(v[1] for v in rows.values()) <= 1_000_000_000


def test_anchor_text_agg_properties(spark):
    """Structural anchor facts on the fixture graph: every doc links
    "/" with anchor "home", so "/" has one distinct anchor and as many
    in-links as docs; each "/s/{source}" hub's dominant anchor IS the
    source name; dominant-anchor counts never exceed in-link counts."""
    from docling_core_spark.corpus.webextract import (
        q_anchor_text_agg, q_extract_links,
    )

    sf = "/root/testdata/sf0.001"
    n_docs = (
        q_extract_links(spark, sf).select("doc_id").distinct().count()
    )
    rows = {r["href"]: r for r in q_anchor_text_agg(spark, sf).collect()}
    home = rows["/"]
    assert home["top_anchor"] == "home"
    assert home["n_anchors"] == 1
    assert home["n_inlinks"] == home["n_docs"] == n_docs
    for href, r in rows.items():
        assert r["top_anchor_n"] <= r["n_inlinks"]
        assert 1 <= r["n_docs"] <= n_docs
        if href.startswith("/s/"):
            assert r["top_anchor"] == href[len("/s/"):]


def test_simhash_neardup_is_exhaustive(spark):
    """The WWW'07 pigeonhole guarantee, checked against ground truth:
    blocked pair search over the sf0.001 fingerprints returns EXACTLY
    the pairs a brute-force all-pairs hamming scan finds (no blocking
    scheme miss, no spurious pair, exact distances)."""
    from itertools import combinations

    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus.dedup import (
        q_simhash, q_simhash_neardup,
    )

    sf = "/root/testdata/sf0.001"
    sims = [
        (r["doc_id"], r["simhash"])
        for r in q_simhash(spark, sf).collect()
    ]
    truth = {
        (a_id, b_id) if a_id < b_id else (b_id, a_id):
            bin(a_h ^ b_h).count("1")
        for (a_id, a_h), (b_id, b_h) in combinations(sims, 2)
        if bin(a_h ^ b_h).count("1") <= C.SIMHASH_HAMMING_MAX
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in q_simhash_neardup(spark, sf).collect()
    }
    assert got == truth


def test_dup_passages_apply_cuts_planted_spans(spark, tmp_path):
    """The rewrite must cut EXACTLY the flagged spans: the shared
    passage disappears from every doc that carries it, the unique
    remainder survives in order, the all-unique doc is untouched, and
    n_tokens - n_kept equals the flagged token mass per doc."""
    import pandas as pd
    from docling_core_spark.corpus.dedup import (
        q_dup_passages, q_dup_passages_apply,
    )

    shared = " ".join(f"w{i}" for i in range(10))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{uniq('a', 5)} {shared} {uniq('b', 5)}",
                f"{uniq('c', 3)} {shared}",
                f"{shared} {uniq('d', 4)} {shared}",
                uniq("e", 30),
            ],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "t"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")

    out = {
        r["doc_id"]: r
        for r in q_dup_passages_apply(spark, str(tmp_path)).collect()
    }
    assert out[1]["clean_text"] == f"{uniq('a', 5)} {uniq('b', 5)}"
    assert out[2]["clean_text"] == uniq("c", 3)
    assert out[3]["clean_text"] == uniq("d", 4)
    assert out[4]["clean_text"] == uniq("e", 30)
    flagged = {
        d: 0 for d in out
    }
    for r in q_dup_passages(spark, str(tmp_path)).collect():
        flagged[r["doc_id"]] += r["n_tokens"]
    for d, r in out.items():
        assert r["n_tokens"] - r["n_kept"] == flagged[d]


def test_hist_quantiles_one_bucket_guarantee(spark):
    """Each sketch estimate must bracket the exact quantile within its
    power-of-two bucket: exact <= est and est < 2 * exact + 2."""
    from docling_core_spark.corpus.textstats import (
        TOKENS_SPARK, q_hist_quantiles,
    )
    from docling_core_spark.corpus import read_spread
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    est = {r["lang"]: r for r in q_hist_quantiles(spark, sf).collect()}
    docs = read_spread(spark, sf, "documents").select(
        "lang", F.expr(f"size({TOKENS_SPARK})").alias("n")
    )
    import math

    counts = {}
    for r in docs.collect():
        counts.setdefault(r["lang"], []).append(r["n"])
    for lang, ns in counts.items():
        ns.sort()
        assert est[lang]["n_docs"] == len(ns)
        for p in (50, 90, 99):
            # rank rule mirrored from the operator: smallest value
            # whose rank satisfies cum * 100 >= p * total
            k = math.ceil(p * len(ns) / 100)
            exact = ns[k - 1]
            ub = est[lang][f"p{p}_ub"]
            assert exact <= ub, (lang, p, exact, ub)
            assert ub < 2 * exact + 2, (lang, p, exact, ub)


def test_link_cocitation_properties(spark):
    """Structural co-citation facts on the fixture graph: every doc
    links "/", so ("/", x) pairs exist for every other target x and
    their co-citation count equals x's full citing-doc count (Jaccard
    = deg_x / deg_slash); counts never exceed either degree."""
    from docling_core_spark.corpus.webextract import q_link_cocitation

    sf = "/root/testdata/sf0.001"
    rows = q_link_cocitation(spark, sf).collect()
    assert rows
    by_pair = {(r["href_a"], r["href_b"]): r for r in rows}
    for (a, b), r in by_pair.items():
        assert a < b
        assert 1 <= r["n_co"] <= min(r["deg_a"], r["deg_b"])
        assert r["jaccard_micro"] == (
            r["n_co"] * 1_000_000
            // (r["deg_a"] + r["deg_b"] - r["n_co"])
        )
        if a == "/":
            # "/" is cited by every doc, so co-citation with any
            # target equals that target's own citing count
            assert r["n_co"] == r["deg_b"]


def test_langid_confusion_is_a_partition(spark):
    """Matrix rows partition the corpus: per-true-lang cell counts sum
    to n_true, micro shares sum to 1e6 within floor slack, and every
    labeled doc appears exactly once."""
    from docling_core_spark.corpus import read_spread
    from docling_core_spark.corpus.textstats import q_langid_confusion

    sf = "/root/testdata/sf0.001"
    rows = q_langid_confusion(spark, sf).collect()
    n_docs = read_spread(spark, sf, "documents").count()
    per_true = {}
    for r in rows:
        per_true.setdefault(r["true_lang"], []).append(r)
    assert sum(r["n"] for r in rows) == n_docs
    for lang, cells in per_true.items():
        n_true = cells[0]["n_true"]
        assert all(c["n_true"] == n_true for c in cells)
        assert sum(c["n"] for c in cells) == n_true
        share = sum(c["share_micro"] for c in cells)
        assert 1_000_000 - len(cells) < share <= 1_000_000


def test_winnowing_detection_guarantee(spark, tmp_path):
    """Schleimer et al.'s theorem on planted docs: any shared passage
    of >= W + K - 1 tokens must share at least one fingerprint; the
    window guarantee (>= 1 selection per W consecutive gram positions)
    holds within every doc."""
    import pandas as pd
    from docling_core_spark.corpus.dedup import (
        WINNOW_K, WINNOW_W, q_winnow_fingerprint,
    )

    shared = " ".join(f"w{i}" for i in range(WINNOW_W + WINNOW_K - 1))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                f"{uniq('a', 7)} {shared} {uniq('b', 6)}",
                f"{uniq('c', 9)} {shared}",
                uniq("e", 40),
            ],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "t"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")

    rows = q_winnow_fingerprint(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["h"]))
    # detection: docs 1 and 2 share a fingerprint hash; doc 3 shares
    # none with either
    h1, h2 = {h for _, h in by_doc[1]}, {h for _, h in by_doc[2]}
    h3 = {h for _, h in by_doc[3]}
    assert h1 & h2
    assert not (h1 & h3) and not (h2 & h3)
    # window guarantee: every W consecutive gram positions contain a
    # selection (doc 3 has 40 - K + 1 = 36 gram positions)
    pos3 = sorted(p for p, _ in by_doc[3])
    n_grams = 40 - WINNOW_K + 1
    for start in range(1, n_grams - WINNOW_W + 2):
        assert any(start <= p < start + WINNOW_W for p in pos3), start


def test_cdc_segments_shift_robustness(spark, tmp_path):
    """The CDC property fixed windows lack: prepending one token
    re-synchronizes boundaries after a single window, so almost every
    segment digest survives the shift; segments partition each doc."""
    import pandas as pd
    from docling_core_spark.corpus.dedup import CDC_W, q_cdc_segments

    text = " ".join(f"tok{i * 7 % 97}" for i in range(400))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [text, "zzz " + text],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "t"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")

    rows = q_cdc_segments(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # partition invariant: token counts sum to doc lengths, indices dense
    assert sum(r["n_tokens"] for r in by_doc[1]) == 400
    assert sum(r["n_tokens"] for r in by_doc[2]) == 401
    for segs in by_doc.values():
        assert sorted(r["seg_idx"] for r in segs) == list(
            range(1, len(segs) + 1)
        )
    # shift-robustness: all but the first segment's digests survive the
    # one-token prepend (boundaries re-sync within CDC_W tokens)
    d1 = {r["digest"] for r in by_doc[1]}
    d2 = {r["digest"] for r in by_doc[2]}
    assert len(d1 & d2) >= len(d1) - 2, (len(d1), len(d1 & d2))


def test_hot_bucket_caps_on_new_pair_searches(spark, tmp_path):
    """An exact-duplicate mega-cluster collapses into single hot
    buckets; max_bucket must drop those buckets (their pairs belong to
    exact dedup) while distinct near-dup pairs survive."""
    import pandas as pd
    from docling_core_spark.corpus.dedup import (
        clear_caches, q_simhash_neardup, q_winnow_overlap,
    )

    base = " ".join(f"tok{i * 13 % 89}" for i in range(60))
    docs = pd.DataFrame(
        {
            # 30 identical docs (the mega-cluster) + 2 distinct docs
            # sharing most content with each other but not the cluster
            "doc_id": list(range(1, 31)) + [100, 101],
            "text": ["dup " * 40] * 30
            + [base + " extraa", base + " extrab"],
        }
    )
    docs["lang"] = "en"
    docs["source"] = "t"
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(tmp_path / "documents.parquet")
    sf = str(tmp_path)
    try:
        capped = q_simhash_neardup(spark, sf, max_bucket=10).collect()
        ids = {r["doc_a"] for r in capped} | {r["doc_b"] for r in capped}
        assert ids <= {100, 101}  # mega-cluster buckets dropped
        assert (100, 101) in {(r["doc_a"], r["doc_b"]) for r in capped}
        uncapped = q_simhash_neardup(spark, sf).collect()
        assert len(uncapped) > len(capped)  # cluster pairs were real

        wcap = q_winnow_overlap(spark, sf, max_bucket=10).collect()
        wids = {r["doc_a"] for r in wcap} | {r["doc_b"] for r in wcap}
        assert wids <= {100, 101}
        assert any(
            (r["doc_a"], r["doc_b"]) == (100, 101) for r in wcap
        )
    finally:
        clear_caches()


def test_pq_codes_structure_and_adc_usefulness(spark):
    """Every vector gets exactly PQ_M codes in [0, PQ_KS); ADC top-k
    must retrieve vectors substantially closer (exact L2) than the
    corpus average — the quantized index preserves neighborhood
    structure even on the near-uniform synthetic embeddings."""
    import numpy as np
    from docling_core_spark.corpus import read_spread
    from docling_core_spark.corpus.similarity import (
        PQ_KS, PQ_M, q_pq_encode, q_pq_search,
    )

    sf = "/root/testdata/sf0.001"
    codes = q_pq_encode(spark, sf).collect()
    per_vec = {}
    for r in codes:
        assert 0 <= r["code"] < PQ_KS
        assert r["qerr_micro"] >= 0
        per_vec.setdefault(r["vec_id"], set()).add(r["m"])
    assert all(ms == set(range(PQ_M)) for ms in per_vec.values())

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in read_spread(spark, sf, "embeddings").collect()
    }
    hits = q_pq_search(spark, sf).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r["q_id"], []).append(r["neighbor_id"])
    assert by_q and all(len(v) == 5 for v in by_q.values())
    # near-uniform synthetic embeddings are the documented worst case
    # for quantized retrieval (cf. IVF recall notes in SCALE.md);
    # measured ratios here are 0.73-0.82, so gate at 0.9 for EVERY
    # query — retrieved sets must beat the corpus average decisively
    for q_id, nbrs in by_q.items():
        qv = emb[q_id]
        d_all = np.mean(
            [np.sum((qv - v) ** 2) for k, v in emb.items() if k != q_id]
        )
        d_ret = np.mean([np.sum((qv - emb[n]) ** 2) for n in nbrs])
        assert d_ret < 0.9 * d_all, (q_id, d_ret / d_all)


def test_repetition_ladder_on_crafted_docs(spark, tmp_path):
    """A doc that is one bigram repeated -> top_frac_2 ~ 1 and fails
    keep; fluent text with no repeats -> every rung ~ 0 and keeps; a
    doc with one duplicated 5-gram covers exactly its tokens once."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from docling_core_spark.corpus import filters as CF

    docs = [
        (1, "spam ham " * 30),                      # all one bigram
        (2, "the quick brown fox jumps over a lazy dog near town "
           "while seven bright children quietly watched from the old "
           "wooden bridge above the winding river yesterday evening"),
        # the 5-gram "a b c d e" appears twice, rest unique
        (3, "a b c d e x1 x2 x3 x4 a b c d e y1 y2 y3 y4"),
    ]
    pq.write_table(
        pa.table({
            "doc_id": [d[0] for d in docs],
            "text": [d[1].strip() for d in docs],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(d[1]) for d in docs],
        }),
        tmp_path / "documents.parquet",
    )
    rows = {
        r["doc_id"]: r
        for r in CF.q_repetition_ladder(spark, str(tmp_path)).collect()
    }
    assert rows[1]["top_frac_2"] > 0.9 and not rows[1]["keep"]
    assert rows[2]["top_frac_2"] < 0.3 and rows[2]["keep"]
    # doc 3: duplicated 5-gram covers tokens 'a b c d e' twice = 10 of
    # 18 tokens, all 1-2 chars; covered char frac is 10/26
    r3 = rows[3]
    assert abs(r3["dup_frac_5"] - 10 / 26) < 1e-6
    assert r3["dup_frac_6"] == 0.0


def test_ccnet_buckets_partition_and_order(spark):
    """Labels partition each lang into contiguous score bands: every
    head doc scores >= every middle doc, which scores >= every tail
    doc, within each lang; tercile sizes are within one histogram
    bucket of n/3."""
    from docling_core_spark.corpus import lm as CL

    rows = CL.q_ccnet_buckets(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    order = {"tail": 0, "middle": 1, "head": 2}
    for lang, rs in by_lang.items():
        for a in rs:
            for b in rs:
                if order[a["ppl_bucket"]] > order[b["ppl_bucket"]]:
                    assert a["bucket"] > b["bucket"] or (
                        a["bucket"] == b["bucket"]
                    ) is False
        n = len(rs)
        n_tail = sum(1 for r in rs if r["ppl_bucket"] == "tail")
        # histogram cutoffs guarantee AT LEAST a third at the cut
        assert n_tail * 3 >= n - 2


def test_media_dedup_sharing_factor(spark):
    """Every digest's n_refs is <= the synthetic sharing factor, the
    keeper is the min media_id of its group, and total wasted bytes =
    sum over groups of (n-1) * size."""
    from docling_core_spark.corpus import multimodal as CM

    rows = CM.q_media_dedup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_refs"] <= CM.MEDIA_ASSET_GROUP
        assert r["wasted_bytes"] == (r["n_refs"] - 1) * r["bytes_each"]
        assert r["keeper_id"] % CM.MEDIA_ASSET_GROUP in range(
            CM.MEDIA_ASSET_GROUP
        )
    n_refs_total = sum(r["n_refs"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert n_refs_total == docs


def test_bm25_ranking_properties(spark):
    """Monotonicity and formula sanity: every returned doc contains at
    least one query term; rank order follows score; a doc hitting more
    query terms with equal tf's outranks fewer-term hits of comparable
    length (checked via the n_terms_hit ordering among top ranks)."""
    from docling_core_spark.corpus import bm25 as CB

    rows = CB.q_bm25_topk(spark, SF_DIR).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {q for q, _ in CB.BM25_QUERIES}
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    qterms = dict(CB.BM25_QUERIES)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert len(rs) == CB.BM25_TOPK
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            toks = set(texts[r["doc_id"]].lower().split())
            hit = toks & set(qterms[qid])
            assert len(hit) == r["n_terms_hit"] > 0


def test_bm25_salted_topk_equals_plain_topk(spark):
    """The two-level salted cut must be algebraically identical to a
    single global top-K per query (same deterministic tie-break)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from docling_core_spark.corpus import bm25 as CB

    got = {
        (r["query_id"], r["rk"]): r["doc_id"]
        for r in CB.q_bm25_topk(spark, SF_DIR).collect()
    }
    # recompute without salting
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        (q, rk): d
        for q, rk, d, *_ in con.execute(CB.sql_bm25_topk()).fetchall()
    }
    assert got == want


def test_normalize_recovers_and_uplift_direction(spark):
    from docling_core_spark.corpus import normalize as CN

    rows = CN.q_text_normalize(spark, SF_DIR).collect()
    assert all(r["recovered"] for r in rows)
    # changed iff a mess class actually rewrote the base bytes
    # (class 0 leaves even the boilerplate docs byte-identical)
    for r in rows:
        assert r["changed"] == (r["doc_id"] % 4 != 0), r["doc_id"]
    census = {
        r["group_size"]: r
        for r in CN.q_normalize_uplift(spark, SF_DIR).collect()
    }
    # canonical hashing merges the boilerplate classes that raw-byte
    # hashing keeps apart: canon must have at least one group strictly
    # larger than any raw group
    max_raw = max(g for g, r in census.items() if r["n_groups_raw"] > 0)
    max_canon = max(
        g for g, r in census.items() if r["n_groups_canon"] > 0
    )
    assert max_canon > max_raw
    # and canonical dedup never finds FEWER duplicate docs
    dup_raw = sum(
        g * r["n_groups_raw"] for g, r in census.items() if g > 1
    )
    dup_canon = sum(
        g * r["n_groups_canon"] for g, r in census.items() if g > 1
    )
    assert dup_canon >= dup_raw


def test_lm2_interpolation_bounds(spark):
    """The bigram model must help exactly where context helps: for
    every doc both scores are finite negatives, and corpus-wide the
    bigram-interpolated average log-prob is >= the unigram's minus the
    smoothing penalty (bigram context concentrates mass on seen
    continuations). Also: repeated-context docs score strictly better
    under lm2 than the corpus median."""
    from docling_core_spark.corpus import lm as CL, lm2 as CL2

    uni = {r["doc_id"]: r["avg_logprob"]
           for r in CL.q_lm_score(spark, SF_DIR).collect()}
    bi = {r["doc_id"]: r["avg_logprob2"]
          for r in CL2.q_lm2_score(spark, SF_DIR).collect()}
    assert set(uni) == set(bi)
    assert all(v < 0 for v in bi.values())
    import statistics

    # corpus-level: conditioning can only add information on average
    assert statistics.mean(bi.values()) > statistics.mean(uni.values())


def test_data_split_partition_and_lineage(spark):
    from functools import reduce

    from docling_core_spark.corpus import splits as SP
    from docling_core_spark.corpus.textstats import _h30_spark
    from pyspark.sql import functions as F

    rows = {r["split"]: r for r in SP.q_data_split(spark, SF_DIR).collect()}
    assert set(rows) == {"train", "val", "test"}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    assert sum(r["n_docs"] for r in rows.values()) == n
    assert rows["train"]["n_docs"] > 0.8 * n
    # XOR over splits reproduces the corpus lineage (exactly-once)
    total = docs.select(
        F.expr(f"bit_xor({_h30_spark('cast(doc_id as string)')})").alias("x")
    ).collect()[0]["x"]
    assert reduce(
        lambda a, b: a ^ b, (r["lineage_xor"] for r in rows.values())
    ) == total


def test_split_leakage_only_spanning_clusters(spark):
    from docling_core_spark.corpus import dedup as CD, splits as SP

    CD.clear_caches()
    try:
        leaks = SP.q_split_leakage(spark, SF_DIR).collect()
        clusters = CD.q_dedup_clusters(spark, SF_DIR).collect()
    finally:
        CD.clear_caches()
    sizes = {}
    for r in clusters:
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
    for r in leaks:
        assert r["n_train"] >= 1 and r["n_eval"] >= 1
        assert r["n_train"] + r["n_eval"] == sizes[r["cluster_id"]]
        assert len(r["leaked_ids"].split(",")) == min(r["n_eval"], 10)


def test_domain_quality_consistency(spark):
    """keep_ppm and dup_ppm are exact integer ratios of the row's own
    counts; totals reconcile with the corpus."""
    from docling_core_spark.corpus import domains as DQ

    rows = DQ.q_domain_quality(spark, SF_DIR).collect()
    assert rows
    n_total = sum(r["n_pages"] for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert n_total == docs
    for r in rows:
        assert r["keep_ppm"] == r["n_keep"] * 1_000_000 // r["n_pages"]
        assert 0 <= r["dup_ppm"] <= 1_000_000


def test_hard_negatives_triplet_invariants(spark):
    """Negatives sit strictly below the dup threshold; when an anchor
    has a positive, every triplet margin is positive (pos >= threshold
    > neg); ranks are dense and ordered by descending neg_cos."""
    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus import mining as MI
    from docling_core_spark.corpus import similarity as CS

    CS.clear_caches()
    try:
        rows = MI.q_hard_negatives(spark, SF_DIR).collect()
    finally:
        CS.clear_caches()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        cos = [r["neg_cos"] for r in rs]
        assert cos == sorted(cos, reverse=True)
        for r in rs:
            assert r["neg_cos"] < C.COSINE_NEARDUP_THRESHOLD
            if r["pos_cos"] is not None:
                assert r["pos_cos"] >= C.COSINE_NEARDUP_THRESHOLD
                assert r["margin"] > 0


def test_source_drift_detects_planted_shift(spark, tmp_path):
    """A source whose vocabulary diverges from the corpus must score a
    strictly higher KL than sources drawn from the shared
    distribution."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import drift as DR

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(40):
        src = f"s{i % 4}"
        text = shared if i % 4 != 3 else "spam spam buy now " * 3
        rows.append((i, text.strip(), "en", src))
    pq.write_table(
        pa.table({
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }),
        tmp_path / "documents.parquet",
    )
    kl = {
        r["source"]: r["kl_micro"]
        for r in DR.q_source_drift(spark, str(tmp_path)).collect()
    }
    assert kl["s3"] > max(kl["s0"], kl["s1"], kl["s2"])


def test_heldout_ppl_oov_and_gap(spark, tmp_path):
    """Planted construction: a word that appears ONLY in heldout docs
    must register as OOV there, drive heldout perplexity above train
    perplexity, and never corrupt the train row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import heldout as HO
    from docling_core_spark.corpus.splits import _split_expr

    import duckdb

    base = "alpha beta gamma delta epsilon"
    # find doc_ids landing in each split under the real split hash
    con = duckdb.connect()
    split_of = dict(
        con.execute(
            "SELECT doc_id, " + _split_expr(True)
            + " FROM (SELECT unnest(range(0, 400)) AS doc_id)"
        ).fetchall()
    )
    train_ids = [i for i, s in split_of.items() if s == "train"][:30]
    ho_ids = [i for i, s in split_of.items() if s != "train"][:10]
    assert train_ids and ho_ids
    rows = [(i, base) for i in train_ids] + [
        (i, base + " zxqwv") for i in ho_ids  # zxqwv never in train
    ]
    pq.write_table(
        pa.table({
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }),
        tmp_path / "documents.parquet",
    )
    out = {r["split"]: r for r in HO.q_heldout_ppl(spark, str(tmp_path)).collect()}
    assert out["train"]["n_oov"] == 0
    ho_rows = [out[s] for s in ("val", "test") if s in out]
    assert sum(r["n_oov"] for r in ho_rows) == len(ho_ids)
    assert all(
        r["perplexity"] > out["train"]["perplexity"] for r in ho_rows
    )


def test_events_funnel_monotone(spark):
    import __spark_entry__ as E

    rows = {r["stage"]: r for r in E.queries()["events_funnel"](
        spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["conv_ppm"] == 1_000_000
    for r in rows.values():
        assert r["conv_ppm"] == r["n_users"] * 1_000_000 // rows[1]["n_users"]


def test_label_cohesion_planted_tight_cluster(spark, tmp_path):
    """A label whose members all point the same way must out-cohere
    labels with random members."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import cohesion as CO
    from docling_core_spark.corpus import constants as C

    rng = np.random.default_rng(7)
    tight = np.tile(
        rng.normal(size=C.EMB_DIM), (20, 1)
    ) + rng.normal(scale=0.01, size=(20, C.EMB_DIM))
    loose = rng.normal(size=(20, C.EMB_DIM))
    vecs = np.vstack([tight, loose]).astype("float32")
    pq.write_table(
        pa.table({
            "vec_id": list(range(40)),
            "embedding": [list(map(float, v)) for v in vecs],
            "label": [0] * 20 + [1] * 20,
        }),
        tmp_path / "embeddings.parquet",
    )
    rows = {r["label"]: r for r in CO.q_label_cohesion(
        spark, str(tmp_path)).collect()}
    assert rows[0]["mean_cos"] > 0.95
    assert rows[0]["mean_cos"] > rows[1]["mean_cos"] + 0.3


def test_emb_dim_stats_planted_dead_and_hot_dim(spark, tmp_path):
    """A dim that is zero everywhere must show n_zero == n_vecs; a dim
    scaled 10x must dominate the RMS census; min/max micros are exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import cohesion as CO
    from docling_core_spark.corpus import constants as C

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, C.EMB_DIM))
    vecs[:, 4] = 0.0          # dead dim 5 (1-based)
    vecs[:, 9] *= 10.0        # hot dim 10
    vecs = vecs.astype("float32")
    pq.write_table(
        pa.table({
            "vec_id": list(range(30)),
            "embedding": [list(map(float, v)) for v in vecs],
            "label": [0] * 30,
        }),
        tmp_path / "embeddings.parquet",
    )
    rows = {r["dim"]: r for r in CO.q_emb_dim_stats(
        spark, str(tmp_path)).collect()}
    assert len(rows) == C.EMB_DIM
    assert rows[5]["n_zero"] == rows[5]["n_vecs"] == 30
    assert rows[5]["min_micro"] == rows[5]["max_micro"] == 0
    assert rows[10]["rms"] == max(r["rms"] for r in rows.values())
    import math
    exp_max = math.floor(float(vecs[:, 9].max()) * 1_000_000)
    assert rows[10]["max_micro"] == exp_max


def test_tok_fertility_counts_unk_and_fertility(spark, tmp_path):
    """Planted: a vocab-covered word yields no [UNK]; gibberish with
    characters outside the vocab alphabet tokenizes to [UNK] and is
    counted; fertility_ppm is the exact integer tokens-per-word ppm."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.chunk.wordpiece import load_default
    from docling_core_spark.corpus import fertility as FE

    tok = load_default()
    covered = "the"
    gib = "☃☄☠"  # snowman etc.: outside the vocab alphabet
    assert tok.wordpiece(gib) == ["[UNK]"]
    n_tok_covered = len(tok.wordpiece(covered))
    pq.write_table(
        pa.table({
            "doc_id": [1, 2],
            "text": [f"{covered} {covered}", f"{covered} {gib}"],
            "lang": ["en", "zz"],
            "source": ["t", "t"],
            "n_chars": [7, 5],
        }),
        tmp_path / "documents.parquet",
    )
    rows = {r["lang"]: r for r in FE.q_tok_fertility(
        spark, str(tmp_path)).collect()}
    assert rows["en"]["n_unk"] == 0
    assert rows["en"]["n_tokens"] == 2 * n_tok_covered
    assert rows["en"]["fertility_ppm"] == (
        2 * n_tok_covered * 1_000_000 // 2
    )
    assert rows["zz"]["n_unk"] == 1


def test_pmi_pairs_planted_collocation(spark, tmp_path):
    """A planted always-adjacent pair must out-PMI a pair whose
    components also occur apart."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import keywords as KW

    # "los angeles": always together; "new" appears with "york" but
    # also alone everywhere else -> lower PMI
    doc = ("los angeles " * 6) + ("new york " * 6) + ("new day " * 20)
    pq.write_table(
        pa.table({
            "doc_id": [1],
            "text": [doc.strip()],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": [len(doc)],
        }),
        tmp_path / "documents.parquet",
    )
    rows = {r["gram"]: r for r in KW.q_pmi_pairs(
        spark, str(tmp_path)).collect()}
    assert "los angeles" in rows and "new york" in rows
    assert rows["los angeles"]["pmi_micro"] > rows["new york"]["pmi_micro"]


def test_token_budget_select_is_greedy_prefix(spark, duck):
    """The selected set must be exactly the quality-ordered prefix:
    every selected doc's q_micro >= every rejected doc's (up to the
    boundary tie broken by doc_id), and the kept token mass must be
    the largest prefix within 40% of the corpus total."""
    from docling_core_spark.corpus import budget as BU

    rows = BU.q_token_budget_select(spark, SF_DIR).collect()
    assert rows
    total = duck.execute(
        "SELECT sum(len(regexp_split_to_array(lower(trim(text)),"
        " '\\s+')))::BIGINT FROM documents"
    ).fetchone()[0]
    budget_tokens = total * BU.TOKEN_BUDGET_PPM // 1_000_000
    kept = sum(r["n_tokens"] for r in rows)
    assert kept <= budget_tokens
    # maximal prefix: adding the best rejected doc would bust the budget
    max_cum = max(r["cum_tokens"] for r in rows)
    assert kept == max_cum
    sel_ids = {r["doc_id"] for r in rows}
    from docling_core_spark.corpus.textstats import sql_quality

    nxt = duck.execute(f"""
        SELECT floor(quality_score * 1000000 + 0.5)::BIGINT AS q_micro,
               doc_id
        FROM ({sql_quality()})
        ORDER BY q_micro DESC, doc_id ASC
    """).fetchall()
    ordered_ids = [d for _, d in nxt]
    assert set(ordered_ids[:len(sel_ids)]) == sel_ids


def test_containment_pairs_planted_embedded_doc(spark, tmp_path):
    """A short doc fully embedded in a much longer one has containment
    1.0 but Jaccard far below the dedup threshold: containment_pairs
    must surface exactly that pair (and the symmetric join must not)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import constants as C
    from docling_core_spark.corpus import dedup as CD

    wire = " ".join(f"wire{i}" for i in range(20))
    page = (
        " ".join(f"pre{i}" for i in range(80))
        + " " + wire + " "
        + " ".join(f"post{i}" for i in range(80))
    )
    other = " ".join(f"zzz{i}" for i in range(40))
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": [wire, page, other],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(wire), len(page), len(other)],
        }),
        tmp_path / "documents.parquet",
    )
    CD.clear_caches()
    try:
        got = CD.q_containment_pairs(spark, str(tmp_path)).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        assert r["c_a"] == 1.0          # wire fully inside page
        assert r["jaccard"] < C.JACCARD_THRESHOLD
        sym = CD.q_jaccard_pairs(spark, str(tmp_path)).collect()
        assert not any(
            {p["doc_a"], p["doc_b"]} == {1, 2} for p in sym
        )
    finally:
        CD.clear_caches()


def test_pack_efficiency_invariants(spark, duck):
    """The dashboard must be consistent with the packed layout itself:
    sequence count covers the token mass, straddle count matches the
    per-doc first/last sequence table, and multi-seq docs straddle."""
    from docling_core_spark.corpus import packing as PK

    row = PK.q_pack_efficiency(spark, SF_DIR).collect()[0]
    pack = PK.q_pack_sequences(spark, SF_DIR).collect()
    total = sum(r["n_tokens"] for r in pack)
    assert row["total_tokens"] == total
    assert row["n_sequences"] == (total + PK.SEQ_LEN - 1) // PK.SEQ_LEN
    straddle = sum(1 for r in pack if r["first_seq"] != r["last_seq"])
    assert row["n_straddling_docs"] == straddle
    assert row["n_multi_seq_docs"] <= straddle or straddle == 0
    assert 0 < row["last_seq_fill_ppm"] <= 1_000_000


def test_shingle_novelty_duplicate_contributes_nothing(spark, tmp_path):
    """An exact duplicate of an earlier doc must have novelty 0; the
    first doc owns everything it introduced."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import dedup as CD

    a = " ".join(f"alpha{i}" for i in range(30))
    b = " ".join(f"beta{i}" for i in range(30))
    pq.write_table(
        pa.table({
            "doc_id": [1, 2, 3],
            "text": [a, a, b],  # doc 2 is an exact dup of doc 1
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(a), len(a), len(b)],
        }),
        tmp_path / "documents.parquet",
    )
    CD.clear_caches()
    try:
        rows = {r["doc_id"]: r for r in CD.q_shingle_novelty(
            spark, str(tmp_path)).collect()}
        assert rows[1]["novelty_ppm"] == 1_000_000
        assert rows[2]["novelty_ppm"] == 0
        assert rows[3]["novelty_ppm"] == 1_000_000
    finally:
        CD.clear_caches()


def test_source_lang_entropy_monolingual_vs_mixed(spark, tmp_path):
    """A monolingual source must have entropy 0 / purity 1e6; an even
    two-language source must approach ln(2) micro-nats with purity
    500000."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import drift as DR

    rows = [("mono", "en")] * 10 + [("mixed", "en")] * 5 + [
        ("mixed", "de")] * 5
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(rows))),
            "text": ["hello world"] * len(rows),
            "lang": [r[1] for r in rows],
            "source": [r[0] for r in rows],
            "n_chars": [11] * len(rows),
        }),
        tmp_path / "documents.parquet",
    )
    out = {r["source"]: r for r in DR.q_source_lang_entropy(
        spark, str(tmp_path)).collect()}
    assert out["mono"]["entropy_micronat"] == 0
    assert out["mono"]["purity_ppm"] == 1_000_000
    assert out["mono"]["top_lang"] == "en"
    import math
    ln2_micro = math.floor(0.5 * math.log(2) * 1e6) * 2
    assert abs(out["mixed"]["entropy_micronat"] - ln2_micro) <= 2
    assert out["mixed"]["purity_ppm"] == 500_000
    # equal counts 5/5: the string argmax breaks ties toward the
    # lexicographically larger lang ('en' > 'de'), same in both engines
    assert out["mixed"]["top_lang"] == "en"
    assert out["mixed"]["n_langs"] == 2


def test_events_spikes_planted_burst(spark, tmp_path):
    """A type with one 10x burst hour must show a large positive max_z
    and peak_count equal to the burst; a perfectly flat type reports
    max_z NULL."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h in range(12):
        n = 40 if h == 5 else 4
        for i in range(n):
            rows.append((eid, eid % 7, "bursty",
                         t0 + dt.timedelta(hours=h, seconds=i), 1.0))
            eid += 1
        for i in range(3):
            rows.append((eid, eid % 7, "flat",
                         t0 + dt.timedelta(hours=h, seconds=30 + i), 1.0))
            eid += 1
    pq.write_table(
        pa.table({
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "ts": pa.array([r[3] for r in rows],
                           type=pa.timestamp("us")),
            "value": [r[4] for r in rows],
        }),
        tmp_path / "events.parquet",
    )
    import __spark_entry__ as E

    out = {r["event_type"]: r for r in E.queries()["events_spikes"](
        spark, str(tmp_path)).collect()}
    assert out["bursty"]["peak_count"] == 40
    assert out["bursty"]["max_z"] > 3.0
    assert out["flat"]["max_z"] is None
    assert out["flat"]["peak_count"] == 3
    assert out["bursty"]["n_buckets"] == 12


def test_zipf_fit_recovers_minus_one_on_zipfian_text(spark, tmp_path):
    """A corpus built with freq(word_i) = floor(600/i) is Zipf with
    exponent 1; the fitted slope must land near -1 (the synthetic gate
    corpus itself is template-heavy and fits much flatter — which is
    exactly what the scalar is for)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import keywords as KW

    words = []
    for i in range(1, 200):
        words += [f"w{i:03d}"] * (600 // i)
    text = " ".join(words)
    pq.write_table(
        pa.table({
            "doc_id": [1],
            "text": [text],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": [len(text)],
        }),
        tmp_path / "documents.parquet",
    )
    row = KW.q_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row["n_terms"] == 199
    assert -1.15 < row["zipf_slope"] < -0.85


def test_source_length_quantiles_bracket_exact(spark, duck):
    """Bucketed quantiles must bracket DuckDB's exact per-source
    percentiles within one bucket width."""
    from docling_core_spark.corpus import textstats as TS

    approx = {r["source"]: r for r in TS.q_source_length_quantiles(
        spark, SF_DIR).collect()}
    exact = {
        s: (p50, p90, p99)
        for s, p50, p90, p99 in duck.execute("""
            SELECT source,
                   quantile_disc(n_chars, 0.50),
                   quantile_disc(n_chars, 0.90),
                   quantile_disc(n_chars, 0.99)
            FROM documents GROUP BY source
        """).fetchall()
    }
    w = TS.LEN_BUCKET_W
    for s, (e50, e90, e99) in exact.items():
        a = approx[s]
        for got, want in (
            (a["p50_chars"], e50), (a["p90_chars"], e90),
            (a["p99_chars"], e99),
        ):
            assert want <= got <= want + w, (s, got, want)


def test_emb_covariance_matches_numpy(spark):
    """The distributed integer-sufficient-statistics covariance equals
    numpy's covariance of the same milli-quantized vectors (to the
    1-micro rounding the query performs), and every diagonal entry is
    a positive variance."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from docling_core_spark.corpus import cohesion as CCO

    rows = {(r["i"], r["j"]): r for r in
            CCO.q_emb_covariance(spark, SF_DIR).collect()}
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    x = np.array([list(v) for v in emb["embedding"].to_pylist()],
                 dtype=np.float64)
    xm = np.floor(x * 1000.0)  # the query's milli quantization
    cov = np.cov(xm, rowvar=False)  # ddof=1, in milli^2 = micro units
    assert len(rows) == xm.shape[1] * (xm.shape[1] + 1) // 2
    for (i, j), r in rows.items():
        assert i <= j
        want = cov[int(i), int(j)]
        assert math.isclose(r["cov_micro"], want, abs_tol=1.0), (i, j)
        if i == j:
            assert r["cov_micro"] > 0


def test_emb_pca_matches_numpy_and_whitens(spark):
    """Driver-side eigensolve over the distributed covariance matches
    numpy PCA on the quantized data; the whitening expression projects
    to top-k with (approximately) unit variance per component."""
    import numpy as np
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from docling_core_spark.corpus import cohesion as CCO

    vals, comps, expl = CCO.emb_pca(spark, SF_DIR, top_k=4)
    assert list(vals) == sorted(vals, reverse=True)
    assert 0 < sum(expl) <= 1_000_000
    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    x = np.floor(np.array(
        [list(v) for v in emb["embedding"].to_pylist()], np.float64
    ) * 1000.0)
    ref_vals = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False)))[::-1]
    assert np.allclose(vals[:4], ref_vals[:4], atol=2.0)
    # whitening: project on Spark, variance per component ~= 1e6
    # (eigvals are micro units, scale = 1/sqrt(val_micro) => var of the
    # milli-quantized projection / 1e6 ~ 1) up to quantization slack
    expr = CCO.whiten_expr(comps, vals, top_k=4)
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.expr(expr).alias("w")
    )
    w = np.array([r["w"] for r in df.collect()])
    var = w.var(axis=0, ddof=1) * 1e6  # embedding vs milli-quantized
    assert np.all(var > 0.5) and np.all(var < 2.0)


def test_emb_pca_var_identity_holds(spark):
    """The gate row's quadratic-form variance (c^T Sigma c over the
    exact-integer covariance) must reproduce the committed eigenvalue
    within the milli quantization of the component artifact, and
    explained fractions must be positive and descending-ish sane."""
    from docling_core_spark.corpus.cohesion import q_emb_pca_var

    rows = q_emb_pca_var(spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["eigval_micro"] > 0
        # milli-quantized components perturb c^T Sigma c by O(|c|/1000)
        assert abs(r["diff_micro"]) <= max(100, r["eigval_micro"] // 100), (
            r["comp"], r["diff_micro"], r["eigval_micro"])
        assert 0 < r["explained_ppm"] < 1_000_000


def test_zorder_layout_narrows_user_zone_maps(spark):
    """The measurable reason z-ordering exists: the time-ordered
    baseline's per-file user_id zone maps span ~the whole domain (no
    skipping for user predicates), while the z-order layout bounds
    BOTH dimensions — a user_id point predicate must skip most
    z-ordered files."""
    from docling_core_spark.corpus.maintenance import (
        ZORDER_FILES, q_zorder_layout,
    )

    rows = q_zorder_layout(spark, SF_DIR).collect()
    by = {}
    for r in rows:
        by.setdefault(r["layout"], []).append(r)
    assert set(by) == {"time", "zorder"}
    n_rows = {k: sum(r["n_rows"] for r in v) for k, v in by.items()}
    assert n_rows["time"] == n_rows["zorder"]  # both place every row
    mean_u = {
        k: sum(r["max_u8"] - r["min_u8"] + 1 for r in v) / len(v)
        for k, v in by.items()
    }
    # z-order user spans must be at least 4x tighter than time-ordered
    assert mean_u["zorder"] * 4 <= mean_u["time"], mean_u
    for r in by["zorder"]:
        assert 0 <= r["file_id"] < ZORDER_FILES
        assert r["zone_area"] >= r["n_rows"] // 64  # sane stats


def test_dehyphenate_repairs_crafted(spark):
    """The hyphen repair must merge a crafted 'exam- ple' split back
    and leave non-hyphen tokens alone; chained hyphens cannot occur in
    the synthesis (every 7th token), asserted by construction here."""
    import duckdb

    from docling_core_spark.corpus.normalize import (
        q_dehyphenate, sql_dehyphenate,
    )

    rows = q_dehyphenate(spark, SF_DIR).collect()
    assert all(r.recovered for r in rows)
    assert all(r.changed_iff_split for r in rows)
    assert sum(r.n_splits for r in rows) > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    orc = set(map(tuple, con.execute(sql_dehyphenate()).fetchall()))
    assert {tuple(r) for r in rows} == orc


def test_fuzzy_decontaminate_catches_injected_renders(spark):
    """The injected lightly-edited eval renders (1/24 tokens replaced)
    must be flagged with high containment, and every flagged row must
    clear the containment floor."""
    from docling_core_spark.corpus import dedup as CD

    rows = CD.q_fuzzy_decontaminate(spark, SF_DIR).collect()
    assert len(rows) > 0
    inj = [r for r in rows
           if r["doc_id"] >= CD.FUZZY_VARIANT_BASE]
    assert len(inj) > 0
    for r in inj:
        # a 1/24 edit rate keeps >= ~7/8 of the eval shingles
        assert r["containment"] >= 0.8
        assert (r["doc_id"] - CD.FUZZY_VARIANT_BASE) == r["eval_doc_id"]
    for r in rows:
        assert r["containment"] >= CD.FUZZY_DECON_MIN


def test_coreset_kcenter_greedy_invariants(spark):
    """Radii are non-increasing after the seed, picks are distinct,
    and pick 2 is genuinely the farthest point from the seed (verified
    against a direct one-shot Spark computation)."""
    from docling_core_spark.corpus import cohesion as CCO

    rows = sorted(
        CCO.q_coreset_kcenter(spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert len(rows) == CCO.KCENTER_K
    assert rows[0]["min_dist2"] == -1
    assert len({r["vec_id"] for r in rows}) == CCO.KCENTER_K
    radii = [r["min_dist2"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)
    assert all(r > 0 for r in radii)
