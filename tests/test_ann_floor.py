"""ANN recall floor: the gate row's meets_floor column must be TRUE for
every method at the default operating point (IVF nprobe=8 ->
recall@3 >= 0.5; banded LSH >= 0.2; multi-probe LSH >= 0.6 on the
worst-case near-uniform synthetic embeddings). A silent recall
regression now fails pytest AND flips the gate hash, instead of just
lowering a doc figure."""

from docling_core_spark.corpus import similarity as CS


def test_recall_meets_floor_at_gate_sf(spark):
    rows = {
        r["method"]: r
        for r in CS.q_ann_recall(spark, "/root/testdata/sf0.01").collect()
    }
    assert set(rows) == {"ivf", "lsh", "lsh_mp"}
    for method, r in rows.items():
        assert r["floor_micro"] == CS.ANN_RECALL_FLOOR_MICRO[method]
        assert r["meets_floor"], (
            f"{method} recall {r['recall_micro']}µ under floor "
            f"{r['floor_micro']}µ"
        )
    # ivf at nprobe=8 must hold the 0.5 line specifically
    assert rows["ivf"]["recall_micro"] >= 500_000


def test_cluster_topics_shape_and_determinism(spark):
    """Every cell gets at most TOPIC_TOP_K ranked terms, ranks are
    dense from 1, and counts are non-increasing within a cell."""
    from docling_core_spark.corpus.similarity import (
        TOPIC_TOP_K, q_cluster_topics,
    )

    rows = q_cluster_topics(spark, '/root/testdata/sf0.01').collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.c_id, []).append(r)
    for c, rs in by_cell.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOPIC_TOP_K
        cnts = [r.cnt for r in rs]
        assert cnts == sorted(cnts, reverse=True)


def test_sq8_error_bounded_by_step(spark):
    """SQ8 reconstruction error is at most half a quantization step per
    element: max_err_micro <= ceil((mx-mn)/255/2 * 1e6) + 1 per dim."""
    from docling_core_spark.corpus.similarity import q_emb_quantize_int8

    rows = q_emb_quantize_int8(spark, '/root/testdata/sf0.01').collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n > 0 and r.max_err_micro >= 0
        assert r.sum_err_micro <= r.n * (r.max_err_micro + 1)


def test_bitext_margins_sane(spark):
    """Every query is non-English, its best match is English, margins
    are >= 1e6 ppm by construction (top-1 >= mean of top-K), and the
    query set is the documented bounded id range."""
    from docling_core_spark.corpus.similarity import (
        BITEXT_QUERY_MAX_ID, q_bitext_mine,
    )

    rows = q_bitext_mine(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.q_lang != "en" and r.q_id < BITEXT_QUERY_MAX_ID
        assert r.margin_ppm >= 1_000_000
