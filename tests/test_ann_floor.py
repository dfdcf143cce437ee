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
