"""Long-document linearity stress: time the gram/segment pipelines
across document lengths on a fixed total token budget.

The gate corpus averages ~54 tokens/doc, which hides any
O(tokens^2)-per-row defect (see SCALE.md "Loop-invariant hoisting");
a web corpus routinely carries 10^4-token documents. This script
synthesizes (deterministically, in-process) corpora with the SAME
total token count but doc lengths 100 / 1,000 / 5,000 / 10,000, runs
the gram-exploding + tiling queries over each, and prints seconds per
length. Linear pipelines hold roughly constant across the row
(total work is fixed); a quadratic one grows ~10x per step.

Usage: python tools/longdoc_stress.py [total_tokens] [cpus]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def make_docs(spark, n_docs: int, toks_per_doc: int):
    # deterministic pseudo-words; vocabulary ~997 so grams repeat
    # across docs (exercising the dup join path, not just the explode)
    return spark.range(n_docs).select(
        F.col("id").cast("string").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {toks_per_doc}),"
            " i -> concat('w', pmod((id * 7919 + i) * 2654435761, 997))))"
        ).alias("text"),
    )


def main(total_tokens: int = 2_000_000, cpus: int = 8):
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from docling_core_spark.corpus import dedup as CD

    results = {}
    for toks in (100, 1_000, 5_000, 10_000):
        n_docs = max(total_tokens // toks, 1)
        docs = make_docs(spark, n_docs, toks).persist()
        docs.count()

        # monkey-read: the q_* functions read from sf_dir; instead
        # time the same expression pipelines over the synthetic table
        t = {}

        t0 = time.time()
        toks_df = docs.select("doc_id", F.expr(
            r"split(lower(trim(text)), '\\s+')").alias("toks"))
        grams = toks_df.select(
            "doc_id",
            F.explode(F.expr(CD._grams_spark(CD.PASSAGE_WORDS))).alias("g"),
        ).select(
            "doc_id",
            F.col("g.pos").alias("pos"),
            F.unhex(F.md5(F.col("g.gram"))).alias("h"),
        )
        dup = (grams.groupBy("h").agg(F.count("*").alias("c"))
               .filter(F.col("c") >= 2).select("h"))
        n = grams.join(dup, "h").count()
        t["dup_gram_join"] = round(time.time() - t0, 2)

        t0 = time.time()
        segrows = toks_df.select(
            "doc_id", F.explode(F.expr(CD._segments_spark())).alias("s")
        ).select("doc_id", F.unhex(F.md5(F.col("s.seg"))).alias("h"))
        k = segrows.groupBy("h").count().count()
        t["seg_hash_groupby"] = round(time.time() - t0, 2)

        t0 = time.time()
        from docling_core_spark.corpus.textstats import _h30_spark
        hs = toks_df.select(
            "doc_id",
            F.expr(
                f"transform({CD._grams_spark(CD.WINNOW_K)},"
                f" g -> {_h30_spark('g.gram')})"
            ).alias("hs"),
        )
        w = hs.select(
            "doc_id", F.explode(F.expr(CD._winnow_expr(False))).alias("fp")
        ).count()
        t["winnow"] = round(time.time() - t0, 2)

        t0 = time.time()
        from docling_core_spark.corpus.textstats import TILE_W
        w_ = TILE_W
        base = toks_df.select(
            "doc_id", "toks",
            F.expr(f"cast(size(toks) div {w_} as int)").alias("m"),
        ).where("m >= 2")
        tiled = base.select(
            "doc_id", "m",
            F.expr(
                f"transform(sequence(0, m - 1),"
                f" i -> array_distinct(slice(toks, i * {w_} + 1, {w_})))"
            ).alias("wins"),
        )
        simmed = tiled.select(
            "doc_id", "m",
            F.expr(
                "transform(sequence(1, m - 1), i ->"
                " transform(array(size(array_intersect("
                "element_at(wins, i), element_at(wins, i + 1)))),"
                " inter -> named_struct('gap', i,"
                " 'jac', cast(inter as bigint) * 1000000 div"
                "  (size(element_at(wins, i))"
                "   + size(element_at(wins, i + 1)) - inter)))[0])"
            ).alias("sims"),
        )
        tt = simmed.select(
            F.explode_outer("sims").alias("b")
        ).where("b is not null").count()
        t["texttiling"] = round(time.time() - t0, 2)

        docs.unpersist()
        results[toks] = t
        print(f"len={toks:>6} docs={n_docs:>6} {t}", flush=True)

    print(json.dumps({"total_tokens": total_tokens, "cpus": cpus,
                      "by_doc_len": results}))
    spark.stop()


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 2_000_000, int(a[1]) if len(a) > 1 else 8)
