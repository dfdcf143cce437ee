"""Measure seg_dedup wall time + shuffle bytes, new vs old formulation.

The round-3 seg_dedup exchanged full segment STRINGS twice (keeper
groupBy keyed on seg text, then a per-doc collect_list(struct(ord,
seg)) rebuild). Round 4 hashes segments to md5 map-side so only (32B
digest, doc_id, ord) crosses the keeper exchange, rebuilds from kept
ordinals (ints), and re-derives kept text from the UN-exploded scan.
This script times both and reads per-job shuffle metrics from the UI
REST API so the reduction is a measured number, not an estimate.

Usage: python tools/measure_seg_shuffle.py [sf_dir] [cpus]
"""

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PORT = 4057


def _stages(app_base):
    return json.load(urllib.request.urlopen(f"{app_base}/stages"))


def _shuffle_totals(app_base):
    st = _stages(app_base)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in st),
        sum(s.get("shuffleReadBytes", 0) for s in st),
        sum(s.get("shuffleWriteRecords", 0) for s in st),
    )


def old_seg_dedup(spark, sf_dir):
    """Round-3 formulation (strings cross both exchanges) — kept here
    verbatim as the measurement control."""
    from pyspark.sql import functions as F

    from docling_core_spark.corpus import read_spread
    from docling_core_spark.corpus.dedup import _segments_spark

    docs = read_spread(spark, sf_dir, "documents")
    segrows = docs.select(
        "doc_id", F.explode(F.expr(_segments_spark())).alias("s")
    ).select("doc_id", F.col("s.ord").alias("ord"),
             F.col("s.seg").alias("seg"))
    keep = (
        segrows.groupBy("seg")
        .agg(F.min(F.struct("doc_id", "ord")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"),
                F.col("k.ord").alias("ord"), "seg")
    )
    kept = keep.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "named_struct('ord', ord, 'seg', seg))), x -> x.seg), ' ')"
        ).alias("kept_text"),
    )
    sizes = docs.select(
        "doc_id",
        F.expr(
            f"cast(size({_segments_spark()}) as bigint)"
        ).alias("n_segs"),
    )
    return (
        sizes.join(kept, "doc_id", "left")
        .select(
            "doc_id", "n_segs",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.expr(
                "cast(length(coalesce(kept_text, '')) as bigint)"
            ).alias("n_chars_kept"),
            F.expr("md5(coalesce(kept_text, ''))").alias("kept_md5"),
        )
    )


def old_core(spark, sf_dir):
    """Round-3 keeper+rebuild aggregations only (no final text join) —
    isolates the exchanges the hashing change targets."""
    from pyspark.sql import functions as F

    from docling_core_spark.corpus import read_spread
    from docling_core_spark.corpus.dedup import _segments_spark

    docs = read_spread(spark, sf_dir, "documents")
    segrows = docs.select(
        "doc_id", F.explode(F.expr(_segments_spark())).alias("s")
    ).select("doc_id", F.col("s.ord").alias("ord"),
             F.col("s.seg").alias("seg"))
    keep = (
        segrows.groupBy("seg")
        .agg(F.min(F.struct("doc_id", "ord")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"),
                F.col("k.ord").alias("ord"), "seg")
    )
    return keep.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "named_struct('ord', ord, 'seg', seg))), x -> x.seg), ' ')"
        ).alias("kept_text"),
    )


def new_core(spark, sf_dir):
    """Round-4 keeper+rebuild aggregations only (hashed exchange)."""
    from pyspark.sql import functions as F

    from docling_core_spark.corpus import read_spread
    from docling_core_spark.corpus.dedup import _segments_spark

    docs = read_spread(spark, sf_dir, "documents")
    segrows = docs.select(
        "doc_id", F.explode(F.expr(_segments_spark())).alias("s")
    ).select("doc_id", F.col("s.ord").alias("ord"),
             F.unhex(F.md5(F.col("s.seg"))).alias("h"))
    keep = (
        segrows.groupBy("h")
        .agg(F.min(F.struct("doc_id", "ord")).alias("k"))
        .select(F.col("k.doc_id").alias("doc_id"),
                F.col("k.ord").alias("ord"))
    )
    return keep.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.sort_array(F.collect_list("ord")).alias("kept_ords"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(PORT))
        .getOrCreate()
    )
    import __spark_entry__ as E

    base = f"http://localhost:{PORT}/api/v1/applications"
    app = json.load(urllib.request.urlopen(base))[0]["id"]
    app_base = f"{base}/{app}"

    out = {"sf_dir": sf_dir, "cpus": cpus}
    for name, fn in (
        ("old_strings", old_seg_dedup),
        ("new_hashed", E.queries()["seg_dedup"]),
        ("old_core", old_core),
        ("new_core", new_core),
    ):
        # warm (codegen+scan) then measured run; delta the cumulative
        # shuffle counters around the measured run only
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        w0, r0, n0 = _shuffle_totals(app_base)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        w1, r1, n1 = _shuffle_totals(app_base)
        out[name] = {
            "wall_sec": round(wall, 2),
            "shuffle_write_bytes": w1 - w0,
            "shuffle_read_bytes": r1 - r0,
            "shuffle_write_records": n1 - n0,
            "bytes_per_record": round((w1 - w0) / max(n1 - n0, 1), 1),
        }
    ow = out["old_strings"]["shuffle_write_bytes"]
    nw = out["new_hashed"]["shuffle_write_bytes"]
    out["write_bytes_ratio_old_over_new"] = round(ow / max(nw, 1), 2)
    oc = out["old_core"]["shuffle_write_bytes"]
    nc = out["new_core"]["shuffle_write_bytes"]
    out["core_write_bytes_ratio"] = round(oc / max(nc, 1), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
