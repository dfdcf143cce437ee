"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship metric is end-to-end extraction throughput (docs/sec) of the
span pipeline (parse + normalize + validate + reading-order + serialize to
markdown/doctags/html/etree + span_seq), plus the relational operator suite
over the driver's parquet tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("docling-core-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_pipeline(spark, n_docs: int, cpus: int) -> dict:
    """Generate corpus (cached, excluded from timing), then time the
    extraction pipeline end to end."""
    from pyspark.sql import functions as F

    from docling_core_spark.pipeline import run_pipeline, synth_docs

    parts = cpus * 2
    docs = synth_docs(spark, n_docs, partitions=parts).cache()
    total_docs = docs.count()  # materialize input outside the timed section
    t0 = time.time()
    out = run_pipeline(docs)
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_items").alias("items"),
        F.sum(F.length("markdown")).alias("md_chars"),
        F.sum("parse_anomalies").alias("anoms"),
    ).collect()[0]
    dt = time.time() - t0
    docs.unpersist()
    assert agg["n"] == total_docs
    return {
        "sec": dt,
        "docs": int(agg["n"]),
        "docs_per_sec": agg["n"] / dt,
        "items": int(agg["items"]),
        "md_chars": int(agg["md_chars"]),
    }


def _pipeline_main():
    """Flagship pipeline timing in a FRESH dedicated JVM (invoked as a
    subprocess): sharing a JVM with the query suite couples the two
    through executor/python-worker memory pressure in whichever order
    they run (measured 3x pipeline slowdown after the suite, and 5-10x
    suite inflation after the pipeline)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 100_000).selectExpr("sum(id)").collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    pipe = bench_pipeline(spark, n_docs * 10, cpus)
    print("PIPEJSON:" + json.dumps(pipe))
    spark.stop()


def _run_pipeline_subprocess() -> dict:
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--pipeline-only"],
        capture_output=True, text=True, timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PIPEJSON:"):
            return json.loads(line[len("PIPEJSON:"):])
    raise RuntimeError(
        f"pipeline subprocess failed: {proc.stdout[-2000:]}"
        f" {proc.stderr[-2000:]}"
    )


def main():
    if "--pipeline-only" in sys.argv:
        _pipeline_main()
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # flagship first, in its own fresh JVM (see _pipeline_main)
    pipe = _run_pipeline_subprocess()

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    q_times = {}

    # JVM/codegen warmup so the first timed query isn't charged for it
    spark.range(0, 100_000).selectExpr(
        "sum(id)", "count(distinct id % 7)"
    ).collect()

    for name, fn in E.queries().items():
        if name.startswith("pipeline_"):
            continue  # covered by the flagship timing above
        best = None
        for _ in range(2):  # best-of-2: shields against host-side stalls
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        q_times[name] = round(best, 3)

    q_times["pipeline_extract"] = round(pipe["sec"], 3)

    total = sum(q_times.values())
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": q_times,
                "sf": sf,
                "docs_per_sec_extract": round(pipe["docs_per_sec"], 1),
                "pipeline": pipe,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
