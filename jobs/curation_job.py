"""Production entry point for corpus curation (dedup + quality gate).

Launch (cluster):

    zip -r docling_core_spark.zip docling_core_spark
    spark-submit --py-files docling_core_spark.zip \\
        jobs/curation_job.py \\
        --input  s3a://bucket/documents/   \\
        --output s3a://bucket/curated/     \\
        --num-shards 10000 --shards-per-batch 64

Launch (sandbox / smoke):

    python jobs/curation_job.py --input /root/testdata/sf0.001 \\
        --output /tmp/curation_run

The partition-granularity-resume design, adapted to a CORPUS-GLOBAL
decision: extraction (jobs/extract_job.py) shards by doc_id because
every transform is per-document, but exact dedup is global — a doc_id
shard cannot decide canonicality alone. So this job shards by the
CONTENT hash: shard = pmod(xxhash64(md5(text)), num_shards). Every
copy of an identical text lands in the same shard, which makes each
shard's canonical-selection decision EQUAL to the corpus-global one
(asserted in tests/test_curation_job.py), and therefore shards are
independently processable, committable, and resumable:

  - each batch of shards runs the curation decision
    (corpus.curation.curation_decide) and durably writes curated rows;
  - a per-shard ledger row commits atomically after the write (lineage
    XOR of xxhash64(doc_id), doc/kept counts, wall time); re-invoking
    the SAME command after a crash resumes at the first uncommitted
    shard;
  - `--audit` re-derives every shard's lineage from the input and
    verifies the ledger.

Driver-side orchestration only; all data work happens in Spark jobs.
Exit code 0 = all shards committed (and audit green when requested).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from dataclasses import asdict, dataclass
from typing import List, Optional

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


@dataclass
class CurationEntry:
    shard: int
    status: str          # "done"
    n_docs: int
    n_kept: int
    lineage_xor: int     # XOR of xxhash64(doc_id) over the shard input
    wall_sec: float
    batch_id: int
    committed_at: float


def _ledger_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_ledger")


def _entry_path(out_dir: str, shard: int) -> str:
    return os.path.join(_ledger_dir(out_dir), f"shard-{shard:06d}.json")


def commit_entry(out_dir: str, entry: CurationEntry) -> None:
    """Atomic single-shard commit (temp + rename; conditional PUT on an
    object store)."""
    os.makedirs(_ledger_dir(out_dir), exist_ok=True)
    final = _entry_path(out_dir, entry.shard)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(entry), f)
    os.replace(tmp, final)


def read_ledger(out_dir: str) -> List[CurationEntry]:
    d = _ledger_dir(out_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(CurationEntry(**json.load(f)))
    return out


def pending_shards(out_dir: str, num_shards: int) -> List[int]:
    done = {e.shard for e in read_ledger(out_dir) if e.status == "done"}
    return [s for s in range(num_shards) if s not in done]


def with_content_shard(docs, num_shards: int):
    """Shard on the CONTENT hash, not doc_id — the invariant that makes
    per-shard curation globally correct."""
    from pyspark.sql import functions as F

    return docs.withColumn(
        "shard",
        F.pmod(
            F.xxhash64(F.md5(F.encode("text", "UTF-8"))),
            F.lit(num_shards),
        ).cast("int"),
    )


def run_curation_with_ledger(
    spark,
    docs,
    out_dir: str,
    num_shards: int = 16,
    shards_per_batch: int = 8,
    fail_after_batches: Optional[int] = None,
) -> List[CurationEntry]:
    """Process all pending content-hash shards through the curation
    decision, durably writing curated rows per shard and committing the
    ledger after each batch. Idempotent across crashes.
    `fail_after_batches` is the test hook simulating a mid-run crash
    (raises AFTER committing that many batches)."""
    from pyspark.sql import functions as F

    from docling_core_spark.corpus.curation import curation_decide

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    data_dir = os.path.join(out_dir, "data")
    sharded = with_content_shard(docs, num_shards)

    pending = pending_shards(out_dir, num_shards)
    committed: List[CurationEntry] = []
    batch_id = 0
    for i in range(0, len(pending), shards_per_batch):
        batch = pending[i: i + shards_per_batch]
        t0 = time.time()
        subset = sharded.filter(F.col("shard").isin(batch))
        decided = curation_decide(subset.drop("shard")).join(
            subset.select("doc_id", "shard"), "doc_id"
        )
        decided.write.partitionBy("shard").mode("overwrite").parquet(
            data_dir
        )
        # per-shard stats derive from a RE-READ of what actually landed
        # in storage (the extract-job discipline): the lineage
        # fingerprint certifies durable rows, not in-flight ones
        stats = {
            r["shard"]: r
            for r in spark.read.parquet(data_dir)
            .filter(F.col("shard").isin(batch))
            .groupBy("shard")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.expr(
                    "aggregate(collect_list(xxhash64(doc_id)),"
                    " 0L, (a, x) -> a ^ x)"
                ).alias("lineage_xor"),
            )
            .collect()
        }
        wall = time.time() - t0
        for shard in batch:
            r = stats.get(shard)
            entry = CurationEntry(
                shard=shard,
                status="done",
                n_docs=int(r["n_docs"]) if r else 0,
                n_kept=int(r["n_kept"]) if r else 0,
                lineage_xor=int(r["lineage_xor"]) if r else 0,
                wall_sec=round(wall / max(len(batch), 1), 4),
                batch_id=batch_id,
                committed_at=time.time(),
            )
            commit_entry(out_dir, entry)
            committed.append(entry)
        batch_id += 1
        if fail_after_batches is not None and batch_id >= fail_after_batches:
            raise RuntimeError(
                f"simulated crash after {batch_id} batches"
            )
    return committed


def verify_lineage(spark, docs, out_dir: str, num_shards: int):
    """Re-derive every shard's lineage XOR + doc count from the INPUT
    and compare against the ledger — no shard silently skipped,
    duplicated, or partially written."""
    from pyspark.sql import functions as F

    truth = {
        r["shard"]: (int(r["x"]), int(r["n"]))
        for r in with_content_shard(docs, num_shards)
        .groupBy("shard")
        .agg(
            F.expr(
                "aggregate(collect_list(xxhash64(doc_id)),"
                " 0L, (a, x) -> a ^ x)"
            ).alias("x"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    rows = []
    for e in read_ledger(out_dir):
        tx, tn = truth.get(e.shard, (0, 0))
        rows.append(
            {
                "shard": e.shard,
                "lineage_ok": tx == e.lineage_xor and tn == e.n_docs,
            }
        )
    return rows


def build_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument(
        "--input", required=True,
        help="directory containing documents.parquet (or a parquet path)",
    )
    p.add_argument("--output", required=True, help="output/ledger root")
    p.add_argument("--num-shards", type=int, default=16)
    p.add_argument("--shards-per-batch", type=int, default=8)
    p.add_argument("--master", default=None)
    p.add_argument("--audit", action="store_true")
    return p.parse_args()


def main():
    args = build_args()
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("docling-core-spark-curation")
        .config("spark.sql.adaptive.enabled", "true")
    )
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from docling_core_spark.corpus import read_spread

    path = args.input
    if os.path.isdir(path) and os.path.exists(
        os.path.join(path, "documents.parquet")
    ):
        docs = read_spread(spark, path, "documents")
    else:
        docs = spark.read.parquet(path)

    committed = run_curation_with_ledger(
        spark, docs, args.output,
        num_shards=args.num_shards,
        shards_per_batch=args.shards_per_batch,
    )
    ledger = read_ledger(args.output)
    summary = {
        "committed_this_run": len(committed),
        "committed_total": len(ledger),
        "pending": len(pending_shards(args.output, args.num_shards)),
        "docs": sum(e.n_docs for e in ledger),
        "kept": sum(e.n_kept for e in ledger),
    }
    if args.audit:
        audit = verify_lineage(spark, docs, args.output, args.num_shards)
        bad = [r["shard"] for r in audit if not r["lineage_ok"]]
        summary["audit_ok"] = not bad
        summary["audit_bad_shards"] = bad
    print(json.dumps(summary))
    spark.stop()
    ok = summary["pending"] == 0 and summary.get("audit_ok", True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
