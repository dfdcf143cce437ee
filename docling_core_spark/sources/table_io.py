"""Table-format binding for the extraction jobs: one `load_docs` entry
point that speaks Iceberg / Delta / Hive-catalog / parquet-path refs,
so `jobs/extract_job.py` and the streaming ingest run unchanged against
the north rule's "Iceberg table of interleaved documents" and against
this sandbox's plain parquet fixtures.

Ref grammar (a plain string, CLI- and config-friendly):

    iceberg:catalog.db.docs            Iceberg catalog table
    iceberg:catalog.db.docs@12345      ... pinned to snapshot-id 12345
    delta:/lake/docs                   Delta Lake path
    table:db.docs                      any Spark-catalog table
    /path/to/docs.parquet              parquet file/directory (default)

Why snapshot pinning is load-bearing: the resume contract
(ops/ledger.py) re-derives which shards are pending from the SAME
input the failed run saw. An unpinned Iceberg read would see rows
appended since the first attempt, silently changing shard membership
mid-resume; `snapshot-id` freezes the row set, so per-partition lineage
(`verify_lineage`) stays exact across resumes. On resume, pass the
first run's `resolved_ref()` — it embeds the snapshot discovered at
job start.

Format availability: Iceberg/Delta need their runtime jars + catalog
conf on the cluster (`spark.sql.catalog.<name>` /
`spark.sql.extensions`); this sandbox has neither, so those branches
raise a clear error naming the missing config rather than failing deep
inside an opaque classloader stack. The ref parsing and dispatch are
unit-tested; the parquet branch is exercised by every other test in
the repo.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class TableRef:
    """Parsed form of a docs-table reference string."""

    format: str                    # 'iceberg' | 'delta' | 'table' | 'parquet'
    location: str                  # table identifier or path
    snapshot_id: Optional[int] = None  # iceberg only

    def render(self) -> str:
        base = (
            self.location if self.format == "parquet"
            else f"{self.format}:{self.location}"
        )
        if self.snapshot_id is not None:
            return f"{base}@{self.snapshot_id}"
        return base


def parse_ref(ref: str) -> TableRef:
    if ref.startswith("iceberg:"):
        body = ref[len("iceberg:"):]
        snap = None
        if "@" in body:
            body, snap_s = body.rsplit("@", 1)
            snap = int(snap_s)
        if not body:
            raise ValueError(f"empty iceberg table identifier in {ref!r}")
        return TableRef("iceberg", body, snap)
    if ref.startswith("delta:"):
        body = ref[len("delta:"):]
        if not body:
            raise ValueError(f"empty delta path in {ref!r}")
        return TableRef("delta", body)
    if ref.startswith("table:"):
        body = ref[len("table:"):]
        if not body:
            raise ValueError(f"empty table identifier in {ref!r}")
        return TableRef("table", body)
    return TableRef("parquet", ref)


def _require_catalog(spark: SparkSession, ref: TableRef) -> None:
    """Fail fast with the exact missing configuration instead of a
    classloader stack from inside the datasource."""
    if ref.format == "iceberg":
        catalog = ref.location.split(".", 1)[0]
        key = f"spark.sql.catalog.{catalog}"
        if spark.conf.get(key, None) is None:
            raise RuntimeError(
                f"iceberg ref {ref.render()!r} needs the runtime jars and"
                f" catalog conf ({key}=org.apache.iceberg.spark."
                "SparkCatalog + warehouse settings) on this cluster"
            )
    elif ref.format == "delta":
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        if "io.delta.sql.DeltaSparkSessionExtension" not in ext:
            raise RuntimeError(
                f"delta ref {ref.render()!r} needs delta-spark jars and"
                " spark.sql.extensions="
                "io.delta.sql.DeltaSparkSessionExtension"
            )


def load_docs(spark: SparkSession, ref: str) -> DataFrame:
    """Load the interleaved-docs table named by `ref` (see module doc
    for the grammar)."""
    t = parse_ref(ref)
    if t.format == "iceberg":
        _require_catalog(spark, t)
        reader = spark.read.format("iceberg")
        if t.snapshot_id is not None:
            reader = reader.option("snapshot-id", str(t.snapshot_id))
        return reader.load(t.location)
    if t.format == "delta":
        _require_catalog(spark, t)
        return spark.read.format("delta").load(t.location)
    if t.format == "table":
        return spark.read.table(t.location)
    return spark.read.parquet(t.location)


def resolved_ref(spark: SparkSession, ref: str) -> str:
    """The ref a RESUME must use: for an unpinned Iceberg ref, discover
    the CURRENT snapshot and embed it, freezing the row set for the
    whole (possibly multi-attempt) job. Identity for every other
    format — parquet inputs are immutable by convention and Delta
    pinning would use `versionAsOf` the same way.

    Snapshot ids are random longs (NOT monotonic) and `.snapshots`
    also lists rolled-back/branch ancestors, while `.history`
    timestamps can tie at millisecond resolution — so the current
    snapshot comes from the `.refs` metadata table's main branch,
    which names it exactly."""
    t = parse_ref(ref)
    if t.format == "iceberg" and t.snapshot_id is None:
        _require_catalog(spark, t)
        row = (
            spark.read.format("iceberg")
            .load(f"{t.location}.refs")
            .where("name = 'main' AND type = 'BRANCH'")
            .select("snapshot_id")
            .collect()
        )
        if not row:
            raise RuntimeError(
                f"iceberg table {t.location!r} has no main-branch"
                " snapshot yet — nothing to pin (write data before"
                " launching the job)"
            )
        return TableRef(
            "iceberg", t.location, int(row[0]["snapshot_id"])
        ).render()
    return ref
