"""Stream-static broadcast-join enrichment: the incremental-ingest
shape where each arriving fact micro-batch is joined against a slowly
changing dimension snapshot before landing in the sink (the classic
"enrich on ingest" stage of a streaming lakehouse pipeline).

Spark's stream-static join re-evaluates the static side per micro-batch
against the CURRENT snapshot; here the dimension is pinned for the whole
replay (the deterministic case the gate can oracle — a mid-replay
dimension update would make the sink depend on drain timing). The
static side is explicitly broadcast: a dimension that fits the driver
must never shuffle the fact stream.

100 TB story: the fact stream is append-only and each micro-batch joins
map-side against the broadcast dimension — zero stream-side shuffle,
exactly-once via the file-sink commit log (each drain below is a
restart against the shared checkpoint). A dimension too large to
broadcast becomes a pre-bucketed storage join instead — different
operator, same sink contract.

Reference analog: none (SURVEY.md §2.6 streaming extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def enrich(facts: DataFrame, dim: DataFrame, join_key: str) -> DataFrame:
    """The enrichment transform itself — shared by the streaming sink
    below and the batch plan audit (tests/test_plans.py asserts this
    exact expression tree plans as a BroadcastHashJoin, so the
    zero-stream-side-shuffle property cannot silently regress). Inner
    join: facts without a dimension row are quarantined upstream in a
    real pipeline."""
    return facts.join(F.broadcast(dim), join_key)


def enrich_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    dim: DataFrame,
    join_key: str,
):
    """Append-mode stream-static enrichment: each arriving batch of
    facts joins the broadcast `dim` snapshot on `join_key` and lands
    enriched in the parquet sink exactly once."""
    src = (
        spark.readStream.schema(schema)
        # one staged file per micro-batch (see sessions.py note)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    return (
        enrich(src, dim, join_key).writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
