"""Custom stateful streaming operator: cross-micro-batch exact dedup.

A training-data ingest stream must drop documents whose content was
already seen in ANY earlier micro-batch — not just within the current
one. Spark has no built-in for this; it is the canonical
`applyInPandasWithState` use case (the prompt's "custom stateful
operators" slot):

  - stream is keyed by content hash (md5 of text payload — the same
    exact-dedup key as the batch `dedup_exact` op);
  - per key, a tiny GroupState records whether the key was emitted;
  - first arrival wins and is emitted; later arrivals (same or later
    micro-batches) are suppressed;
  - state is O(#distinct keys); at 10^12 docs you shard the stream by
    hash prefix so each state store holds its slice and set `ttl_ms`
    so state is bounded by the sliding dedup window (processing-time
    timeout evicts keys unseen for ttl_ms; an eviction means a later
    duplicate re-emits — the documented bounded-window trade-off).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import schema as S

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("doc_id", StringType()),
        StructField("n_spans", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("seen", BooleanType())])


def _dedup_fn_with_ttl(ttl_ms: int):
    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # dedup window elapsed with no new arrivals: drop the key so
            # state stays bounded (a later duplicate re-emits — bounded-
            # window semantics, the documented trade for O(window) state)
            state.remove()
            return
        if state.exists:
            if ttl_ms > 0:
                state.setTimeoutDuration(ttl_ms)  # slide the window
            return  # key already emitted in an earlier micro-batch
        # deterministic winner inside a micro-batch: the MIN doc_id of
        # the key's rows in this batch, compared in the column's NATIVE
        # type (row order across files/partitions is not deterministic;
        # min makes replay == oracle). Rendered to string only at the
        # output boundary (DEDUP_OUT_SCHEMA).
        first = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.loc[[pdf["doc_id"].idxmin()]]
            if (
                first is None
                or cand["doc_id"].iloc[0] < first["doc_id"].iloc[0]
            ):
                first = cand
        if first is None:
            return
        state.update((True,))
        if ttl_ms > 0:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                "doc_id": [str(first["doc_id"].iloc[0])],
                "n_spans": [int(first["n_spans"].iloc[0])],
            }
        )

    return fn


def dedup_text_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
):
    """Text-keyed twin of `dedup_stream` for plain (doc_id, text)
    tables: key = md5(text) (the batch dedup_exact key), payload =
    char length. Exact forever-dedup (NoTimeout) with AvailableNow —
    the configuration the gate's deterministic replay
    (replay.q_stream_dedup_replay) drains batch by batch. `schema` is
    the (doc_id, text) StructType of the staged batch files; doc_id
    keeps its native type through the min-winner comparison and is
    rendered to string only at the output boundary."""
    src = (
        spark.readStream.schema(schema)
        # one staged file per micro-batch: the replay gate maps file k
        # to micro-batch k (replay.py)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    keyed = src.select(
        "doc_id",
        F.md5(F.encode("text", "utf-8")).alias("content_hash"),
        F.length("text").cast("long").alias("n_spans"),
    )
    deduped = keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn_with_ttl(0),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    ttl_ms: int = 0,
    processing_time: str = "",
):
    """File-stream of (doc_id, spans) -> first-seen rows per content
    hash, exactly once across restarts (state lives in the checkpoint).

    ttl_ms > 0 bounds state growth: a key unseen for ttl_ms is evicted
    (processing-time timeout), so the dedup window is sliding rather
    than unbounded — the state-hygiene knob a perpetual 100 TB ingest
    needs (state size = O(keys seen within the window), not O(all keys
    ever)). ttl_ms = 0 keeps the exact forever-dedup semantics.

    `processing_time` selects a continuous trigger (e.g. "1 second")
    instead of AvailableNow — use it with ttl_ms: processing-time
    timers keep an AvailableNow query from self-terminating after the
    backlog drains, so bounded-window dedup runs as a long-lived stream
    (which is also its real deployment shape)."""
    src = (
        spark.readStream.schema(S.DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    keyed = src.select(
        "doc_id",
        F.md5(
            F.encode(
                F.concat_ws(
                    "\x1f",
                    F.transform(
                        "spans", lambda s: F.concat_ws(
                            "\x1e", s["kind"], s["text"], s["media_ref"]
                        )
                    ),
                ),
                "utf-8",
            )
        ).alias("content_hash"),
        F.size("spans").cast("long").alias("n_spans"),
    )
    deduped = keyed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn_with_ttl(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms > 0
            else GroupStateTimeout.NoTimeout
        ),
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
