"""Multimodal column plumbing: opaque `binary` payloads + typed metadata,
decoded / feature-extracted through Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the decode step is a
DETERMINISTIC STAND-IN (sha256-derived features) with the real decode
marked by `decode_real()` raising NotImplementedError. What IS real and
tested end-to-end is the Spark-side plumbing that matters at 100 TB:
  - binary column + metadata struct schema,
  - `mapInPandas` over Arrow batches (bytes arrive as pd.Series of
    bytes; one Python roundtrip per BATCH, not per row),
  - bounded batch sizes via spark.sql.execution.arrow.maxRecordsPerBatch
    so one huge payload cannot blow an executor,
  - frame sampling as a JVM-side posexplode (no Python).

Because the stand-in features are pure functions of the payload, the
DuckDB oracle recomputes them in SQL and the driver's gate verifies the
whole multimodal path by value.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import read_spread
from pyspark.sql import types as T

MEDIA_KINDS = ["image", "audio", "video"]


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from `documents`: payload bytes are the
    utf-8 text (a deterministic opaque blob), kind cycles by doc_id, and
    the metadata struct mimics decoded-media headers."""
    docs = read_spread(spark, sf_dir, "documents")
    kinds = ", ".join(f"'{k}'" for k in MEDIA_KINDS)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(
            f"element_at(array({kinds}), cast(doc_id % 3 as int) + 1)"
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.expr("cast(320 + doc_id % 320 as int)").alias("width"),
            F.expr("cast(240 + doc_id % 240 as int)").alias("height"),
            F.expr("cast(n_chars / 16 as int)").alias("duration_s"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, kind: str):
    """Real decoder entry point — requires PIL/ffmpeg, absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "decode_features uses the deterministic sha256 stand-in"
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha_hex", T.StringType()),
        T.StructField("sig_md5", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        shas = [hashlib.sha256(p).hexdigest() for p in pdf["payload"]]
        sigs = [
            hashlib.md5(
                ",".join(
                    str(int(s[2 * i: 2 * i + 2], 16)) for i in range(8)
                ).encode()
            ).hexdigest()
            for s in shas
        ]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "sha_hex": shas,
                "sig_md5": sigs,
                "width": [m["width"] for m in pdf["meta"]],
                "height": [m["height"] for m in pdf["meta"]],
            }
        )


def q_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal feature-extraction stage: Arrow batches -> pandas
    -> per-payload features. Stand-in for image resize / audio
    fingerprint / embedding extraction."""
    return media_df(spark, sf_dir).mapInPandas(
        _decode_batches, schema=FEATURES_SCHEMA
    )


def sql_decode_features() -> str:
    sig8 = ", ".join(
        f"(('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT)::VARCHAR"
        for i in range(8)
    )
    kinds = ", ".join(f"'{k}'" for k in MEDIA_KINDS)
    return f"""
        SELECT doc_id AS media_id,
               ([{kinds}])[(doc_id % 3)::INT + 1] AS kind,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha_hex,
               md5(concat_ws(',', {sig8})) AS sig_md5,
               (320 + doc_id % 320)::INT AS width,
               (240 + doc_id % 240)::INT AS height
        FROM documents
    """


MAX_EDGE = 256  # resize target: fit the longest edge to 256 px

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("dst_w", T.IntegerType()),
        T.StructField("dst_h", T.IntegerType()),
        T.StructField("resized_sig", T.StringType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        sigs = [
            hashlib.md5(
                f"{hashlib.sha256(p).hexdigest()}:{w}x{h}".encode()
            ).hexdigest()
            for p, w, h in zip(pdf["payload"], pdf["dst_w"], pdf["dst_h"])
        ]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "src_w": pdf["src_w"],
                "src_h": pdf["src_h"],
                "dst_w": pdf["dst_w"],
                "dst_h": pdf["dst_h"],
                "resized_sig": sigs,
            }
        )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: the target geometry (aspect-preserving fit
    of the longest edge to MAX_EDGE, never upscaling) is INTEGER-exact
    JVM expressions — pushed before the Python stage so the Arrow batch
    carries exactly what the resampler needs; the per-payload resample
    itself is the deterministic stand-in (real codec = decode_real,
    absent here). Zero shuffle: filter + projection + one mapInPandas."""
    media = media_df(spark, sf_dir).filter(F.col("kind") == "image")
    sized = media.select(
        "media_id",
        "payload",
        F.col("meta.width").alias("src_w"),
        F.col("meta.height").alias("src_h"),
        F.expr(
            f"cast(CASE WHEN greatest(meta.width, meta.height) <= {MAX_EDGE}"
            f" THEN meta.width ELSE (meta.width * {MAX_EDGE})"
            f" div greatest(meta.width, meta.height) END as int)"
        ).alias("dst_w"),
        F.expr(
            f"cast(CASE WHEN greatest(meta.width, meta.height) <= {MAX_EDGE}"
            f" THEN meta.height ELSE (meta.height * {MAX_EDGE})"
            f" div greatest(meta.width, meta.height) END as int)"
        ).alias("dst_h"),
    )
    return sized.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


def sql_media_resize() -> str:
    w = "(320 + doc_id % 320)::INT"
    h = "(240 + doc_id % 240)::INT"
    m = f"greatest({w}, {h})"
    dst_w = f"CASE WHEN {m} <= {MAX_EDGE} THEN {w} ELSE ({w} * {MAX_EDGE}) // {m} END"
    dst_h = f"CASE WHEN {m} <= {MAX_EDGE} THEN {h} ELSE ({h} * {MAX_EDGE}) // {m} END"
    return f"""
        SELECT doc_id AS media_id,
               {w} AS src_w,
               {h} AS src_h,
               ({dst_w})::INT AS dst_w,
               ({dst_h})::INT AS dst_h,
               md5(sha256(text) || ':' || ({dst_w})::VARCHAR || 'x'
                   || ({dst_h})::VARCHAR) AS resized_sig
        FROM documents
        WHERE doc_id % 3 = 0
    """


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video rows: JVM-side posexplode of the sampled
    timeline — the Python decoder is only ever invoked per sampled frame
    downstream, never per video."""
    media = media_df(spark, sf_dir)
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(
                F.expr("sequence(0, greatest(meta.duration_s - 1, 0), 4)")
            ).alias("frame_idx", "frame_ts"),
        )
    )


def sql_frame_sample() -> str:
    return """
        SELECT doc_id AS media_id,
               (unnest(generate_series(0,
                    greatest((n_chars // 16)::INT - 1, 0), 4))
                // 4)::INT AS frame_idx,
               unnest(generate_series(0,
                    greatest((n_chars // 16)::INT - 1, 0), 4)) AS frame_ts
        FROM documents
        WHERE doc_id % 3 = 2
    """


# ---------------------------------------------------------------------------
# media_dedup: binary-asset dedup by content digest
# ---------------------------------------------------------------------------

MEDIA_ASSET_GROUP = 4  # synthetic sharing factor: ~4 docs embed one asset


def asset_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the attachment table: every document references one
    binary asset, and consecutive same-source documents share one
    (doc_id div 4) — the hotlinked-logo / repeated-stock-photo shape a
    real crawl's media store sees. Payload bytes are a deterministic
    function of (asset group, source), with a group-dependent filler so
    sizes vary."""
    docs = read_spread(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(
            f"encode(concat('ASSET-', cast(doc_id div"
            f" {MEDIA_ASSET_GROUP} as string), '-', source, '-',"
            f" repeat('x', cast((doc_id div {MEDIA_ASSET_GROUP}) % 7"
            f" as int) * 16)), 'utf-8')"
        ).alias("payload"),
    )


def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup over the attachment store: one row per
    distinct payload digest with its reference count, canonical keeper
    (min media_id), per-copy size, and the byte savings a
    dedup-by-digest store realizes. The CommonCrawl/LAION image-dedup
    step, as a first-class oracle-checked query.

    100 TB story: the payload bytes NEVER cross an exchange — the scan
    projects (media_id, md5(payload), length(payload)) and only those
    three narrow columns shuffle into one map-side-combined groupBy on
    the uniform digest key. Keeper selection is an agg min, not a
    window; output is distinct-asset-sized, not corpus-sized."""
    assets = asset_df(spark, sf_dir).select(
        "media_id",
        F.md5("payload").alias("digest"),
        F.expr("cast(length(payload) as bigint)").alias("n_bytes"),
    )
    return assets.groupBy("digest").agg(
        F.count("*").cast("bigint").alias("n_refs"),
        F.min("media_id").alias("keeper_id"),
        F.min("n_bytes").alias("bytes_each"),
        F.expr("cast((count(*) - 1) * min(n_bytes) as bigint)").alias(
            "wasted_bytes"
        ),
    )


def sql_media_dedup() -> str:
    g = MEDIA_ASSET_GROUP
    payload = (
        f"'ASSET-' || (doc_id // {g})::VARCHAR || '-' || source || '-'"
        f" || repeat('x', (((doc_id // {g}) % 7) * 16)::INT)"
    )
    return f"""
        WITH assets AS (
            SELECT doc_id AS media_id,
                   md5({payload}) AS digest,
                   octet_length(encode({payload}))::BIGINT AS n_bytes
            FROM documents
        )
        SELECT digest,
               COUNT(*)::BIGINT AS n_refs,
               MIN(media_id) AS keeper_id,
               MIN(n_bytes) AS bytes_each,
               ((COUNT(*) - 1) * MIN(n_bytes))::BIGINT AS wasted_bytes
        FROM assets GROUP BY digest
    """
