"""Sequence packing: assign every document a contiguous token range in
the GPT-style concat-then-chunk training layout (documents concatenated
in a deterministic global order, the token stream cut into fixed
SEQ_LEN sequences), so a training job knows exactly which sequences and
offsets each document lands in.

The global token offset is a corpus-wide prefix sum — the textbook
"doesn't fit one window" operator. A naive `sum() OVER (ORDER BY ...)`
with no partition key forces the whole corpus through ONE task; instead
the offset is computed as a two-level prefix sum:

1. docs are assigned to ``PACK_GROUPS`` groups by document hash
   (uniform by construction); the within-group running sum is a
   window over the uniform group key — every partition-sized task;
2. per-group totals (PACK_GROUPS rows, tiny) get their own exclusive
   running sum — the only global window, over the group table, never
   the corpus;
3. the group-prefix table is BROADCAST back and
   ``global_start = group_prefix + within_group_prefix``.

The deterministic concat order is (group, doc-hash, doc_id) — stable
across runs, engines, and cluster sizes. All integer math, so the
DuckDB oracle (same three steps) matches bit-for-bit.

Token counts use the whitespace tokenizer shared with the corpus ops;
a production run would swap in the vendored WordPiece counts
(chunk/wordpiece.py) — same plumbing, different count column.

Reference analog: none — training-data extension surface. Packing
semantics follow the public GPT/T5 "concatenate documents, split into
SEQ_LEN blocks" recipe (Brown et al. 2020 §2.2; Raffel et al. 2020).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import read_spread
from .textstats import TOKENS_DUCK, TOKENS_SPARK, _h30_duck, _h30_spark

SEQ_LEN = 2048
# Prefix-sum fan-out: the group count bounds the global window to
# PACK_GROUPS rows. 64 here; a production run sizes it ~10x the
# executor count so within-group windows stay task-sized.
PACK_GROUPS = 64


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("n_tokens"),
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    ).withColumn("g", F.expr(f"cast(h % {PACK_GROUPS} as bigint)"))

    w_in = (
        Window.partitionBy("g")
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = docs.withColumn(
        "cum_in_group", F.sum("n_tokens").over(w_in).cast("bigint")
    )

    totals = docs.groupBy("g").agg(
        F.sum("n_tokens").cast("bigint").alias("group_total")
    )
    w_g = (
        Window.orderBy(F.asc("g"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = totals.withColumn(
        "group_prefix",
        (F.sum("group_total").over(w_g) - F.col("group_total"))
        .cast("bigint"),
    ).select("g", "group_prefix")

    out = within.join(F.broadcast(prefixes), "g").select(
        "doc_id",
        "n_tokens",
        (F.col("group_prefix") + F.col("cum_in_group")
         - F.col("n_tokens")).cast("bigint").alias("global_start"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "global_start",
        F.expr(f"cast(global_start div {SEQ_LEN} as bigint)").alias(
            "first_seq"
        ),
        F.expr(
            f"cast(case when n_tokens = 0 then global_start div {SEQ_LEN}"
            f" else (global_start + n_tokens - 1) div {SEQ_LEN} end"
            " as bigint)"
        ).alias("last_seq"),
        F.expr(
            f"cast(global_start % {SEQ_LEN} as bigint)"
        ).alias("start_pos"),
    )


def sql_pack_sequences() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len({TOKENS_DUCK})::BIGINT AS n_tokens,
                   {h} AS h
            FROM documents
        ),
        grouped AS (
            SELECT *, (h % {PACK_GROUPS})::BIGINT AS g FROM base
        ),
        within AS (
            SELECT *,
                   sum(n_tokens) OVER (
                       PARTITION BY g ORDER BY h ASC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum_in_group
            FROM grouped
        ),
        totals AS (
            SELECT g, sum(n_tokens)::BIGINT AS group_total
            FROM grouped GROUP BY g
        ),
        prefixes AS (
            SELECT g,
                   (sum(group_total) OVER (
                       ORDER BY g ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - group_total)::BIGINT AS group_prefix
            FROM totals
        ),
        placed AS (
            SELECT w.doc_id, w.n_tokens,
                   (p.group_prefix + w.cum_in_group - w.n_tokens)::BIGINT
                       AS global_start
            FROM within w JOIN prefixes p USING (g)
        )
        SELECT doc_id, n_tokens, global_start,
               (global_start // {SEQ_LEN})::BIGINT AS first_seq,
               (CASE WHEN n_tokens = 0 THEN global_start // {SEQ_LEN}
                     ELSE (global_start + n_tokens - 1) // {SEQ_LEN}
                END)::BIGINT AS last_seq,
               (global_start % {SEQ_LEN})::BIGINT AS start_pos
        FROM placed
    """


# ---------------------------------------------------------------------------
# shard_manifest: the final-mile table a training run reads
# ---------------------------------------------------------------------------

N_OUTPUT_SHARDS = 16


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every packed sequence to an output shard and emit the
    per-shard manifest a trainer's data loader consumes: sequence
    count, contributing doc-slice count, token mass, and a lineage
    XOR over the sequence hashes (the extract/curation jobs' audit
    fingerprint, here certifying that every sequence landed in exactly
    one shard — XOR over all shards reproduces the corpus total).

    100 TB story: sequence membership explodes from the packing
    table's (first_seq, last_seq) spans — bounded per doc by
    ceil(n_tokens / SEQ_LEN) + 1; the shard key is the 30-bit md5 hash
    of the sequence id (uniform, and identical in both engines —
    xxhash64 has no DuckDB twin), so shards are balanced regardless of
    doc length skew; both rollups are map-side-combined groupBys onto
    sequence- and shard-sized key spaces, and bit_xor aggregates carry
    fixed-width state."""
    from .textstats import _h30_spark

    pack = q_pack_sequences(spark, sf_dir)
    seqdocs = pack.select(
        "doc_id",
        "n_tokens",
        F.expr("explode(sequence(first_seq, last_seq))").alias("seq_id"),
    )
    per_seq = seqdocs.groupBy("seq_id").agg(
        F.count("*").cast("bigint").alias("n_doc_slices"),
    )
    h = _h30_spark("cast(seq_id as string)")
    return (
        per_seq.select(
            "seq_id",
            "n_doc_slices",
            F.expr(f"pmod({h}, {N_OUTPUT_SHARDS})").cast("bigint").alias(
                "shard"
            ),
            F.expr(h).alias("seq_h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_seqs"),
            F.sum("n_doc_slices").cast("bigint").alias("n_doc_slices"),
            F.expr("bit_xor(seq_h)").cast("bigint").alias("lineage_xor"),
        )
    )


def sql_shard_manifest() -> str:
    from .textstats import _h30_duck

    h = _h30_duck("seq_id::VARCHAR")
    return f"""
        WITH pack AS ({sql_pack_sequences()}),
        seqdocs AS (
            SELECT doc_id, n_tokens,
                   unnest(generate_series(first_seq, last_seq)) AS seq_id
            FROM pack
        ),
        per_seq AS (
            SELECT seq_id, COUNT(*)::BIGINT AS n_doc_slices
            FROM seqdocs GROUP BY seq_id
        )
        SELECT ({h}) % {N_OUTPUT_SHARDS} AS shard,
               COUNT(*)::BIGINT AS n_seqs,
               SUM(n_doc_slices)::BIGINT AS n_doc_slices,
               bit_xor({h})::BIGINT AS lineage_xor
        FROM per_seq GROUP BY 1
    """


# ---------------------------------------------------------------------------
# pack_efficiency: the waste dashboard over the packed layout
# ---------------------------------------------------------------------------


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row packing-efficiency dashboard over the concat-then-chunk
    layout: total tokens, sequence count, fill ppm of the final
    (partial) sequence, and how many documents straddle a sequence
    boundary (each straddle is a document a causal-attention trainer
    truncates context for — the number the pack-vs-pad debate turns
    on).

    100 TB story: rides q_pack_sequences (same decomposed prefix sum);
    the rollup is one whole-corpus agg with fixed-width state (sums,
    conditional counts) — map-side combined, output exactly 1 row.
    All integers; ppm by integer division identical in both engines."""
    pack = q_pack_sequences(spark, sf_dir)
    return pack.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.expr(
            f"cast(case when sum(n_tokens) = 0 then 0 else"
            f" (sum(n_tokens) + {SEQ_LEN} - 1) div {SEQ_LEN} end"
            " as bigint)"
        ).alias("n_sequences"),
        F.expr(
            f"cast(case when sum(n_tokens) % {SEQ_LEN} = 0"
            f" then 1000000"
            f" else (sum(n_tokens) % {SEQ_LEN}) * 1000000 div {SEQ_LEN}"
            " end as bigint)"
        ).alias("last_seq_fill_ppm"),
        F.sum(
            F.expr("cast(first_seq != last_seq as bigint)")
        ).cast("bigint").alias("n_straddling_docs"),
        F.sum(
            F.expr(f"cast(n_tokens > {SEQ_LEN} as bigint)")
        ).cast("bigint").alias("n_multi_seq_docs"),
    )


def sql_pack_efficiency() -> str:
    return f"""
        WITH pack AS ({sql_pack_sequences()})
        SELECT SUM(n_tokens)::BIGINT AS total_tokens,
               (CASE WHEN SUM(n_tokens) = 0 THEN 0 ELSE
                   (SUM(n_tokens) + {SEQ_LEN} - 1) // {SEQ_LEN}
                END)::BIGINT AS n_sequences,
               (CASE WHEN SUM(n_tokens) % {SEQ_LEN} = 0 THEN 1000000
                ELSE (SUM(n_tokens) % {SEQ_LEN}) * 1000000 // {SEQ_LEN}
                END)::BIGINT AS last_seq_fill_ppm,
               SUM(CASE WHEN first_seq != last_seq THEN 1 ELSE 0
                   END)::BIGINT AS n_straddling_docs,
               SUM(CASE WHEN n_tokens > {SEQ_LEN} THEN 1 ELSE 0
                   END)::BIGINT AS n_multi_seq_docs
        FROM pack
    """


# ---------------------------------------------------------------------------
# mm_pack: interleaved multimodal sequence packing (MMC4/OBELICS shape)
# ---------------------------------------------------------------------------
# Interleaved image-text training (MMC4, Zhu et al. 2023; OBELICS,
# Laurençon et al. 2023) packs documents whose cost is text tokens PLUS
# a per-image vision-token budget (a ViT patch grid — LLaVA-style
# ceil(w/P) x ceil(h/P)). The packing layout is the same two-level
# prefix sum as pack_sequences, over the multimodal cost; the per-
# sequence dashboard adds the image accounting a trainer needs: how
# many vision tokens each sequence carries and how many documents
# straddle a boundary (a straddling IMAGE cannot be split — the
# dashboard quantifies what doc-atomic packing would have to pad/drop).
# Image presence and geometry follow corpus/multimodal.py's synthesis:
# kind='image' iff doc_id % 3 = 0, width/height from the same residue
# rules, so every consumer sees one consistent media universe.

MM_PATCH = 28  # vision patch size (pt) for the token-cost grid


def _img_tokens(doc_id: str, dialect: str) -> str:
    """Vision-token cost: 0 for non-image docs, else the patch grid."""
    if dialect == "spark":
        w, h = f"(320 + {doc_id} % 320)", f"(240 + {doc_id} % 240)"
        grid = (
            f"cast(ceil({w} / {MM_PATCH}.0) * ceil({h} / {MM_PATCH}.0)"
            " as bigint)"
        )
        return f"(case when {doc_id} % 3 = 0 then {grid} else 0 end)"
    w, h = f"(320 + {doc_id} % 320)", f"(240 + {doc_id} % 240)"
    grid = (
        f"(ceil({w} / {MM_PATCH}.0) * ceil({h} / {MM_PATCH}.0))::BIGINT"
    )
    return f"(CASE WHEN {doc_id} % 3 = 0 THEN {grid} ELSE 0 END)"


def q_mm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("txt_tokens"),
        F.expr(_img_tokens("doc_id", "spark")).alias("img_tokens"),
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    ).withColumn(
        "cost", F.expr("txt_tokens + img_tokens")
    ).withColumn("g", F.expr(f"cast(h % {PACK_GROUPS} as bigint)"))

    w_in = (
        Window.partitionBy("g")
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = docs.withColumn(
        "cum_in_group", F.sum("cost").over(w_in).cast("bigint")
    )
    totals = docs.groupBy("g").agg(
        F.sum("cost").cast("bigint").alias("group_total")
    )
    w_g = (
        Window.orderBy(F.asc("g"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = totals.withColumn(
        "group_prefix",
        (F.sum("group_total").over(w_g) - F.col("group_total"))
        .cast("bigint"),
    ).select("g", "group_prefix")

    placed = within.join(F.broadcast(prefixes), "g").select(
        "doc_id", "txt_tokens", "img_tokens", "cost",
        (F.col("group_prefix") + F.col("cum_in_group") - F.col("cost"))
        .cast("bigint").alias("global_start"),
    ).select(
        "*",
        F.expr(f"cast(global_start div {SEQ_LEN} as bigint)").alias("seq_id"),
        F.expr(
            f"cast(case when cost = 0 then global_start div {SEQ_LEN}"
            f" else (global_start + cost - 1) div {SEQ_LEN} end"
            " as bigint)"
        ).alias("last_seq"),
    )
    return placed.groupBy("seq_id").agg(
        F.expr("cast(count(*) as bigint)").alias("n_docs"),
        F.expr("cast(sum(txt_tokens) as bigint)").alias("txt_tokens"),
        F.expr("cast(sum(img_tokens) as bigint)").alias("img_tokens"),
        F.expr(
            "cast(sum(case when img_tokens > 0 then 1 else 0 end)"
            " as bigint)"
        ).alias("n_images"),
        F.expr(
            "cast(sum(case when last_seq != seq_id then 1 else 0 end)"
            " as bigint)"
        ).alias("n_straddle"),
    )


def sql_mm_pack() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len({TOKENS_DUCK})::BIGINT AS txt_tokens,
                   {_img_tokens("doc_id", "duck")} AS img_tokens,
                   {h} AS h
            FROM documents
        ),
        grouped AS (
            SELECT *, (txt_tokens + img_tokens)::BIGINT AS cost,
                   (h % {PACK_GROUPS})::BIGINT AS g
            FROM base
        ),
        within AS (
            SELECT *,
                   sum(cost) OVER (
                       PARTITION BY g ORDER BY h ASC, doc_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum_in_group
            FROM grouped
        ),
        totals AS (
            SELECT g, sum(cost)::BIGINT AS group_total
            FROM grouped GROUP BY g
        ),
        prefixes AS (
            SELECT g,
                   (sum(group_total) OVER (
                       ORDER BY g ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - group_total)::BIGINT AS group_prefix
            FROM totals
        ),
        placed AS (
            SELECT w.doc_id, w.txt_tokens, w.img_tokens, w.cost,
                   (p.group_prefix + w.cum_in_group - w.cost)::BIGINT
                       AS global_start
            FROM within w JOIN prefixes p USING (g)
        ),
        seqs AS (
            SELECT *,
                   (global_start // {SEQ_LEN})::BIGINT AS seq_id,
                   (CASE WHEN cost = 0 THEN global_start // {SEQ_LEN}
                         ELSE (global_start + cost - 1) // {SEQ_LEN}
                    END)::BIGINT AS last_seq
            FROM placed
        )
        SELECT seq_id,
               COUNT(*)::BIGINT AS n_docs,
               sum(txt_tokens)::BIGINT AS txt_tokens,
               sum(img_tokens)::BIGINT AS img_tokens,
               sum(CASE WHEN img_tokens > 0 THEN 1 ELSE 0 END)::BIGINT
                   AS n_images,
               sum(CASE WHEN last_seq != seq_id THEN 1 ELSE 0 END)::BIGINT
                   AS n_straddle
        FROM seqs
        GROUP BY seq_id
    """
