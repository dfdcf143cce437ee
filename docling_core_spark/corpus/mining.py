"""Contrastive hard-negative mining over the embedding corpus — the
triplet table an embedding-model training run consumes (ANCE, Xiong et
al. 2021; DPR, Karpukhin et al. 2020): for each anchor, its hardest
POSITIVE (the best near-duplicate, cosine >= the dedup threshold) and
its hardest NEGATIVES (the highest-cosine neighbors BELOW it — similar
enough to be informative, distinct enough to be true negatives), plus
the triplet margin pos_cos - neg_cos the loss actually sees.

Composes the similarity family's materialized artifacts: the banded
LSH signature table supplies candidates (collide in ANY band, deduped
map-side by the min-band filter), the cached embedding/norm table
supplies exact cosines. No new corpus-wide pass: candidate cost is
query-set x collisions, exactly the ann_lsh_topk shape, and positives
and negatives are split from ONE scored candidate table.

100 TB story: the broadcast query-band join keeps both embedding joins
scan-shaped; the positive reduction is an agg max per anchor (no
window); the negative cut is a per-anchor window over candidate-sized
partitions. The margin subtraction runs on 6dp-rounded doubles
identically in both engines.

Reference analog: none (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import constants as C
from .similarity import (
    _MIN_BAND_FILTER,
    _COS_SPARK,
    _banded_cte_duck,
    _banded_ids,
    _cached_emb,
    _dot_duck,
    _dot_spark,
    _norm2_duck,
)

NEG_K = 5  # hardest negatives kept per anchor


def _scored_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = _banded_ids(spark, sf_dir)
    cand = (
        F.broadcast(ids.filter(F.col("vec_id") < C.KNN_NUM_QUERIES))
        .alias("a")
        .join(ids.alias("b"), on=["band_id", "bucket"])
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .filter(F.expr(_MIN_BAND_FILTER))
        .select(
            F.col("a.vec_id").alias("q_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
    )
    e = _cached_emb(spark, sf_dir)
    return (
        F.broadcast(cand)
        .join(e.alias("a"), F.col("q_id") == F.col("a.vec_id"))
        .join(e.alias("b"), F.col("neighbor_id") == F.col("b.vec_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.expr(
                _COS_SPARK.format(dot=_dot_spark("a.emb", "b.emb"))
            ).alias("cos_sim"),
        )
    )


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _scored_candidates(spark, sf_dir)
    pos = (
        scored.where(f"cos_sim >= {C.COSINE_NEARDUP_THRESHOLD}")
        .groupBy("q_id")
        .agg(F.max("cos_sim").alias("pos_cos"))
    )
    neg = scored.where(f"cos_sim < {C.COSINE_NEARDUP_THRESHOLD}")
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        neg.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(f"rk <= {NEG_K}")
        .join(F.broadcast(pos), "q_id", "left")
        .select(
            "q_id",
            "rk",
            F.col("neighbor_id").alias("neg_id"),
            F.col("cos_sim").alias("neg_cos"),
            "pos_cos",
            F.expr("round(pos_cos - cos_sim, 6)").alias("margin"),
        )
    )


def sql_hard_negatives() -> str:
    dot = _dot_duck("a.embedding", "b.embedding")
    na = _norm2_duck("a.embedding")
    nb = _norm2_duck("b.embedding")
    thr = C.COSINE_NEARDUP_THRESHOLD
    return f"""
        WITH {_banded_cte_duck()},
        scored AS (
            SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS neighbor_id,
                   round({dot} / (sqrt({na}) * sqrt({nb})), 6)
                       AS cos_sim
            FROM bk a JOIN bk b
              ON a.band_id = b.band_id AND a.bucket = b.bucket
             AND a.vec_id != b.vec_id
            WHERE a.vec_id < {C.KNN_NUM_QUERIES}
        ),
        pos AS (
            SELECT q_id, MAX(cos_sim) AS pos_cos
            FROM scored WHERE cos_sim >= {thr} GROUP BY q_id
        ),
        neg AS (
            SELECT q_id, neighbor_id, cos_sim,
                   row_number() OVER (
                       PARTITION BY q_id
                       ORDER BY cos_sim DESC, neighbor_id ASC
                   )::BIGINT AS rk
            FROM scored WHERE cos_sim < {thr}
        )
        SELECT q_id, rk, neighbor_id AS neg_id, cos_sim AS neg_cos,
               pos_cos, round(pos_cos - cos_sim, 6) AS margin
        FROM neg LEFT JOIN pos USING (q_id)
        WHERE rk <= {NEG_K}
    """
