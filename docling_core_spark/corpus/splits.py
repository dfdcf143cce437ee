"""Deterministic train/val/test splitting + cross-split near-dup
leakage audit — the last step before a corpus ships to training, and
the first thing an eval-integrity review asks about.

``data_split`` assigns every document to train/val/test by its 30-bit
content-independent id hash (90/5/5), so the split is reproducible at
any parallelism, on any engine, with no RNG state; the census row per
split carries doc count, token mass, and a bit-XOR lineage of the doc
hashes — XOR over the three splits reproduces the corpus total, the
shard_manifest exactly-once argument applied to splits (a doc in two
splits, or in none, breaks the XOR identity).

``split_leakage`` is the audit: near-duplicate CLUSTERS (the memoized
connected-component table the dedup chain materializes) that span the
train boundary — a val/test document whose near-dup sits in train is
contaminated eval signal (the Lee et al. 2022 dedup-test-set-overlap
finding, as a first-class oracle-checked query). One row per leaking
cluster: its id, sizes on each side, and the leaked doc ids
(sorted, capped at 10 for the report).

100 TB story: data_split is one zero-shuffle projection plus a
3-row map-side-combined rollup; split_leakage joins the corpus-width
(doc_id -> cluster) table against the split assignment on uniform
doc_id, then aggregates per cluster id (components are tiny after
dedup, so no hot key) and keeps only spanning clusters.

Reference analog: none (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import constants as C, read_spread
from .dedup import q_dedup_clusters, sql_dedup_clusters
from .textstats import TOKENS_DUCK, TOKENS_SPARK, _h30_duck, _h30_spark

SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5  # test gets the remainder


def _split_expr(duck: bool) -> str:
    h = (_h30_duck if duck else _h30_spark)(
        "doc_id::VARCHAR" if duck else "cast(doc_id as string)"
    )
    return (
        f"CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'"
        f" WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT}"
        f" THEN 'val' ELSE 'test' END"
    )


def q_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_split_expr(False)).alias("split"),
        F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("n_tokens"),
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    )
    return docs.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.expr("cast(bit_xor(h) as bigint)").alias("lineage_xor"),
    )


def sql_data_split() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        SELECT {_split_expr(True)} AS split,
               COUNT(*)::BIGINT AS n_docs,
               SUM(len({TOKENS_DUCK}))::BIGINT AS tokens_total,
               bit_xor({h})::BIGINT AS lineage_xor
        FROM documents
        GROUP BY 1
    """


LEAK_SAMPLE = 10  # leaked doc ids listed per cluster in the report


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters spanning the train boundary. Reads the
    memoized cluster table (doc_id -> cluster_id canonical min-label);
    a cluster leaks iff it has >= 1 train member AND >= 1 val/test
    member."""
    clusters = q_dedup_clusters(spark, sf_dir)
    assign = clusters.select(
        "doc_id", "cluster_id", F.expr(_split_expr(False)).alias("split")
    )
    per_cluster = assign.groupBy("cluster_id").agg(
        F.sum(F.expr("cast(split = 'train' as bigint)")).alias("n_train"),
        F.sum(F.expr("cast(split != 'train' as bigint)")).alias("n_eval"),
        F.expr(
            f"slice(array_sort(collect_list(case when split != 'train'"
            f" then doc_id end)), 1, {LEAK_SAMPLE})"
        ).alias("leaked_ids"),
    )
    return (
        per_cluster.where("n_train >= 1 and n_eval >= 1")
        .select(
            "cluster_id",
            F.col("n_train").cast("bigint").alias("n_train"),
            F.col("n_eval").cast("bigint").alias("n_eval"),
            F.expr("concat_ws(',', transform(leaked_ids,"
                   " d -> cast(d as string)))").alias("leaked_ids"),
        )
    )


def sql_split_leakage() -> str:
    return f"""
        WITH clusters AS ({sql_dedup_clusters()}),
        assign AS (
            SELECT doc_id, cluster_id, {_split_expr(True)} AS split
            FROM clusters
        ),
        per_cluster AS (
            SELECT cluster_id,
                   SUM((split = 'train')::BIGINT) AS n_train,
                   SUM((split <> 'train')::BIGINT) AS n_eval,
                   array_to_string(
                       (list_sort(list(doc_id)
                            FILTER (WHERE split <> 'train')))[1:{LEAK_SAMPLE}],
                       ',') AS leaked_ids
            FROM assign GROUP BY cluster_id
        )
        SELECT cluster_id,
               n_train::BIGINT AS n_train,
               n_eval::BIGINT AS n_eval,
               leaked_ids
        FROM per_cluster
        WHERE n_train >= 1 AND n_eval >= 1
    """


# ---------------------------------------------------------------------------
# Split distribution drift: KS statistic between split length CDFs
# ---------------------------------------------------------------------------
# A hash split is only a VALID split if the resulting populations are
# exchangeable; the standard hygiene check is the two-sample
# Kolmogorov-Smirnov statistic between each pair of splits over a
# covariate (document length here). A healthy hash split shows KS near
# zero; a biased splitter (e.g. by crawl order) shows a visible gap.
# KS is computed exactly over 64-char length buckets: per-(split,
# bucket) counts, cumulative inversion to a CDF in exact ppm, max
# absolute CDF gap per split pair — no sort of raw documents anywhere.
#
# 100 TB story: one map-side-combined groupBy on (split, bucket); the
# CDF window and the pair comparison run over the bucket GRID (splits
# x length/64 rows), never documents; output is 3 rows.

KS_BUCKET_W = 64  # chars per bucket (matches source_length_quantiles)


def q_split_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = read_spread(spark, sf_dir, "documents").select(
        F.expr(_split_expr(False)).alias("split"),
        F.expr(f"cast(n_chars div {KS_BUCKET_W} as bigint)").alias(
            "bucket"
        ),
    )
    counts = docs.groupBy("split", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    splits = counts.select("split").distinct()
    buckets = counts.select("bucket").distinct()
    grid = splits.crossJoin(F.broadcast(buckets)).join(
        F.broadcast(counts), ["split", "bucket"], "left"
    ).select(
        "split", "bucket",
        F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"),
    )
    wt = Window.partitionBy("split")
    cdf = grid.select(
        "split", "bucket",
        # integer div on both sides: double-divide then cast would
        # TRUNCATE in Spark but ROUND in DuckDB
        F.expr(
            "cast(sum(cnt) over (partition by split order by bucket asc"
            " rows between unbounded preceding and current row)"
            " * 1000000 div sum(cnt) over (partition by split)"
            " as bigint)"
        ).alias("cdf_ppm"),
        F.sum("cnt").over(wt).cast("bigint").alias("n_split"),
    )
    a, b = cdf.alias("a"), cdf.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.split") < F.col("b.split")),
        )
        .groupBy(
            F.col("a.split").alias("split_a"),
            F.col("b.split").alias("split_b"),
        )
        .agg(
            F.max(
                F.abs(F.col("a.cdf_ppm") - F.col("b.cdf_ppm"))
            ).cast("bigint").alias("ks_ppm"),
            F.max("a.n_split").cast("bigint").alias("n_a"),
            F.max("b.n_split").cast("bigint").alias("n_b"),
        )
    )


def sql_split_ks() -> str:
    return f"""
        WITH d AS (
            SELECT {_split_expr(True)} AS split,
                   (n_chars // {KS_BUCKET_W})::BIGINT AS bucket
            FROM documents
        ),
        counts AS (
            SELECT split, bucket, COUNT(*)::BIGINT AS cnt
            FROM d GROUP BY split, bucket
        ),
        grid AS (
            SELECT s.split, bk.bucket, COALESCE(c.cnt, 0)::BIGINT AS cnt
            FROM (SELECT DISTINCT split FROM counts) s
            CROSS JOIN (SELECT DISTINCT bucket FROM counts) bk
            LEFT JOIN counts c
              ON c.split = s.split AND c.bucket = bk.bucket
        ),
        cdf AS (
            SELECT split, bucket,
                   (SUM(cnt) OVER (
                        PARTITION BY split ORDER BY bucket ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) * 1000000
                    // SUM(cnt) OVER (PARTITION BY split))::BIGINT
                       AS cdf_ppm,
                   SUM(cnt) OVER (PARTITION BY split)::BIGINT AS n_split
            FROM grid
        )
        SELECT a.split AS split_a, b.split AS split_b,
               MAX(abs(a.cdf_ppm - b.cdf_ppm))::BIGINT AS ks_ppm,
               MAX(a.n_split)::BIGINT AS n_a,
               MAX(b.n_split)::BIGINT AS n_b
        FROM cdf a JOIN cdf b
          ON a.bucket = b.bucket AND a.split < b.split
        GROUP BY a.split, b.split
    """


# ---------------------------------------------------------------------------
# domain-disjoint (group-aware) split
# ---------------------------------------------------------------------------

# group split percentages: hashing the GROUP key means actual doc-mass
# fractions wobble with group sizes — the price of leakage-safety
GSPLIT_TRAIN_PCT = 80
GSPLIT_VAL_PCT = 10


def _gsplit_expr(duck: bool) -> str:
    """Split by the hash of the SOURCE (the group key), not the doc:
    every document of a domain lands in the same split by
    construction."""
    h = _h30_duck("source") if duck else _h30_spark("source")
    return (
        f"CASE WHEN {h} % 100 < {GSPLIT_TRAIN_PCT} THEN 'train'"
        f" WHEN {h} % 100 < {GSPLIT_TRAIN_PCT + GSPLIT_VAL_PCT}"
        f" THEN 'val' ELSE 'test' END"
    )


def q_split_by_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware split: assign every SOURCE (domain) wholly to one
    split by hashing the source key, and report per-split doc/token/
    domain mass plus the built-in leakage proof — n_split_domains
    summed over splits equals the corpus's distinct-domain count iff
    no domain straddles a boundary (per-doc hash splits leak templated
    near-dups through domain boundaries; the standard fix is to split
    by the group, exactly this).

    100 TB story: the split key is a narrow per-row expression (hash
    of an existing column — no join against a domain table); the only
    exchange is the map-side-combinable groupBy(split); the domain
    count per split aggregates the (domains x splits)-sized distinct.
    Reference analog: none (SURVEY.md §2.8)."""
    docs = read_spread(spark, sf_dir, "documents").select(
        "source",
        F.expr(_gsplit_expr(False)).alias("split"),
        F.expr(f"cast(size({TOKENS_SPARK}) as bigint)").alias("n_tokens"),
        F.expr(_h30_spark("cast(doc_id as string)")).alias("h"),
    )
    per_split = docs.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_total"),
        F.countDistinct("source").cast("bigint").alias("n_domains"),
        F.expr("cast(bit_xor(h) as bigint)").alias("lineage_xor"),
    )
    total_domains = (
        read_spread(spark, sf_dir, "documents")
        .agg(F.countDistinct("source").cast("bigint").alias("domains_corpus"))
    )
    return per_split.crossJoin(F.broadcast(total_domains)).select(
        "split", "n_docs", "tokens_total", "n_domains", "lineage_xor",
        "domains_corpus",
    )


def sql_split_by_domain() -> str:
    h = _h30_duck("doc_id::VARCHAR")
    return f"""
        WITH per_split AS (
            SELECT {_gsplit_expr(True)} AS split,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM(len({TOKENS_DUCK}))::BIGINT AS tokens_total,
                   COUNT(DISTINCT source)::BIGINT AS n_domains,
                   bit_xor({h})::BIGINT AS lineage_xor
            FROM documents
            GROUP BY 1
        ),
        tot AS (
            SELECT COUNT(DISTINCT source)::BIGINT AS domains_corpus
            FROM documents
        )
        SELECT split, n_docs, tokens_total, n_domains, lineage_xor,
               domains_corpus
        FROM per_split CROSS JOIN tot
    """


# ---------------------------------------------------------------------------
# embedding drift between splits
# ---------------------------------------------------------------------------

def _vsplit_expr(duck: bool) -> str:
    """The doc split rule applied to vec_id (embeddings are 1:1 with
    documents by id in this corpus)."""
    h = (_h30_duck if duck else _h30_spark)(
        "vec_id::VARCHAR" if duck else "cast(vec_id as string)"
    )
    return (
        f"CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'"
        f" WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT}"
        f" THEN 'val' ELSE 'test' END"
    )


def q_split_emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift between splits: the cosine between
    each pair of split MEAN vectors (scaling cancels, so cos(mean_a,
    mean_b) == cos(sum_a, sum_b) and the sums are EXACT micro-integer
    sufficient statistics — no float mean ever materializes, the
    emb_outliers identity discipline). On a corpus with a strong mean
    direction, near-1.0 cosines mean the hash split preserved the
    distribution; on a ZERO-CENTERED corpus (this fixture) each split
    mean is O(1/sqrt(n)) noise and the cosines hover near 0 — the
    drift flag is then one PAIR deviating from the others, not an
    absolute threshold (the embedding-space twin of split_ks's
    length-CDF check, with the same read-the-matrix discipline).

    100 TB story: one posexplode + a map-side-combinable groupBy onto
    the (splits x dims) key — 192 cells regardless of corpus size;
    the pairwise cosine runs over a 3-row table of 64-long arrays.
    Reference analog: none (SURVEY.md §2.8)."""
    emb = read_spread(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.expr(_vsplit_expr(False)).alias("split"),
        F.posexplode(
            F.expr(
                "transform(embedding, v -> cast(floor(cast(v as double)"
                " * 1000000) as bigint))"
            )
        ).alias("dim", "md"),
    )
    sums = dims.groupBy("split", "dim").agg(
        F.sum("md").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    vecs = sums.groupBy("split").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, s))),"
            " p -> p.s)"
        ).alias("sv"),
        F.max("n").cast("bigint").alias("n_vecs"),
    )
    dot = (
        "aggregate(zip_with(a.sv, b.sv, (x, y) ->"
        " cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, t) -> acc + t)"
    )
    nrm = (
        "sqrt(aggregate(transform({v}, x -> cast(x as double)"
        " * cast(x as double)), cast(0 as double), (acc, t) -> acc + t))"
    )
    return (
        vecs.alias("a")
        .join(
            F.broadcast(vecs.alias("b")),
            F.col("a.split") < F.col("b.split"),
        )
        .select(
            F.col("a.split").alias("split_a"),
            F.col("b.split").alias("split_b"),
            F.col("a.n_vecs").alias("n_a"),
            F.col("b.n_vecs").alias("n_b"),
            F.expr(
                f"round(({dot}) / ({nrm.format(v='a.sv')}"
                f" * {nrm.format(v='b.sv')}), 6)"
            ).alias("mean_cosine"),
        )
    )


def sql_split_emb_drift() -> str:
    dot = (
        f"list_sum(list_transform(range(1, {C.EMB_DIM + 1}),"
        " i -> a.sv[i]::DOUBLE * b.sv[i]::DOUBLE))"
    )
    nrm = (
        "sqrt(list_sum(list_transform({v},"
        " x -> x::DOUBLE * x::DOUBLE)))"
    )
    return f"""
        WITH dims AS (
            SELECT {_vsplit_expr(True)} AS split,
                   unnest(range(len(embedding))) AS dim,
                   unnest(list_transform(embedding,
                       v -> floor(v::DOUBLE * 1000000)::BIGINT)) AS md
            FROM embeddings
        ),
        sums AS (
            SELECT split, dim, SUM(md)::BIGINT AS s,
                   COUNT(*)::BIGINT AS n
            FROM dims GROUP BY split, dim
        ),
        vecs AS (
            SELECT split,
                   list_transform(
                       list_sort(list(struct_pack(dim := dim, s := s))),
                       p -> p.s) AS sv,
                   MAX(n)::BIGINT AS n_vecs
            FROM sums GROUP BY split
        )
        SELECT a.split AS split_a, b.split AS split_b,
               a.n_vecs AS n_a, b.n_vecs AS n_b,
               round(({dot}) / ({nrm.format(v='a.sv')}
                     * {nrm.format(v='b.sv')}), 6) AS mean_cosine
        FROM vecs a JOIN vecs b ON a.split < b.split
    """
