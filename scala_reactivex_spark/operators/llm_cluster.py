"""Embedding clustering for corpus curation (SURVEY.md §2.10 family).

Two clustering-driven pipeline stages a 100 TB curation run needs:

- ``llm_kmeans``: k-means over the embedding column — THE workhorse for
  corpus bucketing (topic balance, dedup sharding, IVF coarse quantizers).
  A full Lloyd loop (seeded init, ``KMEANS_ITERS`` assign/update rounds)
  expressed as DataFrame joins and aggregates; every component is pinned to
  integer 1e6 units up front so distances and centroid updates are EXACT
  integer arithmetic — bit-identical in any partition order and in the
  DuckDB oracle, which unrolls the same three iterations as CTEs.
- ``llm_semdedup``: SemDeDup-shaped semantic dedup (Abbas et al. 2023,
  arXiv:2303.09540 — public paper): cluster, then inside each cluster keep
  the vector closest to the cluster centroid and mark near-centroid
  duplicates for dropping.  Reuses the final k-means assignment; the
  within-cluster work is one aggregate + one broadcast join back.

Scale shape: vectors explode to (vec_id, pos, component) once and persist;
centroids are K×dim rows (bounded, broadcast); each Lloyd iteration is one
shuffle on vec_id plus one on (cluster, pos) — no driver-side math, no
collect.  Empty clusters simply vanish from the centroid frame (documented
Lloyd behavior; both engines drop them identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

KMEANS_K = 8
KMEANS_ITERS = 3
EMBED_DIM = 64

#: SemDeDup drop threshold: a non-representative vector is a semantic
#: duplicate when its squared distance to the cluster centroid is below
#: this fraction (in 1e4 units) of the cluster's mean squared distance.
SEMDEDUP_TAU_1E4 = 5_000  # 0.5 × mean intra-cluster d²


def _pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings exploded to (vec_id, pos, v) with 1e6-pinned components."""
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.floor(F.col("val").cast("double") * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )


def _assign(x: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector: exact integer squared-L2, ties to the
    lowest cluster id (min over (d2, cluster_id) structs — the same order
    MIN(cluster_id)-among-minima gives the oracle)."""
    d = (
        x.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "cluster_id")
        .agg(
            F.sum(
                (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
            ).alias("d2")
        )
    )
    best = d.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cluster_id")).alias("m")
    )
    return best.select(
        "vec_id",
        F.col("m.cluster_id").alias("cluster_id"),
        F.col("m.d2").cast("bigint").alias("dist2"),
    )


def _kmeans_loop(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run the Lloyd loop ONCE PER SESSION (memoized); return (final
    assignment, the centroid frame that assignment was scored against) —
    the centroids are what a serving/streaming scorer needs (see
    streaming/twins.twin_kmeans).  Memoization means llm_kmeans,
    llm_semdedup, llm_cluster_purity and the twin share one persisted
    exploded-vector frame instead of stacking a copy per call."""
    from scala_reactivex_spark.plans.memo import disk_memo

    # Two-tier (round 11): the Lloyd loop's outputs are deterministic
    # (integer-pinned arithmetic), so the finished (assignment,
    # centroids) pair persists as parquet and later sessions read the
    # trained clustering back instead of re-iterating.
    return disk_memo(
        spark, sf_dir, "kmeans_loop", lambda: _kmeans_loop_build(spark, sf_dir)
    )


def _kmeans_loop_build(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    x = _pinned(spark, sf_dir).persist()
    cent = x.where(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cluster_id"), "pos", F.col("v").alias("c")
    )
    asg = None
    for it in range(KMEANS_ITERS):
        asg = _assign(x, cent)
        if it < KMEANS_ITERS - 1:
            cent = (
                asg.select("vec_id", "cluster_id")
                .join(x, "vec_id")
                .groupBy("cluster_id", "pos")
                .agg(
                    F.floor(F.sum("v").cast("double") / F.count("*"))
                    .cast("bigint")
                    .alias("c")
                )
            )
    # PERSIST both outputs, not just the exploded input: the final
    # assignment feeds four graded consumers (llm_kmeans, llm_semdedup,
    # llm_cluster_purity — whose own plan reads it from two subtrees —
    # and the serving twin's centroid scorer), and Spark does not share
    # common subplans across joins, so un-persisted each reference
    # re-executed the whole Lloyd chain from x.  Both frames are small
    # (n_vecs rows / K×dim rows) and released by clear_session_memo.
    return asg.persist(), cent.persist()


def _kmeans_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kmeans_loop(spark, sf_dir)[0]


def _kmeans_oracle() -> str:
    """Unroll KMEANS_ITERS Lloyd iterations as CTEs (same integer math)."""
    parts = [
        f"""
WITH x AS (
  SELECT vec_id, i - 1 AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS v
  FROM embeddings, range(1, {EMBED_DIM + 1}) t(i)
), c0 AS (
  SELECT vec_id AS cluster_id, pos, v AS c FROM x WHERE vec_id < {KMEANS_K}
)"""
    ]
    prev = "c0"
    for it in range(1, KMEANS_ITERS + 1):
        parts.append(
            f""", d{it} AS (
  SELECT x.vec_id, c.cluster_id,
         SUM((x.v - c.c) * (x.v - c.c)) AS d2
  FROM x JOIN {prev} c ON x.pos = c.pos
  GROUP BY x.vec_id, c.cluster_id
), a{it} AS (
  SELECT vec_id, MIN(cluster_id) AS cluster_id, CAST(MIN(d2) AS BIGINT)
         AS dist2
  FROM (SELECT vec_id, cluster_id, d2,
               MIN(d2) OVER (PARTITION BY vec_id) AS md
        FROM d{it})
  WHERE d2 = md GROUP BY vec_id
)"""
        )
        if it < KMEANS_ITERS:
            parts.append(
                f""", c{it} AS (
  SELECT a.cluster_id, x.pos,
         CAST(floor(CAST(SUM(x.v) AS DOUBLE) / count(*)) AS BIGINT) AS c
  FROM x JOIN a{it} a ON x.vec_id = a.vec_id
  GROUP BY a.cluster_id, x.pos
)"""
            )
            prev = f"c{it}"
    parts.append(
        f"\nSELECT vec_id, cluster_id, dist2 FROM a{KMEANS_ITERS}"
    )
    return "".join(parts)


@register(
    "llm_kmeans",
    tier="T3",
    doc=f"k-means (Lloyd) over the embedding column: seeded init (the "
    f"{KMEANS_K} lowest vec_ids), {KMEANS_ITERS} assign/update rounds, "
    "squared-L2 on 1e6-pinned integer components so every distance and "
    "centroid is exact in any combine order. Emits the final "
    "(vec_id, cluster_id, dist2) assignment. Scale: the exploded vector "
    "frame persists across iterations; centroids are K×dim broadcast "
    "rows; each round is one vec_id shuffle + one bounded (cluster,pos) "
    "shuffle — iteration count is fixed, independent of corpus size.",
    oracle=_kmeans_oracle(),
)
def llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kmeans_assignment(spark, sf_dir)


@register(
    "llm_semdedup",
    tier="T3",
    doc="SemDeDup-shaped semantic dedup (public method, arXiv:2303.09540): "
    "k-means buckets (reusing llm_kmeans' final assignment), then within "
    "each cluster the vector nearest the centroid (ties → lowest "
    "vec_id) is the keeper and every other vector whose squared "
    "centroid distance is under τ×mean(d²) is flagged dropped. All "
    "comparisons are exact-integer (1e6-pinned components, 1e4-pinned "
    "τ ratio via integer cross-multiplication — no division). Scale: "
    "one aggregate over the assignment + one broadcast join back; the "
    "expensive part is the k-means it composes.  The cross-multiplied "
    "predicate routes through DECIMAL(38,0)/HUGEINT: d²·n_vecs·10⁴ "
    "tops 2⁶³ once clusters reach a few thousand members (caught by "
    "the r7 sf1 probe as an ANSI ARITHMETIC_OVERFLOW), and Σd² itself "
    "overflows BIGINT at ~10⁹-member web-scale clusters.",
    oracle=_kmeans_oracle().replace(
        f"\nSELECT vec_id, cluster_id, dist2 FROM a{KMEANS_ITERS}",
        f""", fin AS (
  SELECT vec_id, cluster_id, dist2 AS d2 FROM a{KMEANS_ITERS}
), stats AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(CAST(d2 AS HUGEINT)) AS HUGEINT) AS sum_d2,
         MIN(d2) AS min_d2
  FROM fin GROUP BY cluster_id
), keeper AS (
  SELECT f.cluster_id, MIN(f.vec_id) AS keep_id
  FROM fin f JOIN stats s ON f.cluster_id = s.cluster_id
  WHERE f.d2 = s.min_d2 GROUP BY f.cluster_id
)
SELECT f.vec_id, f.cluster_id, CAST(f.d2 AS BIGINT) AS dist2,
       CASE WHEN f.vec_id = k.keep_id THEN 1 ELSE 0 END AS is_keeper,
       CASE WHEN f.vec_id <> k.keep_id
                 AND CAST(f.d2 AS HUGEINT) * s.n_vecs * 10000
                     < {SEMDEDUP_TAU_1E4} * s.sum_d2
            THEN 1 ELSE 0 END AS is_dropped
FROM fin f
JOIN stats s ON f.cluster_id = s.cluster_id
JOIN keeper k ON f.cluster_id = k.cluster_id""",
    ),
)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The assignment frame feeds FOUR subtrees (fin, stats, keeper via fin
    # + stats, final join); the Lloyd loop's memoized output is persisted
    # at the source (_kmeans_loop_build), so each subtree re-executes
    # only this rename projection over the cached assignment — no extra
    # per-consumer persisted copy needed (round-7 ADVICE leak class).
    fin = _kmeans_assignment(spark, sf_dir).withColumnRenamed(
        "dist2", "d2"
    )
    stats = fin.groupBy(F.col("cluster_id").alias("s_cluster")).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        # DECIMAL(38,0) sum: Σd² tops BIGINT at web-scale cluster sizes.
        F.sum(F.col("d2").cast("decimal(38,0)")).alias("sum_d2"),
        F.min("d2").alias("min_d2"),
    )
    keeper = (
        fin.join(stats, fin.cluster_id == stats.s_cluster)
        .where(F.col("d2") == F.col("min_d2"))
        .groupBy(F.col("cluster_id").alias("k_cluster"))
        .agg(F.min("vec_id").alias("keep_id"))
    )
    dropped = (
        (F.col("vec_id") != F.col("keep_id"))
        & (
            # DECIMAL(38,0) cross-multiply: the BIGINT form overflows
            # (ANSI ARITHMETIC_OVERFLOW) once d²·n_vecs·10⁴ > 2⁶³ —
            # hit at the 10× sf1 probe already (SCALING.md r7).
            F.col("d2").cast("decimal(38,0)")
            * F.col("n_vecs")
            * F.lit(10_000)
            < F.lit(SEMDEDUP_TAU_1E4) * F.col("sum_d2")
        )
    ).cast("int")
    return (
        fin.join(F.broadcast(stats), fin.cluster_id == stats.s_cluster)
        .join(F.broadcast(keeper), fin.cluster_id == keeper.k_cluster)
        .select(
            "vec_id",
            "cluster_id",
            F.col("d2").cast("bigint").alias("dist2"),
            (F.col("vec_id") == F.col("keep_id")).cast("int").alias(
                "is_keeper"
            ),
            dropped.alias("is_dropped"),
        )
    )
