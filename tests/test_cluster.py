"""Semantics of the clustering ops (llm_cluster.py) at sf0.001."""

from __future__ import annotations

import pyspark.sql.functions as F

from scala_reactivex_spark.operators import llm_cluster as C
from scala_reactivex_spark.sources.catalog import table


def test_kmeans_assigns_every_vector_once(spark, sf_dir):
    asg = C.llm_kmeans(spark, sf_dir)
    n_vec = table(spark, sf_dir, "embeddings").count()
    assert asg.count() == n_vec
    assert asg.select("vec_id").distinct().count() == n_vec


def test_kmeans_uses_multiple_clusters(spark, sf_dir):
    asg = C.llm_kmeans(spark, sf_dir)
    k = asg.select("cluster_id").distinct().count()
    assert 1 < k <= C.KMEANS_K


def test_kmeans_iterations_do_not_increase_inertia(spark, sf_dir):
    """Lloyd monotonicity: total squared distance after the full loop must
    be ≤ the first-assignment inertia (exact integers, so comparable)."""
    x = C._pinned(spark, sf_dir)
    cent0 = x.where(F.col("vec_id") < C.KMEANS_K).select(
        F.col("vec_id").alias("cluster_id"), "pos", F.col("v").alias("c")
    )
    first = (
        C._assign(x, cent0).agg(F.sum("dist2")).collect()[0][0]
    )
    final = (
        C.llm_kmeans(spark, sf_dir).agg(F.sum("dist2")).collect()[0][0]
    )
    assert final <= first


def test_semdedup_one_keeper_per_cluster_and_keepers_never_dropped(
    spark, sf_dir
):
    out = C.llm_semdedup(spark, sf_dir).collect()
    by_cluster: dict[int, int] = {}
    for r in out:
        if r.is_keeper:
            by_cluster[r.cluster_id] = by_cluster.get(r.cluster_id, 0) + 1
            assert r.is_dropped == 0
    clusters = {r.cluster_id for r in out}
    assert set(by_cluster) == clusters
    assert all(v == 1 for v in by_cluster.values())


def test_semdedup_dropped_are_nearer_centroid_than_cluster_mean(
    spark, sf_dir
):
    out = C.llm_semdedup(spark, sf_dir).collect()
    sums: dict[int, list[int]] = {}
    for r in out:
        sums.setdefault(r.cluster_id, []).append(r.dist2)
    for r in out:
        if r.is_dropped:
            d2s = sums[r.cluster_id]
            mean = sum(d2s) / len(d2s)
            assert r.dist2 < mean * C.SEMDEDUP_TAU_1E4 / 10_000


def test_ann_pq_shape_and_recall(spark, sf_dir):
    """PQ-ADC laws: 10 ranked rows per probe, self excluded, rank order
    monotone in ADC distance — and the quantized top-10 must recover a
    meaningful share of the EXACT integer-L2 top-10 (numpy ground
    truth), or the codebooks learned nothing."""
    import numpy as np

    from scala_reactivex_spark.operators.llm_similarity import (
        N_PROBES,
        TOPK,
        llm_ann_pq,
    )

    rows = llm_ann_pq(spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_id"] != r["probe_id"]
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == set(range(N_PROBES))
    for p, rs in by_probe.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, TOPK + 1))
        d = [r["adc_d2"] for r in rs]
        assert d == sorted(d) and d[0] >= 0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    v = np.array(
        [np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6 + 0.5)
         for r in sorted(emb, key=lambda r: r["vec_id"])]
    )
    ids = np.array(sorted(r["vec_id"] for r in emb))
    hits = total = 0
    for p in range(N_PROBES):
        d2 = ((v - v[p]) ** 2).sum(axis=1)
        d2[p] = np.inf
        exact = set(ids[np.lexsort((ids, d2))][:TOPK])
        got = {r["neighbor_id"] for r in by_probe[p]}
        hits += len(exact & got)
        total += TOPK
    assert hits / total >= 0.3, f"PQ recall@10 too low: {hits}/{total}"


def test_pq_recall_agrees_with_numpy_law(spark, sf_dir):
    """The graded recall rows must agree with the independently computed
    numpy recall from test_ann_pq_shape_and_recall's methodology."""
    import numpy as np

    from scala_reactivex_spark.operators.llm_similarity import (
        N_PROBES,
        TOPK,
        llm_ann_pq,
        llm_pq_recall,
    )

    rows = {r["probe_id"]: r for r in llm_pq_recall(spark, sf_dir).collect()}
    assert set(rows) == set(range(N_PROBES))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    v = np.array(
        [np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6 + 0.5)
         for r in sorted(emb, key=lambda r: r["vec_id"])]
    )
    ids = np.array(sorted(r["vec_id"] for r in emb))
    pq = {}
    for r in llm_ann_pq(spark, sf_dir).collect():
        pq.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    for pid in range(N_PROBES):
        d2 = ((v - v[pid]) ** 2).sum(axis=1)
        d2[pid] = np.inf
        exact = set(ids[np.lexsort((ids, d2))][:TOPK])
        hits = len(exact & pq[pid])
        assert rows[pid]["n_hits"] == hits
        assert rows[pid]["recall_1e4"] == hits * 10000 // TOPK
