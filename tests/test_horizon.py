"""Laws for the round-16 HORIZON keys (beyond the DuckDB oracle gate):
sketch-NDV ANALYZE, histograms, quality sweep, embedding outliers,
duplicate-n-gram coverage, pipeline funnel, Bloom FPR audit."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stats_approx_within_band_of_exact(spark, sf_dir):
    """The acceptance eval the approx key deliberately does NOT embed
    in-plan (it would reinstate the exact key's Expand): every
    column's HLL estimate lands within ±25% of the exact NDV, and the
    plain stats (rows, nulls) are identical."""
    from scala_reactivex_spark.operators.creation import (
        src_table_stats,
        src_table_stats_approx,
    )

    exact = {
        r["column_name"]: r for r in src_table_stats(spark, sf_dir).collect()
    }
    approx = {
        r["column_name"]: r
        for r in src_table_stats_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert a["n_rows"] == e["n_rows"]
        assert a["n_null"] == e["n_null"]
        assert abs(a["ndv_est"] - e["ndv"]) * 4 <= e["ndv"], (
            c,
            a["ndv_est"],
            e["ndv"],
        )


def test_histogram_buckets_partition_corpus(spark, sf_dir):
    """Dense histograms: per column exactly HIST_BUCKETS rows, bucket
    counts sum to the column's non-null count, and the pinned bucket
    edges are monotone with lo(0)/hi(last) at the column min/max
    (±1 micro-unit from the floor pinning)."""
    from scala_reactivex_spark.operators.creation import (
        HIST_BUCKETS,
        HIST_COLUMNS,
        src_table_histogram,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = src_table_histogram(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    per_col = {}
    for r in rows:
        per_col.setdefault(r["column_name"], []).append(r)
    assert set(per_col) == set(HIST_COLUMNS)
    for c, rs in per_col.items():
        rs.sort(key=lambda r: r["bucket"])
        assert [r["bucket"] for r in rs] == list(range(HIST_BUCKETS))
        stats = li.agg(
            F.count(c).alias("n"),
            F.min(c).cast("double").alias("mn"),
            F.max(c).cast("double").alias("mx"),
        ).collect()[0]
        assert sum(r["cnt"] for r in rs) == stats["n"]
        for a, b in zip(rs, rs[1:]):
            assert a["hi_1e6"] == b["lo_1e6"]
            assert a["lo_1e6"] <= a["hi_1e6"]
        assert abs(rs[0]["lo_1e6"] - stats["mn"] * 1e6) <= 1
        assert abs(rs[-1]["hi_1e6"] - stats["mx"] * 1e6) <= 1


def test_quality_sweep_monotone_and_anchored(spark, sf_dir):
    """Retention is non-increasing in the threshold, the t=0 row is
    the whole corpus, and one spot threshold re-derives from a direct
    corpus count."""
    from scala_reactivex_spark.operators.llm_text import (
        PSI_BANDS,
        llm_quality_sweep,
        quality_col,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = sorted(
        llm_quality_sweep(spark, sf_dir).collect(),
        key=lambda r: r["thr_1e1"],
    )
    assert [r["thr_1e1"] for r in rows] == list(range(PSI_BANDS))
    docs = table(spark, sf_dir, "documents")
    assert rows[0]["n_kept"] == docs.count()
    assert rows[0]["doc_ratio_1e4"] == 10000
    for a, b in zip(rows, rows[1:]):
        assert a["n_kept"] >= b["n_kept"]
        assert a["tok_kept"] >= b["tok_kept"]
    _, _, quality = quality_col()
    band = F.least(
        F.floor(quality * PSI_BANDS).cast("bigint"),
        F.lit(PSI_BANDS - 1).cast("bigint"),
    )
    direct = docs.select(band.alias("b")).where(F.col("b") >= 3).count()
    assert rows[3]["n_kept"] == direct


def test_embed_outliers_flag_re_derives(spark, sf_dir):
    """is_outlier is exactly the documented rule over the emitted
    columns, every vector reports, and the flag is a minority."""
    from scala_reactivex_spark.operators.llm_curation import (
        OUTLIER_R2,
        llm_embed_outliers,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_embed_outliers(spark, sf_dir).collect()
    n_vecs = table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    mean_d2 = sum(r["d2"] for r in rows) // len(rows)
    n_out = 0
    for r in rows:
        want = int(r["d2"] > OUTLIER_R2 * mean_d2)
        assert r["is_outlier"] == want, (r, mean_d2)
        n_out += want
    assert n_out < n_vecs // 5


def test_twin_embed_outliers_equals_batch(spark, sf_dir, tmp_path):
    """The streaming OOD gate drains to exactly the batch op's rows:
    same shared scorer, same materialized model pack."""
    from scala_reactivex_spark.operators.llm_curation import (
        llm_embed_outliers,
    )
    from scala_reactivex_spark.sources.catalog import table
    from scala_reactivex_spark.streaming import twins

    src = str(tmp_path / "emb_src")
    table(spark, sf_dir, "embeddings").repartition(2).write.parquet(src)
    pack = twins.embed_outlier_pack(spark, sf_dir)
    out = twins.run_stream_to_table(
        twins.twin_embed_outliers(
            twins.embeddings_stream(spark, src), pack
        ),
        "t_embout",
        str(tmp_path / "ckpt"),
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in llm_embed_outliers(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_dup_ngram_coverage_matches_bruteforce(spark, sf_dir):
    """Full brute-force replication in Python with the same pinned
    hash family: per source, gram-instance counts and duplicated-gram
    coverage match exactly."""
    from scala_reactivex_spark.functions.portable_hash import (
        FOLD_BASE,
        KR_BASE,
        P31,
    )
    from scala_reactivex_spark.operators.llm_curation import (
        DUP_NGRAM_W,
        llm_dup_ngram_coverage,
    )
    from scala_reactivex_spark.sources.catalog import table

    def kr(tok: str) -> int:
        acc = 0
        for ch in tok:
            acc = (acc * KR_BASE + ord(ch)) % P31
        return acc

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    gram_docs: dict[int, set[int]] = {}
    instances: list[tuple[str, int, int]] = []  # (source, doc, gram)
    for r in docs:
        toks = r["text"].split(" ")
        if len(toks) < DUP_NGRAM_W:
            continue
        hs = [kr(t) for t in toks]
        for i in range(len(hs) - DUP_NGRAM_W + 1):
            g = hs[i]
            for j in range(1, DUP_NGRAM_W):
                g = (g * FOLD_BASE + hs[i + j]) % P31
            gram_docs.setdefault(g, set()).add(r["doc_id"])
            instances.append((r["source"], r["doc_id"], g))
    want: dict[str, list[int]] = {}
    for src, _doc, g in instances:
        w = want.setdefault(src, [0, 0])
        w[0] += 1
        if len(gram_docs[g]) >= 2:
            w[1] += 1
    got = {
        r["source"]: r for r in llm_dup_ngram_coverage(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for src, (n_grams, n_dup) in want.items():
        assert got[src]["n_grams"] == n_grams
        assert got[src]["n_dup_grams"] == n_dup
        assert got[src]["coverage_1e4"] == n_dup * 10000 // n_grams


def test_pipeline_funnel_monotone_and_composes(spark, sf_dir):
    """Stage counts are non-increasing, stage 0 is the corpus, stage 1
    equals the graded rule battery's keep count, and the pinned ratios
    re-derive from the counts."""
    from scala_reactivex_spark.operators.llm_curation import (
        FUNNEL_STAGES,
        llm_pipeline_funnel,
    )
    from scala_reactivex_spark.operators.llm_text import llm_quality_rules
    from scala_reactivex_spark.sources.catalog import table

    rows = sorted(
        llm_pipeline_funnel(spark, sf_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_name"] for r in rows] == list(FUNNEL_STAGES)
    assert rows[0]["n_docs"] == table(spark, sf_dir, "documents").count()
    rules_keep = (
        llm_quality_rules(spark, sf_dir).agg(F.sum("keep")).collect()[0][0]
    )
    assert rows[1]["n_docs"] == rules_keep
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] >= b["n_docs"]
        assert a["n_toks"] >= b["n_toks"]
        assert b["step_1e4"] == b["n_docs"] * 10000 // a["n_docs"]
    for r in rows:
        assert r["retention_1e4"] == r["n_docs"] * 10000 // rows[0]["n_docs"]


def test_bloom_fpr_audit_agrees_with_theory(spark, sf_dir):
    """The audit's own acceptance holds at the gate scale (measured
    FPR within 2x of the load^K rate) and its counts are internally
    consistent."""
    from scala_reactivex_spark.operators.llm_curation import (
        llm_bloom_fpr_audit,
    )
    from scala_reactivex_spark.operators.llm_pipeline import BLOOM_M

    [r] = llm_bloom_fpr_audit(spark, sf_dir).collect()
    assert r["within_2x"] == 1
    assert 0 < r["n_set"] < BLOOM_M
    assert r["load_1e6"] == r["n_set"] * 1_000_000 // BLOOM_M
    assert 0 <= r["n_fp"] <= r["n_neg"]
    assert r["fpr_meas_1e6"] == r["n_fp"] * 1_000_000 // r["n_neg"]
