"""Laws for the round-15 FRONTIER keys (beyond the DuckDB oracle gate):
packing acceptance audit, epoch repeat recipe, count-cutoff LM pruning,
LSH band-config tuner, executed compaction, ANALYZE-style stats."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pack_efficiency_reconciles_with_pack_layout(spark, sf_dir):
    """The audit is an exact rollup of the graded pack layout: per
    lang, pack/doc/token totals match llm_pack_sequences, and the mean
    fill is bounded by the worst pack."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        CONTEXT_TOKENS,
        llm_pack_efficiency,
        llm_pack_sequences,
    )

    eff = {r["lang"]: r for r in llm_pack_efficiency(spark, sf_dir).collect()}
    packs = (
        llm_pack_sequences(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_packs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("pack_tokens").alias("tokens"),
            F.max("pack_tokens").alias("max_pack_tokens"),
        )
    )
    for r in packs.collect():
        e = eff[r["lang"]]
        assert e["n_packs"] == r["n_packs"]
        assert e["n_docs"] == r["n_docs"]
        assert e["tokens"] == r["tokens"]
        assert e["max_pack_tokens"] == r["max_pack_tokens"]
        assert (
            e["overflow_packs"] + e["underfull_packs"] <= e["n_packs"]
        )
        # mean fill can't exceed the worst pack's fill
        assert (
            e["fill_1e4"]
            <= e["max_pack_tokens"] * 10_000 // CONTEXT_TOKENS
        )


def test_repeat_plan_cap_and_identity_laws(spark, sf_dir):
    """planned_tokens is exactly tokens x repeat (integer identity),
    repeats never exceed the cap, the capped flag is the cap
    predicate, and the plan covers every corpus doc exactly once."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        REPEAT_CAP_1E4,
        llm_repeat_plan,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_repeat_plan(spark, sf_dir).collect()
    assert len(rows) == 20  # fixture sources
    for r in rows:
        assert 0 < r["repeat_1e4"] <= REPEAT_CAP_1E4
        assert (
            r["planned_tokens"] == r["tokens"] * r["repeat_1e4"] // 10_000
        )
        uncapped = r["target_tokens"] * 10_000 // r["tokens"]
        assert r["capped"] == int(uncapped > REPEAT_CAP_1E4)
        if not r["capped"]:
            assert r["repeat_1e4"] == uncapped
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs


def test_ngram_lm_prune_monotone_and_threshold_one_keeps_all(
    spark, sf_dir
):
    """Raising the count cutoff only shrinks the model and its
    coverage (monotone in t), and t=1 prunes nothing by definition."""
    from scala_reactivex_spark.operators.llm_signals import (
        llm_ngram_lm_prune,
    )

    rows = {
        r["min_count"]: r
        for r in llm_ngram_lm_prune(spark, sf_dir).collect()
    }
    assert rows[1]["kept_grams"] == rows[1]["total_grams"]
    assert rows[1]["kept_1e4"] == 10_000
    assert rows[1]["covered_1e4"] == 10_000
    ts = sorted(rows)
    for lo, hi in zip(ts, ts[1:]):
        assert rows[hi]["kept_grams"] <= rows[lo]["kept_grams"]
        assert rows[hi]["covered_1e4"] <= rows[lo]["covered_1e4"]
        assert rows[hi]["total_grams"] == rows[lo]["total_grams"]


def test_band_tune_reconciles_with_production_banding(spark, sf_dir):
    """The tuner's (4 x 4) row audits the SAME banding the production
    minhash path runs: bucket count and probe pairs equal what the
    graded per-band stats imply, and the injected S-curve thresholds
    are the precomputed literals."""
    from scala_reactivex_spark.operators.llm_dedup import (
        LSH_BANDS,
        MINHASH_K,
        _doc_tokens,
        _minhash_bands,
        llm_minhash_band_tune,
    )

    rows = {
        (r["bands"], r["rows_per_band"]): r
        for r in llm_minhash_band_tune(spark, sf_dir).collect()
    }
    assert set(rows) == {(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)}
    assert rows[(16, 1)]["t_star_1e4"] == 625
    assert rows[(4, 4)]["t_star_1e4"] == 7071
    assert rows[(1, 16)]["t_star_1e4"] == 10_000
    # production config row == direct recount of _minhash_bands
    prod = rows[(LSH_BANDS, MINHASH_K // LSH_BANDS)]
    bsz = (
        _minhash_bands(_doc_tokens(spark, sf_dir))
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("c"))
    )
    agg = bsz.agg(
        F.count("*").alias("n"),
        F.max("c").alias("mx"),
        F.expr("sum(c * (c - 1) DIV 2)").alias("pp"),
    ).collect()[0]
    assert prod["n_buckets"] == agg["n"]
    assert prod["max_bucket"] == agg["mx"]
    assert prod["probe_pairs"] == agg["pp"]


def test_compaction_exec_lands_the_plan(spark, sf_dir):
    """The executed layout IS the plan: per planned output file the
    written parquet holds exactly the planned docs and bytes in
    exactly ONE physical file (the no-small-files contract), and the
    file totals reconcile with llm_compaction_plan."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        llm_compaction_exec,
        llm_compaction_plan,
    )

    got = {
        (r["shard"], r["out_file"]): r
        for r in llm_compaction_exec(spark, sf_dir).collect()
    }
    plan = {
        (r["shard"], r["out_file"]): r
        for r in llm_compaction_plan(spark, sf_dir).collect()
    }
    assert set(got) == set(plan)
    for key, r in got.items():
        assert r["n_files"] == 1, key
        assert r["n_docs"] == plan[key]["n_docs"], key
        assert r["bytes"] == plan[key]["bytes"], key
        assert r["n_sources"] == plan[key]["n_inputs"], key


def test_table_stats_bounds(spark, sf_dir):
    """Stats sanity: one row per profiled column, constant row count,
    NDV bounded by non-null rows, and the low-cardinality columns
    profile as such (the signals a CBO broadcasts on)."""
    from scala_reactivex_spark.operators.creation import (
        STATS_COLUMNS,
        src_table_stats,
    )

    rows = {r["column_name"]: r for r in src_table_stats(spark, sf_dir).collect()}
    assert set(rows) == set(STATS_COLUMNS)
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1
    for r in rows.values():
        assert 0 <= r["n_null"] <= r["n_rows"]
        assert 1 <= r["ndv"] <= r["n_rows"] - r["n_null"]
        assert r["ndv_ratio_1e4"] == r["ndv"] * 10_000 // r["n_rows"]
    assert rows["l_returnflag"]["ndv"] <= 3
    assert rows["l_linenumber"]["ndv"] <= 7
    assert rows["l_orderkey"]["ndv"] > rows["l_returnflag"]["ndv"]


def test_quality_psi_laws(spark, sf_dir):
    """PSI invariants: every band emits (spine), per-band contributions
    are non-negative (the (p1-p0)ln(p1/p0) form), counts reconcile with
    the corpus split, and identical snapshots would score zero —
    approximated here by asserting the parity split's total PSI is
    small relative to the 0.2 recalibration alarm (the halves are
    exchangeable draws from one corpus)."""
    from scala_reactivex_spark.operators.llm_text import (
        PSI_BANDS,
        llm_quality_psi,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_quality_psi(spark, sf_dir).collect()
    assert len(rows) == PSI_BANDS
    assert all(r["psi_1e6"] >= 0 for r in rows)
    n = table(spark, sf_dir, "documents").count()
    assert sum(r["n_old"] + r["n_new"] for r in rows) == n
    total_psi = sum(r["psi_1e6"] for r in rows) / 1e6
    assert total_psi < 0.2, total_psi


def test_dedup_threshold_sweep_monotone(spark, sf_dir):
    """Tightening the cut-off only shrinks everything (monotone in t),
    and the production floor row covers the full verified pair set."""
    from scala_reactivex_spark.operators.llm_dedup import (
        llm_dedup_minhash,
        llm_dedup_threshold_sweep,
    )

    rows = {
        r["t_1e4"]: r
        for r in llm_dedup_threshold_sweep(spark, sf_dir).collect()
    }
    assert rows[9500]["n_pairs"] == llm_dedup_minhash(spark, sf_dir).count()
    ts = sorted(rows)
    for lo, hi in zip(ts, ts[1:]):
        for col in ("n_pairs", "n_docs_involved", "n_dup_candidates"):
            assert rows[hi][col] <= rows[lo][col], (col, lo, hi)
    for r in rows.values():
        assert r["n_dup_candidates"] <= r["n_docs_involved"]
