"""Invariant tests for the corpus-statistics / rebalancing operators.

The DuckDB oracle gate (scripts/verify_local.py) pins exact values; these
tests pin the LAWS the operators must satisfy at any scale factor, so a
fixture change can't silently degrade them into degenerate output.
"""

from __future__ import annotations

from scala_reactivex_spark.operators.llm_dedup import llm_boilerplate
from scala_reactivex_spark.operators.llm_pipeline import (
    STRATUM_CAP,
    llm_stratified_sample,
)
from scala_reactivex_spark.operators.llm_text import (
    VOCAB_TOPK,
    llm_vocab_coverage,
)
from scala_reactivex_spark.operators.relational import rel_pivot


def test_pivot_is_lossless_regrouping(spark, sf_dir):
    """Pivot cells must re-sum to the plain groupBy totals (same rows,
    different shape) — and every (flag × status) cell is populated in the
    fixture, so no NULL column appears."""
    rows = {r["l_returnflag"]: r for r in rel_pivot(spark, sf_dir).collect()}
    assert set(rows) == {"A", "N", "R"}
    import pyspark.sql.functions as F

    from scala_reactivex_spark.sources.catalog import table

    plain = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double"), 4).alias("q"))
        .collect()
    )
    for p in plain:
        r = rows[p["l_returnflag"]]
        assert abs((r["f_qty"] + r["o_qty"]) - p["q"]) < 1e-6


def test_vocab_coverage_monotone_and_bounded(spark, sf_dir):
    rows = sorted(
        llm_vocab_coverage(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, VOCAB_TOPK + 1))
    # counts non-increasing in rank; coverage strictly increasing, ≤ 1
    for a, b in zip(rows, rows[1:]):
        assert a["n"] >= b["n"]
        assert a["coverage_1e4"] < b["coverage_1e4"]
    assert 0 < rows[0]["coverage_1e4"] <= rows[-1]["coverage_1e4"] <= 10000


def test_stratified_sample_respects_caps(spark, sf_dir):
    rows = llm_stratified_sample(spark, sf_dir).collect()
    assert rows, "no strata"
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_total"]
        assert 1 <= r["threshold_256"] <= 256
        # a stratum already under cap keeps everything (threshold saturates)
        if r["n_total"] <= STRATUM_CAP:
            assert r["threshold_256"] == 256
            assert r["n_kept"] == r["n_total"]
        else:
            # binomial(n_total, k/256) concentrates: expected kept is
            # n_total·k/256 ≈ cap; allow wide deterministic slack (±60%)
            assert r["n_kept"] <= 2 * STRATUM_CAP


def test_boilerplate_density_laws(spark, sf_dir):
    rows = llm_boilerplate(spark, sf_dir).collect()
    n_docs = len(rows)
    assert n_docs > 0
    for r in rows:
        assert 0 < r["n_bigrams"]
        assert 0 <= r["n_common"] <= r["n_bigrams"]
        assert 0 <= r["common_1e4"] <= 10000
        assert r["common_1e4"] == r["n_common"] * 10000 // r["n_bigrams"]
    # the signal must separate documents (not a degenerate constant column)
    assert len({r["common_1e4"] for r in rows}) > 1


def test_decontaminate_flags_only_train_docs(spark, sf_dir):
    from scala_reactivex_spark.operators.llm_pipeline import llm_decontaminate
    from scala_reactivex_spark.operators.llm_pipeline import llm_doc_split

    rows = llm_decontaminate(spark, sf_dir).collect()
    assert rows, "fixture should contain some contamination"
    n_train = {
        r["split"]: r["n_docs"] for r in llm_doc_split(spark, sf_dir).collect()
    }["train"]
    assert len(rows) <= n_train
    for r in rows:
        assert r["n_hits"] >= 1
        assert 0 < r["hit_1e4"] <= 10000


def test_dedup_incremental_laws(spark, sf_dir):
    """Incremental dedup must (a) cover exactly the incoming slice,
    (b) derive keep from the two dup flags, and (c) emit near matches
    that are a subset of the full MinHash pair set (same bands, same
    cap, restricted to cross-side pairs)."""
    from scala_reactivex_spark.operators.llm_dedup import (
        INCR_MOD,
        llm_dedup_incremental,
        llm_dedup_minhash,
    )

    out = llm_dedup_incremental(spark, sf_dir).collect()
    import pyspark.sql.functions as F

    from scala_reactivex_spark.sources.catalog import table

    hexpos = (
        "instr('0123456789abcdef', "
        "substr(md5(cast(text as binary)), {}, 1))"
    )
    n_in = (
        table(spark, sf_dir, "documents")
        .where(
            F.expr(
                f"(({hexpos.format(1)} - 1) * 16 + {hexpos.format(2)} - 1)"
                f" % {INCR_MOD} = 0"
            )
        )
        .count()
    )
    assert len(out) == n_in > 0
    for r in out:
        assert r["keep"] == int(r["is_exact_dup"] == 0 and r["n_near"] == 0)
        assert (r["n_near"] == 0) == (r["best_near"] == -1)
    # Near matches ⊆ full MinHash pair set (order-normalized).
    full = {
        (r["doc_a"], r["doc_b"])
        for r in llm_dedup_minhash(spark, sf_dir).collect()
    }
    matched = [r for r in out if r["n_near"] > 0]
    assert matched, "fixture must exercise the near path"
    for r in matched:
        pair = tuple(sorted((r["doc_id"], r["best_near"])))
        assert pair in full


def test_textrank_mass_and_bounds(spark, sf_dir):
    """PageRank laws under floor arithmetic: every node holds at least the
    teleport base share, total mass never exceeds the initial unit (floor
    division only loses mass), and the node set is the edge vocabulary."""
    from scala_reactivex_spark.operators.llm_graph import (
        RANK_UNIT,
        llm_textrank,
    )

    rows = llm_textrank(spark, sf_dir).collect()
    n = len(rows)
    assert n > 1
    base = (3 * (RANK_UNIT // n)) // 20
    total = sum(r["rank_1e12"] for r in rows)
    assert total <= RANK_UNIT
    # Mass lost to flooring is at most ~1 unit per edge per round — the
    # bulk of the unit mass must survive three rounds.
    assert total > RANK_UNIT * 9 // 10
    for r in rows:
        assert r["rank_1e12"] >= base
        assert r["out_deg"] >= 1


def test_zipf_sign_and_consistency(spark, sf_dir):
    """The emitted slope is negated by construction — assert the fit is
    genuinely decreasing (neg_slope > 0) and the scalar columns agree
    with direct corpus counts."""
    from scala_reactivex_spark.operators.llm_text import llm_zipf

    import pyspark.sql.functions as F

    from scala_reactivex_spark.sources.catalog import table

    row = llm_zipf(spark, sf_dir).collect()[0]
    assert row["neg_slope_1e4"] > 0
    assert 0 < row["top_share_1e4"] <= 10000
    tok = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("t")
    )
    assert row["n_tokens"] == tok.count()
    assert row["n_terms"] == tok.distinct().count()


def test_dsir_directional_and_feature_count(spark, sf_dir):
    """DSIR must rate target-language docs above the rest on average
    (the whole point of importance weighting), and per-doc feature
    count equals token count minus one."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.llm_pipeline import (
        DSIR_TARGET_LANG,
        llm_dsir,
    )
    from scala_reactivex_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tok")
    )
    j = llm_dsir(spark, sf_dir).join(docs, "doc_id").collect()
    assert all(r["n_feat"] == r["n_tok"] - 1 for r in j if r["n_tok"] >= 2)
    tgt = [r["dsir_1e6"] / max(r["n_feat"], 1) for r in j
           if r["lang"] == DSIR_TARGET_LANG]
    rest = [r["dsir_1e6"] / max(r["n_feat"], 1) for r in j
           if r["lang"] != DSIR_TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_compaction_plan_conserves_and_fills(spark, sf_dir):
    """The plan must conserve docs and bytes exactly (it is a regrouping,
    not a filter), and every planned file has at least one input."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.llm_pipeline import (
        llm_compaction_plan,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_compaction_plan(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    tot = docs.agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("b")
    ).collect()[0]
    assert sum(r["n_docs"] for r in rows) == tot["n"]
    assert sum(r["bytes"] for r in rows) == tot["b"]
    assert all(r["n_inputs"] >= 1 and r["fill_1e4"] > 0 for r in rows)
    assert len({(r["shard"], r["out_file"]) for r in rows}) == len(rows)


def test_soft_sample_is_quality_monotone(spark, sf_dir):
    """keep must equal the integer comparison by construction, and kept
    docs must average higher quality than dropped ones (the operator's
    purpose); acceptance rate sits strictly inside (0, 1)."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        SOFT_SAMPLE_RES,
        llm_soft_sample,
    )

    rows = llm_soft_sample(spark, sf_dir).collect()
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    assert kept and dropped
    for r in rows:
        import math

        thr = math.floor(r["quality"] * SOFT_SAMPLE_RES + 0.5)
        assert r["keep"] == int(r["u16"] < thr)
        assert 0 <= r["u16"] < SOFT_SAMPLE_RES
    avg = lambda xs: sum(x["quality"] for x in xs) / len(xs)  # noqa: E731
    assert avg(kept) > avg(dropped)


def test_pmi_support_and_order(spark, sf_dir):
    """Exactly PMI_TOPK rows, every pair meets the support floor, and
    the emitted order key (pmi DESC, pair) is a total order."""
    from scala_reactivex_spark.operators.llm_signals import (
        PMI_MIN_COUNT,
        PMI_TOPK,
        llm_pmi,
    )

    rows = llm_pmi(spark, sf_dir).collect()
    assert len(rows) == PMI_TOPK
    assert all(r["c2"] >= PMI_MIN_COUNT for r in rows)
    keys = [(-r["pmi_1e6"], r["b1"], r["b2"]) for r in rows]
    assert keys == sorted(keys)


def test_dedup_recall_precision_one(spark, sf_dir):
    """LSH pairs are exact-verified, so the intersection with the
    all-pairs baseline must be the whole LSH set (precision 1), and the
    recall ratio must be arithmetically consistent."""
    from scala_reactivex_spark.operators.llm_dedup import llm_dedup_recall

    r = llm_dedup_recall(spark, sf_dir).collect()[0]
    assert r["n_common"] == r["n_lsh"] <= r["n_exact"]
    assert r["recall_1e4"] == r["n_common"] * 10000 // r["n_exact"]
    assert r["n_exact"] > 0


def test_mad_outliers_laws(spark, sf_dir):
    """MAD is non-negative and bounded by the value spread; outliers are
    a strict minority under the 3·MAD rule; type counts partition the
    fact table."""
    from scala_reactivex_spark.operators.relational import rel_mad_outliers
    from scala_reactivex_spark.sources.catalog import table

    rows = rel_mad_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] < r["n"]
    total = table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == total


def test_crossdup_sources_partitions_pairs(spark, sf_dir):
    """Every MinHash pair lands in exactly one unordered source cell."""
    from scala_reactivex_spark.operators.llm_dedup import (
        llm_crossdup_sources,
        llm_dedup_minhash,
    )

    cells = llm_crossdup_sources(spark, sf_dir).collect()
    n_pairs = llm_dedup_minhash(spark, sf_dir).count()
    assert sum(c["n_pairs"] for c in cells) == n_pairs > 0
    assert all(c["source_a"] <= c["source_b"] for c in cells)


def test_corpus_diff_set_algebra(spark, sf_dir):
    """Diff counts must satisfy set algebra per source: v1 = common +
    removed, v2 = common + added, churn consistent with cell totals."""
    from scala_reactivex_spark.operators.llm_pipeline import llm_corpus_diff

    rows = llm_corpus_diff(spark, sf_dir).collect()
    assert rows
    saw_change = False
    for r in rows:
        assert r["n_v1"] == r["n_common"] + r["n_removed"]
        assert r["n_v2"] == r["n_common"] + r["n_added"]
        cells = r["n_common"] + r["n_added"] + r["n_removed"]
        assert r["churn_1e4"] == (
            (r["n_added"] + r["n_removed"]) * 10000 // cells
        )
        saw_change = saw_change or r["n_added"] + r["n_removed"] > 0
    assert saw_change


def test_mix_temperature_flattens_shares(spark, sf_dir):
    """Sqrt damping must shrink the largest source's share and grow the
    smallest's (the whole point of sampling temperature); shares stay a
    near-partition of 1e4 (floor slack < #sources)."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        llm_mix_temperature,
    )

    rows = llm_mix_temperature(spark, sf_dir).collect()
    assert len(rows) > 1
    big = max(rows, key=lambda r: r["tokens"])
    small = min(rows, key=lambda r: r["tokens"])
    assert big["temp_share_1e4"] <= big["raw_share_1e4"]
    assert small["temp_share_1e4"] >= small["raw_share_1e4"]
    for key in ("raw_share_1e4", "temp_share_1e4"):
        s = sum(r[key] for r in rows)
        assert 10000 - len(rows) < s <= 10000


def test_hard_negatives_margin_and_labels(spark, sf_dir):
    """Pairs must be label-correct (positive shares the probe's label,
    negative doesn't) and each is the best of its slice — the positive
    cosine bounds every same-label candidate, likewise the negative."""
    from scala_reactivex_spark.operators.llm_similarity import (
        N_PROBES,
        llm_hard_negatives,
    )

    rows = {r["probe_id"]: r for r in
            llm_hard_negatives(spark, sf_dir).collect()}
    assert set(rows) == set(range(N_PROBES))
    emb = {r["vec_id"]: r["label"]
           for r in spark.read.parquet(
               f"{sf_dir}/embeddings.parquet").collect()}
    for p, r in rows.items():
        assert emb[r["pos_id"]] == r["label"] == emb[p]
        assert emb[r["neg_id"]] != r["label"]
        assert r["pos_id"] != p and r["neg_id"] != p


def test_simhash_nn_symmetric_and_optimal(spark, sf_dir):
    """NN laws: the reported neighbor is within the threshold, never the
    doc itself, and mutually consistent — if a's best is b at distance
    d, then b's best distance is <= d (b at least has candidate a,
    unless its bucket rows were capped, which this fixture's surviving
    buckets are not for reported pairs)."""
    from scala_reactivex_spark.operators.llm_dedup import (
        SIMHASH_NN_HAM_T,
        llm_dedup_simhash_nn,
    )

    rows = {r["doc_id"]: r for r in
            llm_dedup_simhash_nn(spark, sf_dir).collect()}
    assert rows
    for d, r in rows.items():
        assert r["nn_id"] != d
        assert 0 <= r["hamming"] <= SIMHASH_NN_HAM_T
        back = rows.get(r["nn_id"])
        assert back is not None and back["hamming"] <= r["hamming"]


def test_lang_confusion_partitions_docs(spark, sf_dir):
    """Matrix cells partition the corpus; row shares near-sum to 1e4
    within floor slack; diagonal dominance sanity (the classifier beats
    chance on its own training corpus)."""
    from scala_reactivex_spark.operators.llm_text import llm_lang_confusion

    rows = llm_lang_confusion(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    by_true: dict[str, list] = {}
    for r in rows:
        by_true.setdefault(r["lang_true"], []).append(r)
    diag = total = 0
    for t, rs in by_true.items():
        s = sum(r["row_share_1e4"] for r in rs)
        assert 10000 - len(rs) < s <= 10000
        diag += sum(r["n"] for r in rs if r["lang_pred"] == t)
        total += sum(r["n"] for r in rs)
    n_langs = len(by_true)
    assert diag * n_langs > total  # better than uniform guessing


def test_gapfill_spine_complete(spark, sf_dir):
    """Every (type, day) in the observed [min, max] range appears
    exactly once, gap rows are zero, and non-gap rows re-sum to the
    event count."""
    from scala_reactivex_spark.operators.timeseries import rel_gapfill

    rows = rel_gapfill(spark, sf_dir).collect()
    days = {r["day"] for r in rows}
    lo, hi = min(days), max(days)
    types = {r["event_type"] for r in rows}
    assert len(rows) == len(types) * (hi - lo + 1)
    total = 0
    for r in rows:
        if r["is_gap"]:
            assert r["n"] == 0
        total += r["n"]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_cluster_stats_conserves_members(spark, sf_dir):
    """Histogram identities: docs = clusters × size, droppable = docs -
    clusters, totals equal the membership table."""
    from scala_reactivex_spark.operators.llm_dedup import (
        llm_cluster_stats,
        llm_dedup_minhash_cluster,
    )

    rows = llm_cluster_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] == r["n_clusters"] * r["cluster_size"]
        assert r["n_droppable"] == r["n_docs"] - r["n_clusters"]
        assert r["cluster_size"] >= 2  # singletons never enter the graph
    members = llm_dedup_minhash_cluster(spark, sf_dir).count()
    assert sum(r["n_docs"] for r in rows) == members


def test_neg_sampling_table_laws(spark, sf_dir):
    """Damping must compress the distribution (max p under f^0.75 is
    below max raw share), the cumulative column telescopes in token
    order, and probabilities near-sum to 1e6."""
    from scala_reactivex_spark.operators.llm_text import llm_neg_sampling

    rows = sorted(
        llm_neg_sampling(spark, sf_dir).collect(),
        key=lambda r: r["token"],
    )
    tot_f = sum(r["f"] for r in rows)
    tot_w = sum(r["w1e6"] for r in rows)
    run = 0
    for r in rows:
        run += r["w1e6"]
        assert r["cum_w1e6"] == run
        assert r["p_1e6"] == r["w1e6"] * 1_000_000 // tot_w
    max_raw = max(r["f"] / tot_f for r in rows)
    max_damped = max(r["p_1e6"] for r in rows) / 1e6
    assert max_damped <= max_raw + 1e-6
    s = sum(r["p_1e6"] for r in rows)
    assert 1_000_000 - len(rows) < s <= 1_000_000


def test_span_corruption_rate_and_spans(spark, sf_dir):
    """Mask laws: spans never exceed masked tokens (each span holds >= 1),
    corpus-wide mask share lands near the 15% target, and share
    arithmetic is exact."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        llm_span_corruption,
    )

    rows = llm_span_corruption(spark, sf_dir).collect()
    tot = masked = 0
    for r in rows:
        assert 0 <= r["n_spans"] <= r["n_masked"] <= r["n_tok"]
        assert r["mask_share_1e4"] == r["n_masked"] * 10000 // r["n_tok"]
        tot += r["n_tok"]
        masked += r["n_masked"]
    share = masked / tot
    assert 0.12 < share < 0.18


def test_source_scorecard_consistency(spark, sf_dir):
    """Scorecard cells must re-derive from the decision table: doc
    counts partition the corpus, rates are exact integer ratios, and a
    doc can only be kept if it is not a duplicate."""
    from scala_reactivex_spark.operators.llm_compose import (
        llm_corpus_filter,
        llm_source_scorecard,
    )

    cards = llm_source_scorecard(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(c["n_docs"] for c in cards) == n_docs
    for c in cards:
        assert 0 <= c["dup_rate_1e4"] <= 10000
        assert 0 <= c["keep_rate_1e4"] <= 10000 - 0  # bounded
        assert c["keep_rate_1e4"] <= 10000 - c["dup_rate_1e4"] + 1
        assert 0 < c["mean_quality_1e4"] < 10000
    # spot-check one source against the raw decision table
    cf = llm_corpus_filter(spark, sf_dir).collect()
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).collect()
    }
    s0 = cards[0]["source"]
    mine = [r for r in cf if src[r["doc_id"]] == s0]
    assert cards[0]["n_docs"] == len(mine)
    assert cards[0]["dup_rate_1e4"] == (
        sum(r["is_dup"] for r in mine) * 10000 // len(mine)
    )


def test_budget_select_respects_budget_and_order(spark, sf_dir):
    """Selection laws: kept tokens never exceed the budget but get
    within one marginal doc of it; no kept doc has a lower band than
    any dropped doc outside the marginal band (quality-monotone
    admission); reasons are consistent with bands."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.llm_compose import (
        BUDGET_DIV,
        llm_budget_select,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_budget_select(spark, sf_dir).collect()
    total = (
        table(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    budget = total // BUDGET_DIV
    kept = [r for r in rows if r["keep"]]
    dropped = [r for r in rows if not r["keep"]]
    kept_tokens = sum(r["n_tok"] for r in kept)
    assert kept_tokens <= budget
    max_doc = max(r["n_tok"] for r in rows)
    assert kept_tokens > budget - max_doc, "budget nearly exhausted"
    if dropped:
        worst_kept = min(r["band"] for r in kept)
        best_dropped = max(r["band"] for r in dropped)
        assert worst_kept >= best_dropped
    for r in rows:
        if r["reason"] == "band":
            assert r["keep"] == 1
        if r["reason"] == "out":
            assert r["keep"] == 0


def test_oov_rate_train_anchor_and_ordering(spark, sf_dir):
    """Train's own OOV is zero by construction; held-out token OOV never
    exceeds bigram OOV (an unseen token forces unseen bigrams around
    it); rates are exact integer ratios."""
    from scala_reactivex_spark.operators.llm_pipeline import llm_oov_rate

    rows = {r["split"]: r for r in llm_oov_rate(spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert rows["train"]["oov_tok"] == 0
    assert rows["train"]["oov_big"] == 0
    for s, r in rows.items():
        assert r["oov_tok_1e4"] == r["oov_tok"] * 10000 // r["n_tok"]
        assert r["oov_big_1e4"] == r["oov_big"] * 10000 // r["n_big"]
        assert r["oov_tok_1e4"] <= r["oov_big_1e4"] or r["oov_big"] == 0


def test_quality_length_corr_matches_numpy(spark, sf_dir):
    """The pinned correlation must agree with numpy's corrcoef on the
    same integer inputs to within one 1e4 unit."""
    import numpy as np

    from scala_reactivex_spark.operators.llm_text import (
        llm_quality_length_corr,
        llm_quality_score,
    )

    r = llm_quality_length_corr(spark, sf_dir).collect()[0]
    assert 0 <= r["abs_corr_1e4"] <= 10000
    assert r["corr_sign"] in (-1, 0, 1)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n = np.array([len(d["text"].split(" ")) for d in docs], dtype=float)
    q = {
        row["doc_id"]: round(row["quality"] * 10000)
        for row in llm_quality_score(spark, sf_dir).collect()
    }
    qv = np.array([q[d["doc_id"]] for d in docs], dtype=float)
    rho = np.corrcoef(n, qv)[0, 1]
    assert abs(abs(rho) * 10000 - r["abs_corr_1e4"]) <= 1
    assert np.sign(rho) == r["corr_sign"]


def test_source_lang_entropy_bounds(spark, sf_dir):
    """Entropy bounds: 0 for a monolingual source, at most log10(L) for
    L languages (within per-cell floor slack), docs partition the
    corpus."""
    import math

    from scala_reactivex_spark.operators.llm_compose import (
        llm_source_lang_entropy,
    )

    rows = llm_source_lang_entropy(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        if r["n_langs"] == 1:
            assert r["entropy_1e6"] == 0
        cap = math.log10(r["n_langs"]) * 1_000_000 + r["n_langs"]
        assert 0 <= r["entropy_1e6"] <= cap


def test_reservoir_sample_fixed_size_and_content_addressed(spark, sf_dir):
    """Exactly min(K, n_source) docs per source, ranks 1..k, and the kept
    set is precisely the k hash-smallest docs of each stratum (the
    two-phase bucketed plan must be lossless vs the direct window)."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.llm_pipeline import (
        RESERVOIR_K,
        llm_reservoir_sample,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_reservoir_sample(spark, sf_dir).collect()
    sizes = {
        r["source"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(sizes)
    docs = {
        (r["source"], r["doc_id"]): r["text"]
        for r in table(spark, sf_dir, "documents").collect()
    }
    import hashlib

    for src, kept in by_src.items():
        want_n = min(RESERVOIR_K, sizes[src])
        assert len(kept) == want_n
        assert sorted(r["rk"] for r in kept) == list(range(1, want_n + 1))
        # Direct recomputation: k smallest (md5(text), doc_id) per source.
        ranked = sorted(
            (
                (hashlib.md5(text.encode()).hexdigest(), d)
                for (s, d), text in docs.items()
                if s == src
            ),
        )[:want_n]
        assert {d for _, d in ranked} == {r["doc_id"] for r in kept}


def test_rho_select_advantage_nonnegative_and_keep_consistent(
    spark, sf_dir
):
    from scala_reactivex_spark.operators.llm_pipeline import (
        RHO_MARGIN_U,
        llm_rho_select,
    )

    rows = llm_rho_select(spark, sf_dir).collect()
    assert rows, "selection produced no scored docs"
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r["n_tok"] > 0
        assert r["adv_per_tok_u"] >= 0
        assert r["keep"] == int(r["adv_per_tok_u"] >= RHO_MARGIN_U)


def test_eval_affinity_matches_numpy_exact(spark, sf_dir):
    """The affinity top-k must equal an exact integer recomputation
    (pin → centroid floor-mean → dot) done driver-side with numpy over
    the raw fixture — catching any float drift in the codegen path."""
    import math

    import numpy as np

    from scala_reactivex_spark.operators.llm_signals import (
        AFFINITY_ANCHOR,
        AFFINITY_K,
        llm_eval_affinity,
    )
    from scala_reactivex_spark.sources.catalog import table

    got = llm_eval_affinity(spark, sf_dir).collect()
    assert len(got) == AFFINITY_K

    raw = table(spark, sf_dir, "embeddings").collect()
    pin = {
        r["vec_id"]: np.array(
            [math.floor(float(x) * 1000000 + 0.5) for x in r["embedding"]],
            dtype=np.int64,
        )
        for r in raw
    }
    anchors = [
        pin[r["vec_id"]] for r in raw if r["label"] == AFFINITY_ANCHOR
    ]
    sums = np.sum(anchors, axis=0, dtype=np.int64)
    cvec = np.array(
        [math.floor(s / len(anchors)) for s in sums], dtype=np.int64
    )
    dots = sorted(
        ((int(v @ cvec), vid) for vid, v in pin.items()),
        key=lambda t: (-t[0], t[1]),
    )[:AFFINITY_K]
    want = {(vid, d) for d, vid in dots}
    assert {(r["vec_id"], r["dot_1e12"]) for r in got} == want


def test_spann_recall_dominates_single_probe_ivf(spark, sf_dir):
    """Boundary replication can only ADD candidates to a probe's bucket
    (every vector's primary assignment row survives the closure filter),
    so SPANN's candidate set is a superset of single-probe IVF's and its
    recall@k must dominate per probe."""
    from scala_reactivex_spark.operators.llm_compose import (
        llm_spann_recall,
    )

    rows = llm_spann_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["hits_spann"] >= r["hits_ivf"], r
        assert 0 <= r["recall_spann_1e4"] <= 10000


def test_spann_postings_cover_primary_assignment(spark, sf_dir):
    """Index-bloat invariants: every bucket's posting list contains all
    of its primary members (repl ratio ≥ 1), and the primary counts sum
    to the corpus size — replication adds rows, never moves them."""
    from scala_reactivex_spark.operators.llm_similarity import (
        llm_spann_stats,
    )
    from scala_reactivex_spark.sources.catalog import table

    stats = llm_spann_stats(spark, sf_dir).collect()
    assert stats
    n_vecs = table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_postings"] for r in stats) >= n_vecs
    assert sum(r["n_primary"] for r in stats) == n_vecs
    for r in stats:
        assert r["n_postings"] >= r["n_primary"]
        if r["n_primary"] > 0:
            assert r["repl_1e4"] >= 10000


def test_nb_lang_confusion_partitions_eval_split(spark, sf_dir):
    """The confusion matrix must partition the held-out docs exactly:
    cell counts sum to |{doc_id % 5 = 0}|, true langs cover the eval
    split's lang set, and predicted langs only ever come from the TRAIN
    split's class inventory."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.llm_text import llm_nb_lang
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_nb_lang(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    n_eval = docs.where(F.col("doc_id") % 5 == 0).count()
    assert sum(r["n_docs"] for r in rows) == n_eval
    train_langs = {
        r["lang"]
        for r in docs.where(F.col("doc_id") % 5 != 0)
        .select("lang")
        .distinct()
        .collect()
    }
    eval_langs = {
        r["lang"]
        for r in docs.where(F.col("doc_id") % 5 == 0)
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r["lang"] for r in rows} == eval_langs
    assert {r["pred_lang"] for r in rows} <= train_langs


def test_epoch_shuffle_conserves_and_mixes(spark, sf_dir):
    """The shuffle is a partition of the corpus (shard doc counts sum to
    N), shards are populated and mixed (every ≥10-doc shard sees more
    than one source), and the layout is a pure function of doc_id — a
    re-run returns identical rows."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        ES_SHARDS,
        llm_epoch_shuffle,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_epoch_shuffle(spark, sf_dir).collect()
    n = table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n
    assert {r["shard"] for r in rows} <= set(range(ES_SHARDS))
    for r in rows:
        assert 0 < r["top_share_1e4"] <= 10000
        assert 0 <= r["adj_same_1e4"] <= 10000
        if r["n_docs"] >= 10:
            assert r["n_src"] > 1, f"shard {r['shard']} unmixed: {r}"
    again = llm_epoch_shuffle(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_nb_margin_calibration_partitions_and_bounds(spark, sf_dir):
    """Calibration-table laws: the bands partition the eval split
    (doc counts sum to |eval|), each band's accuracy is a valid rate
    (n_correct ≤ n_docs, acc in [0, 1e4]), and the total correct count
    equals the confusion matrix's diagonal mass — the two views of the
    same grid must agree."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.llm_text import (
        llm_nb_lang,
        llm_nb_margin_calibration,
    )
    from scala_reactivex_spark.sources.catalog import table

    cal = llm_nb_margin_calibration(spark, sf_dir).collect()
    n_eval = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .count()
    )
    assert sum(r["n_docs"] for r in cal) == n_eval
    for r in cal:
        assert 0 <= r["n_correct"] <= r["n_docs"]
        assert 0 <= r["acc_1e4"] <= 10000
        assert 0 <= r["band"] <= 9
    diag = sum(
        r["n_docs"]
        for r in llm_nb_lang(spark, sf_dir).collect()
        if r["lang"] == r["pred_lang"]
    )
    assert sum(r["n_correct"] for r in cal) == diag


def test_zorder_buckets_are_tiles(spark, sf_dir):
    """Morton-curve law: with the z-value's top 6 bits as the bucket id
    (3 high bits from each dimension), every bucket's envelope lives
    inside one 32×32 tile of the normalized (u8, d8) plane — bounded
    WIDTH IN BOTH DIMENSIONS, which is exactly what a single-column
    sort cannot give (its stripes span the full width of the other
    dim).  Plus conservation and probe-consistency."""
    from scala_reactivex_spark.operators.creation import (
        Z_BOX,
        src_zorder_layout,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = src_zorder_layout(spark, sf_dir).collect()
    assert rows
    n = table(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in rows) == n
    lo, hi = Z_BOX
    for r in rows:
        assert r["max_u8"] - r["min_u8"] <= 31, r
        assert r["max_d8"] - r["min_d8"] <= 31, r
        assert r["env_area"] == (r["max_u8"] - r["min_u8"] + 1) * (
            r["max_d8"] - r["min_d8"] + 1
        )
        disjoint = (
            r["max_u8"] < lo
            or r["min_u8"] > hi
            or r["max_d8"] < lo
            or r["min_d8"] > hi
        )
        assert r["skippable"] == int(disjoint)
    # The probe box covers 1/64 of the tile grid in each dim band —
    # a healthy z-layout must make SOME buckets skippable.
    assert any(r["skippable"] for r in rows)
