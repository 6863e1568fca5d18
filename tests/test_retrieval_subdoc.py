"""Law tests for the round-6 retrieval / sub-document curation operators.

The DuckDB oracle gate pins exact values; these pin scale-independent
invariants so a fixture change can't silently degrade the operators into
degenerate output.
"""

from __future__ import annotations

from collections import defaultdict

from scala_reactivex_spark.operators.llm_pipeline import (
    N_SHARDS,
    llm_curriculum,
    llm_shard_assign,
)
from scala_reactivex_spark.operators.llm_retrieval import (
    BM25_TOPK,
    llm_bm25,
    llm_index_stats,
)
from scala_reactivex_spark.operators.llm_subdoc import (
    BPE_TOPK,
    llm_bpe_pairs,
    llm_dedup_substring,
    llm_line_dedup,
)
from scala_reactivex_spark.sources.catalog import table


def _n_docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").count()


def test_bm25_ranks_contiguous_scores_monotone(spark, sf_dir):
    rows = llm_bm25(spark, sf_dir).collect()
    assert rows, "no BM25 results"
    by_q = defaultdict(list)
    for r in rows:
        by_q[r["q_id"]].append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOPK
        for a, b in zip(rs, rs[1:]):
            # total order: score desc, then doc_id asc on ties
            assert a["score_micro"] > b["score_micro"] or (
                a["score_micro"] == b["score_micro"]
                and a["doc_id"] < b["doc_id"]
            )
        for r in rs:
            assert r["score_micro"] > 0  # BM25+ idf is strictly positive
            assert r["doc_id"] != q  # queries come from the held-out split


def test_index_stats_bounds(spark, sf_dir):
    n = _n_docs(spark, sf_dir)
    rows = llm_index_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["df"] <= n
        assert r["cf"] >= r["df"]  # every posting holds >= 1 occurrence
        assert 1 <= r["max_tf"] <= r["cf"]


def test_line_dedup_density_bounds(spark, sf_dir):
    rows = llm_line_dedup(spark, sf_dir).collect()
    assert len(rows) == _n_docs(spark, sf_dir)  # every doc profiled
    for r in rows:
        assert 0 <= r["n_dup_segs"] <= r["n_segs"]
        assert 0 <= r["dup_1e4"] <= 10000
        assert (r["dup_1e4"] == 0) == (r["n_dup_segs"] == 0)


def test_substring_runs_within_dup_counts(spark, sf_dir):
    rows = llm_dedup_substring(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup"] <= r["n_grams"]
        assert 0 <= r["max_run"] <= r["n_dup"]
        assert (r["max_run"] == 0) == (r["n_dup"] == 0)
    # the fixture contains deliberate near-duplicates: at least one doc
    # must show a copied passage longer than a single gram position
    assert any(r["max_run"] > 1 for r in rows)


def test_bpe_pairs_ranked_and_in_word(spark, sf_dir):
    rows = sorted(llm_bpe_pairs(spark, sf_dir).collect(),
                  key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= BPE_TOPK
    for a, b in zip(rows, rows[1:]):
        assert a["cnt"] > b["cnt"] or (
            a["cnt"] == b["cnt"] and a["pair"] < b["pair"]
        )
    for r in rows:
        assert len(r["pair"]) == 2
        assert " " not in r["pair"]  # word boundaries never merge


def test_shard_assign_partitions_corpus(spark, sf_dir):
    rows = llm_shard_assign(spark, sf_dir).collect()
    assert {r["shard"] for r in rows} <= set(range(N_SHARDS))
    assert sum(r["n_docs"] for r in rows) == _n_docs(spark, sf_dir)
    assert sum(r["share_1e4"] for r in rows) <= 10000  # floor-DIV shares
    for r in rows:
        assert r["n_docs"] >= 1
        assert r["min_doc"] <= r["max_doc"]


def test_curriculum_phases_partition_and_order(spark, sf_dir):
    rows = sorted(llm_curriculum(spark, sf_dir).collect(),
                  key=lambda r: r["phase"])
    assert [r["phase"] for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r["n_docs"] for r in rows) == _n_docs(spark, sf_dir)
    for r in rows:
        assert r["min_tok"] <= r["max_tok"]
    # quartile phases are disjoint, strictly increasing length bands
    for a, b in zip(rows, rows[1:]):
        assert a["max_tok"] < b["min_tok"]


def test_twin_bm25_equals_batch_scoring(spark, sf_dir, tmp_path):
    """Streaming queries scored against the static BM25 index converge
    to the batch scoring table exactly (integer micro-unit sums are
    order-independent, so micro-batch arrival order cannot matter)."""
    from scala_reactivex_spark.operators.llm_retrieval import (
        bm25_contrib,
        bm25_scored,
    )
    from scala_reactivex_spark.streaming import twins

    src = str(tmp_path / "docs_src")
    table(spark, sf_dir, "documents").repartition(4).write.parquet(src)
    contrib = bm25_contrib(spark, sf_dir)
    sdf = twins.docs_stream(spark, src)
    out = twins.run_stream_to_table(
        twins.twin_bm25(sdf, contrib),
        "t_bm25",
        str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    got = {
        (r["q_id"], r["doc_id"], r["score_micro"]) for r in out.collect()
    }
    want = {
        (r["q_id"], r["doc_id"], r["score_micro"])
        for r in bm25_scored(spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_merge_rounds_resolve_sentinels(spark, sf_dir):
    """Three merge rules, one per round; every rule resolves to readable
    corpus characters (no sentinel leaks), and round 1's rule is exactly
    the global top adjacent pair from llm_bpe_pairs."""
    from scala_reactivex_spark.operators.llm_subdoc import (
        BPE_SENTINELS,
        llm_bpe_merge,
    )

    rows = sorted(llm_bpe_merge(spark, sf_dir).collect(),
                  key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["cnt"] >= 1
        assert len(r["merge"]) >= 2
        for s in BPE_SENTINELS:
            assert s not in r["merge"]
    top = sorted(llm_bpe_pairs(spark, sf_dir).collect(),
                 key=lambda r: r["rank"])[0]
    assert rows[0]["merge"] == top["pair"]
    assert rows[0]["cnt"] == top["cnt"]


def test_ppl_filter_keeps_middle_band(spark, sf_dir):
    from scala_reactivex_spark.operators.llm_pipeline import (
        PPL_BAND_W,
        llm_ppl_filter,
    )

    rows = llm_ppl_filter(spark, sf_dir).collect()
    assert len(rows) == _n_docs(spark, sf_dir)  # every doc gets a verdict
    kept = [r for r in rows if r["keep"] == 1]
    assert len(kept) >= 0.9 * len(rows)  # [p05, p95] inclusive band range
    for r in rows:
        assert r["keep"] in (0, 1)
        assert r["band"] == r["cost_per_tok"] // PPL_BAND_W
    # dropped docs (if any) sit strictly outside the kept band range
    if len(kept) < len(rows):
        lo = min(r["band"] for r in kept)
        hi = max(r["band"] for r in kept)
        for r in rows:
            if r["keep"] == 0:
                assert r["band"] < lo or r["band"] > hi


def test_mix_budget_allocation_arithmetic(spark, sf_dir):
    from scala_reactivex_spark.operators.llm_pipeline import (
        MIX_BUDGET,
        llm_mix_budget,
    )

    rows = llm_mix_budget(spark, sf_dir).collect()
    n = len(rows)
    assert n >= 2
    for r in rows:
        assert r["target_tokens"] == MIX_BUDGET // n
        assert (
            r["epochs_1e4"]
            == (MIX_BUDGET // n) * 10000 // r["tokens_avail"]
        )
        assert r["tokens_avail"] > 0


def test_twin_shard_assign_matches_batch_counts(spark, sf_dir, tmp_path):
    """Streaming shard routing grouped by shard reproduces the batch
    operator's per-shard doc counts (pure content hash — arrival order
    and micro-batch slicing cannot matter)."""
    from collections import Counter

    from scala_reactivex_spark.operators.llm_pipeline import (
        llm_shard_assign,
    )
    from scala_reactivex_spark.streaming import twins

    src = str(tmp_path / "docs_src")
    table(spark, sf_dir, "documents").repartition(4).write.parquet(src)
    sdf = twins.docs_stream(spark, src)
    out = twins.run_stream_to_table(
        twins.twin_shard_assign(sdf), "t_shard", str(tmp_path / "ckpt")
    )
    got = Counter(r["shard"] for r in out.collect())
    want = {
        r["shard"]: r["n_docs"]
        for r in llm_shard_assign(spark, sf_dir).collect()
    }
    assert dict(got) == want


def test_ann_recall_mp_dominates_single_probe(spark, sf_dir):
    """Multi-probe search can only add candidates, so per-probe recall@k
    must dominate single-probe recall; both are bounded by k."""
    from scala_reactivex_spark.operators.llm_compose import llm_ann_recall

    rows = llm_ann_recall(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hits_ivf"] <= r["hits_mp"] <= r["k"]
        assert r["recall_mp_1e4"] >= r["recall_ivf_1e4"]
        assert r["recall_mp_1e4"] <= 10000


def test_winnowing_match_overlap_bounds(spark, sf_dir):
    """Shared-fingerprint counts are bounded by the smaller selected set;
    the fixture's near-duplicate docs must surface at least one
    high-overlap pair (winnowing guarantees shared fingerprints for any
    sufficiently long exact match)."""
    from scala_reactivex_spark.operators.llm_signals import (
        WINNOW_MATCH_MIN,
        llm_winnowing_match,
    )

    rows = llm_winnowing_match(spark, sf_dir).collect()
    assert rows, "no fingerprint matches on the near-dup fixture"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared"] >= WINNOW_MATCH_MIN
        assert 0 < r["overlap_1e4"] <= 10000
    assert any(r["overlap_1e4"] >= 5000 for r in rows)


def test_bpe_apply_compression_bounds(spark, sf_dir):
    """Applying merges can only shrink symbol counts, and the corpus-wide
    shrink from merge 1 must be at least its reported pair count (every
    replaced occurrence removes one symbol)."""
    from scala_reactivex_spark.operators.llm_subdoc import llm_bpe_apply

    rows = llm_bpe_apply(spark, sf_dir).collect()
    assert len(rows) == _n_docs(spark, sf_dir)
    for r in rows:
        assert 0 < r["syms_after"] <= r["syms_before"]
        assert r["ratio_1e4"] == r["syms_after"] * 10000 // r["syms_before"]
    assert any(r["syms_after"] < r["syms_before"] for r in rows)


def test_quality_rules_consistency(spark, sf_dir):
    from scala_reactivex_spark.operators.llm_text import llm_quality_rules

    rows = llm_quality_rules(spark, sf_dir).collect()
    assert len(rows) == _n_docs(spark, sf_dir)
    flags = ("r_len", "r_mwl", "r_rep", "r_div", "r_stop")
    for r in rows:
        for f in flags:
            assert r[f] in (0, 1)
        assert r["n_passed"] == sum(r[f] for f in flags)
        assert r["keep"] == int(all(r[f] for f in flags))
    assert any(r["keep"] == 1 for r in rows)  # battery keeps something


def test_embed_pca_direction_is_unit_scaled(spark, sf_dir):
    """The dominant component pins to exactly ±1e6 (renormalized by the
    max), every component is bounded by it, and the direction has real
    spread (not a degenerate one-hot)."""
    from scala_reactivex_spark.operators.llm_signals import llm_embed_pca

    rows = llm_embed_pca(spark, sf_dir).collect()
    assert len(rows) == 64
    comps = [r["comp_1e6"] for r in rows]
    assert max(abs(c) for c in comps) == 1_000_000
    assert all(abs(c) <= 1_000_000 for c in comps)
    assert sum(1 for c in comps if c != 0) > 8


def test_twin_unigram_lm_equals_batch_scores(spark, sf_dir, tmp_path):
    """Stream-served LM scores equal the batch operator's per-doc sums
    (exact integer contributions — arrival order cannot drift them), and
    the fixture vocabulary is fully covered (no OOV on same-corpus
    scoring)."""
    from scala_reactivex_spark.operators.llm_signals import llm_unigram_lm
    from scala_reactivex_spark.streaming import twins

    src = str(tmp_path / "docs_src")
    table(spark, sf_dir, "documents").repartition(4).write.parquet(src)
    model = twins.unigram_lm_model(spark, sf_dir)
    sdf = twins.docs_stream(spark, src)
    out = twins.run_stream_to_table(
        twins.twin_unigram_lm(sdf, model),
        "t_ulm",
        str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    got = {
        (r["doc_id"], r["n_tok"], r["logp_sum_1e6"]) for r in out.collect()
    }
    want = {
        (r["doc_id"], r["n_tok"], r["logp_sum_1e6"])
        for r in llm_unigram_lm(spark, sf_dir).collect()
    }
    assert got == want
    assert all(r["n_scored"] == r["n_tok"] for r in out.collect())


def test_dedup_impact_conserves_corpus(spark, sf_dir):
    """Before-counts must total the corpus; after <= before everywhere;
    and the fixture's planted near-dups mean SOMETHING is dropped."""
    from scala_reactivex_spark.operators.llm_dedup import llm_dedup_impact

    rows = llm_dedup_impact(spark, sf_dir).collect()
    assert sum(r["docs_before"] for r in rows) == _n_docs(spark, sf_dir)
    for r in rows:
        assert 0 <= r["docs_after"] <= r["docs_before"]
        assert 0 <= r["tokens_after"] <= r["tokens_before"]
        assert r["kept_1e4"] == r["docs_after"] * 10000 // r["docs_before"]
    assert sum(r["docs_after"] for r in rows) < sum(
        r["docs_before"] for r in rows
    )


def test_round6_family_survives_empty_corpus(spark, tmp_path):
    """Every round-6 corpus operator must return an empty result (not
    raise) on an empty documents table — at 100 TB a filtered partition
    or a fresh tenant IS empty, and a pipeline stage that throws on it
    takes the whole DAG down."""
    import pyspark.sql.functions as F  # noqa: F401

    from scala_reactivex_spark.operators.llm_compose import llm_ann_recall
    from scala_reactivex_spark.operators.llm_dedup import (
        llm_containment_lsh,
        llm_dedup_impact,
    )
    from scala_reactivex_spark.operators.llm_pipeline import (
        llm_curriculum,
        llm_mix_budget,
        llm_ppl_filter,
        llm_shard_assign,
    )
    from scala_reactivex_spark.operators.llm_retrieval import (
        llm_bm25,
        llm_index_stats,
    )
    from scala_reactivex_spark.operators.llm_signals import (
        llm_winnowing_match,
    )
    from scala_reactivex_spark.operators.llm_subdoc import (
        llm_bpe_apply,
        llm_bpe_merge,
        llm_bpe_pairs,
        llm_dedup_substring,
        llm_line_dedup,
    )
    from scala_reactivex_spark.operators.llm_text import llm_quality_rules

    d = str(tmp_path / "empty_sf")
    spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    ops = [
        llm_bm25, llm_index_stats, llm_line_dedup, llm_dedup_substring,
        llm_bpe_pairs, llm_bpe_merge, llm_bpe_apply, llm_quality_rules,
        llm_shard_assign, llm_curriculum, llm_ppl_filter, llm_mix_budget,
        llm_containment_lsh, llm_dedup_impact, llm_winnowing_match,
    ]
    for op in ops:
        assert op(spark, d).count() == 0, op.__name__


def test_embed_family_survives_empty_embeddings(spark, tmp_path):
    from scala_reactivex_spark.operators.llm_compose import llm_ann_recall
    from scala_reactivex_spark.operators.llm_signals import llm_embed_pca

    d = str(tmp_path / "empty_emb")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    assert llm_embed_pca(spark, d).count() == 0
    assert llm_ann_recall(spark, d).count() == 0


def test_twin_ppl_filter_equals_batch_decisions(spark, sf_dir, tmp_path):
    """Stream-served perplexity filtering reproduces the batch keep
    decisions exactly (integer scoring + batch-trained thresholds)."""
    from scala_reactivex_spark.operators.llm_pipeline import llm_ppl_filter
    from scala_reactivex_spark.streaming import twins

    src = str(tmp_path / "docs_src")
    table(spark, sf_dir, "documents").repartition(4).write.parquet(src)
    model = twins.unigram_lm_model(spark, sf_dir)
    thr = twins.ppl_thresholds(spark, sf_dir)
    sdf = twins.docs_stream(spark, src)
    out = twins.run_stream_to_table(
        twins.twin_ppl_filter(sdf, model, thr),
        "t_ppl",
        str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    got = {
        (r["doc_id"], r["cost_per_tok"], r["band"], r["keep"])
        for r in out.collect()
    }
    want = {
        (r["doc_id"], r["cost_per_tok"], r["band"], r["keep"])
        for r in llm_ppl_filter(spark, sf_dir).collect()
    }
    assert got == want


def test_index_gaps_delta_encoding_laws(spark, sf_dir):
    """Gaps telescope: sum of gaps equals last_doc_id + 1 per term, so
    avg_gap * df recovers it (up to the 1e4 floor); delta bits are at
    least df (every gap needs >= 1 bit) and bounded by df * 64."""
    from scala_reactivex_spark.operators.llm_retrieval import (
        llm_index_gaps,
        llm_index_stats,
    )

    gaps = {r["tok"]: r for r in llm_index_gaps(spark, sf_dir).collect()}
    stats = {r["tok"]: r for r in llm_index_stats(spark, sf_dir).collect()}
    assert set(gaps) == set(stats)
    for t, g in gaps.items():
        assert g["df"] == stats[t]["df"]
        assert 1 <= g["max_gap"]
        assert g["df"] <= g["delta_bits"] <= g["df"] * 64
        assert g["avg_gap_1e4"] >= 10000  # mean gap is at least 1


def test_line_purge_consistent_with_profile(spark, sf_dir):
    """The purge's removed token share must agree with the profile's
    duplicated-segment counts: removal happens exactly on the dup
    segments, and token totals reconcile with raw document lengths."""
    from scala_reactivex_spark.operators.llm_subdoc import (
        llm_line_dedup,
        llm_line_dedup_purge,
    )

    prof = {r["doc_id"]: r for r in llm_line_dedup(spark, sf_dir).collect()}
    purge = {
        r["doc_id"]: r for r in llm_line_dedup_purge(spark, sf_dir).collect()
    }
    assert set(prof) == set(purge)
    texts = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").collect()
    }
    for i, p in purge.items():
        assert p["n_tok_before"] == len(texts[i].split(" "))
        assert 0 <= p["n_tok_after"] <= p["n_tok_before"]
        # zero dup segments <=> nothing removed
        assert (prof[i]["n_dup_segs"] == 0) == (
            p["n_tok_after"] == p["n_tok_before"]
        )


def test_hybrid_rrf_arithmetic_and_order(spark, sf_dir):
    """RRF laws: 10 fused rows per probe, the fused score is exactly the
    two reciprocal-rank terms (integer floor), and rank order is
    monotone in the fused score with the doc_id tie-break."""
    from scala_reactivex_spark.operators.llm_retrieval import (
        RRF_K,
        RRF_PROBES,
        RRF_TOPK,
        llm_hybrid_rrf,
    )

    by_probe = {}
    for r in llm_hybrid_rrf(spark, sf_dir).collect():
        assert r["rrf_1e6"] == (
            1_000_000 // (RRF_K + r["r_lex"])
            + 1_000_000 // (RRF_K + r["r_sem"])
        )
        by_probe.setdefault(r["probe_id"], []).append(r)
    assert set(by_probe) == set(range(RRF_PROBES))
    for rs in by_probe.values():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, RRF_TOPK + 1))
        keys = [(-r["rrf_1e6"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_template_detect_matches_pure_python(spark, sf_dir):
    """Template clusters must equal an independent Python groupby of the
    leading-token keys."""
    from collections import Counter

    from scala_reactivex_spark.operators.llm_subdoc import (
        TPL_MIN,
        TPL_W,
        llm_template_detect,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    keys = Counter(
        " ".join(r["text"].split(" ")[:TPL_W])
        for r in docs
        if len(r["text"].split(" ")) >= TPL_W
    )
    want = {k: c for k, c in keys.items() if c >= TPL_MIN}
    got = {
        r["tpl"]: r["n_docs"]
        for r in llm_template_detect(spark, sf_dir).collect()
    }
    assert got == want
    for r in llm_template_detect(spark, sf_dir).collect():
        assert r["share_1e4"] == r["n_docs"] * 10000 // len(docs)


def test_twin_hybrid_rrf_serving_equals_batch(spark, sf_dir, tmp_path):
    """Streaming probe queries fused against the static hybrid index
    (foreachBatch + idempotent sink) reproduce the batch RRF operator
    exactly, and a replay with the same checkpoint commits nothing new
    (effectively-once serving)."""
    from pyspark.sql import functions as F

    from scala_reactivex_spark.operators.llm_retrieval import (
        RRF_PROBES,
        hybrid_corpus,
        llm_hybrid_rrf,
    )
    from scala_reactivex_spark.streaming import twins

    src = str(tmp_path / "probe_src")
    (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < RRF_PROBES)
        .repartition(3)  # ≥2 files → multiple micro-batches
        .write.parquet(src)
    )
    out_dir = str(tmp_path / "fused")
    ckpt = str(tmp_path / "ckpt")
    corpus = hybrid_corpus(spark, sf_dir)
    got_df = twins.twin_hybrid_rrf(
        twins.docs_stream(spark, src), corpus, out_dir, ckpt
    )
    got = {tuple(r) for r in got_df.collect()}
    want = {tuple(r) for r in llm_hybrid_rrf(spark, sf_dir).collect()}
    assert got == want and got
    # Replay: same checkpoint, same source — the drained query has no new
    # files, and committed batch markers make any replays no-ops.
    again_df = twins.twin_hybrid_rrf(
        twins.docs_stream(spark, src), corpus, out_dir, ckpt
    )
    assert {tuple(r) for r in again_df.collect()} == got
