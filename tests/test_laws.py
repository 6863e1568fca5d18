"""Property/law tests re-encoding the reference's ScalaCheck-style laws
(SURVEY.md §5.3): algebraic relations between operators that must hold on
any input, checked on the sf0.001 fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_reactivex_spark.operators import (  # noqa: F401 - registry load
    aggregates,
    combinators,
    llm_dedup,
    stateful,
    windows,
)
from scala_reactivex_spark.sources.catalog import events_stream, table


def test_scan_last_equals_reduce(spark, sf_dir):
    """scan's final intermediate == reduce's total, per user."""
    from pyspark.sql import Window

    scan = stateful.op_scan_running_sum(spark, sf_dir)
    red = stateful.op_reduce(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ms").desc(), F.col("event_id").desc()
    )
    last_scan = (
        scan.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", F.col("running_sum").alias("total_value"))
    )
    joined = last_scan.join(red.select("user_id", "total_value"), "user_id")
    assert joined.count() == red.count()
    mismatch = last_scan.join(
        red.select("user_id", "total_value"), ["user_id", "total_value"]
    )
    assert mismatch.count() == red.count()


def test_merge_count_is_sum_of_parts(spark, sf_dir):
    merged = combinators.op_merge(spark, sf_dir).count()
    p = events_stream(spark, sf_dir, "purchase").count()
    c = events_stream(spark, sf_dir, "click").count()
    assert merged == p + c


def test_debounce_is_subset(spark, sf_dir):
    deb = windows.op_debounce(spark, sf_dir).select("event_id")
    evs = table(spark, sf_dir, "events").select("event_id")
    assert deb.exceptAll(evs).count() == 0
    assert deb.count() <= evs.count()


def test_distinct_until_changed_no_consecutive_dupes(spark, sf_dir):
    from pyspark.sql import Window

    out = stateful.op_distinct_until_changed(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    again = out.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNotNull() & (F.col("prev") == F.col("event_type"))
    )
    assert again.count() == 0


def test_zip_count_is_min_of_counts(spark, sf_dir):
    z = combinators.op_zip(spark, sf_dir)
    p = (
        events_stream(spark, sf_dir, "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("np"))
    )
    c = (
        events_stream(spark, sf_dir, "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("nc"))
    )
    expected = (
        p.join(c, "user_id")
        .select(F.least("np", "nc").alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    assert z.count() == expected


def test_tumbling_window_sums_to_global(spark, sf_dir):
    win = windows.op_window_tumbling(spark, sf_dir)
    total_n = win.agg(F.sum("n")).collect()[0][0]
    assert total_n == table(spark, sf_dir, "events").count()


def test_take_bounded(spark, sf_dir):
    out = stateful.op_take(spark, sf_dir)
    over = (
        out.groupBy("user_id").agg(F.count("*").alias("n")).where("n > 5")
    )
    assert over.count() == 0


def test_throttle_emits_at_most_one_per_bucket(spark, sf_dir):
    out = windows.op_throttle_first(spark, sf_dir)
    dup = (
        out.groupBy("user_id", "bucket")
        .agg(F.count("*").alias("n"))
        .where("n > 1")
    )
    assert dup.count() == 0


def test_minhash_lsh_agrees_with_exact_near_dedup(spark, sf_dir):
    """LSH candidates that pass verification must equal the exact-Jaccard
    pair set at the same threshold (LSH only prunes candidates; on this
    corpus the band collision probability at j>=0.95 is ~1)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in llm_dedup.llm_dedup_near(spark, sf_dir).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in llm_dedup.llm_dedup_minhash(spark, sf_dir).collect()
    }
    assert lsh <= exact
    # recall sanity: at j≈1 candidates are near-certain
    ones = {
        (r.doc_a, r.doc_b)
        for r in llm_dedup.llm_dedup_near(spark, sf_dir)
        .where("jaccard >= 0.999")
        .collect()
    }
    assert ones <= lsh


def test_minhash_bucket_cap_law(spark, sf_dir):
    """Hot-bucket cap law: (1) a capped run's pair set is a subset of the
    uncapped run's (the cap only removes candidates, never adds); (2) with
    a cap larger than the corpus the guard is a no-op — output identical
    to uncapped; (3) with cap < smallest bucket everything is skipped."""
    big = 10**9
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in llm_dedup.llm_dedup_minhash(spark, sf_dir, cap=big).collect()
    }
    # The default production cap — binds or not, always a subset.
    default = {
        (r.doc_a, r.doc_b)
        for r in llm_dedup.llm_dedup_minhash(spark, sf_dir).collect()
    }
    assert default <= uncapped
    # A tiny cap that MUST bind (bucket size >= 2 wherever a pair exists).
    tiny = {
        (r.doc_a, r.doc_b)
        for r in llm_dedup.llm_dedup_minhash(spark, sf_dir, cap=2).collect()
    }
    assert tiny <= default
    assert llm_dedup.llm_dedup_minhash(spark, sf_dir, cap=1).count() == 0
    # Stats account for every banded entry: skipped + kept == docs × bands.
    n_docs = table(spark, sf_dir, "documents").count()
    stats = llm_dedup.llm_dedup_minhash_stats(spark, sf_dir).collect()
    assert sum(r.skipped_docs + r.kept_docs for r in stats) == (
        n_docs * llm_dedup.LSH_BANDS
    )


def test_combine_latest_pairs_nondecreasing(spark, sf_dir):
    """combineLatest emits one row per trigger event once both sides have
    been seen — count equals merged events minus the leading one-sided
    prefix, so it is bounded by the merge count."""
    cl = combinators.op_combine_latest(spark, sf_dir).count()
    merged = combinators.op_merge(spark, sf_dir).count()
    assert 0 < cl <= merged


def test_embed_lsh_subset_of_exact(spark, sf_dir):
    """Sign-LSH embedding dedup only PRUNES candidates: every pair it
    returns must be in the exact all-pairs result (same threshold)."""
    exact = {
        (r.vec_a, r.vec_b)
        for r in llm_dedup.llm_dedup_embed(spark, sf_dir).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in llm_dedup.llm_dedup_embed_lsh(spark, sf_dir).collect()
    }
    assert lsh <= exact


def test_embed_lsh_candidate_rate_bounded(spark, sf_dir):
    """The τ-adaptive banding must keep the candidate set a small fraction
    of all pairs — the property that makes sign-LSH the 100 TB path. The
    fixture population is mostly near-orthogonal, so the measured rate
    tracks the config's random-pair bound (≤4% by construction, <5%
    asserted with headroom)."""
    from scala_reactivex_spark.operators.llm_dedup import (
        EMBED_T,
        embed_lsh_candidates,
    )

    e = table(spark, sf_dir, "embeddings")
    n = e.count()
    n_pairs = n * (n - 1) // 2
    n_cand = embed_lsh_candidates(e, EMBED_T).count()
    assert n_cand < 0.05 * n_pairs, (n_cand, n_pairs)


def test_embed_lsh_recall_floor_on_near_dups(spark):
    """Recall floor on the cos≥0.85 sub-population. The parquet fixture has
    NO pairs above 0.85, so plant one: base vectors plus noisy copies at
    cos≈0.9, run the full LSH pipeline at τ=0.4 (the registered query's
    threshold), and require it to recover ≥80% of the planted near-dup
    pairs (theory: ≥0.85 at cos=0.85, ≈0.93 at cos=0.9 for the 8×8
    config). Deterministic: fixed data seed, fixed hyperplane seed."""
    import numpy as np

    from scala_reactivex_spark.operators.llm_dedup import (
        EMBED_T,
        embed_lsh_pairs,
    )

    rng = np.random.default_rng(42)
    base = rng.standard_normal((200, 64))
    noisy = base[:50] + 0.32 * rng.standard_normal((50, 64))
    vecs = np.vstack([base, noisy]).astype(np.float32)
    rows = [
        (i, [float(x) for x in vecs[i]]) for i in range(len(vecs))
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = unit @ unit.T
    iu = np.triu_indices(len(vecs), k=1)
    expected = {
        (int(a), int(b))
        for a, b in zip(iu[0][cos[iu] >= 0.85], iu[1][cos[iu] >= 0.85])
    }
    assert len(expected) >= 30, "fixture should plant enough near-dups"

    got = {
        (r.vec_a, r.vec_b)
        for r in embed_lsh_pairs(e, EMBED_T)
        .where("cos_sim >= 0.85")
        .collect()
    }
    recall = len(got & expected) / len(expected)
    assert recall >= 0.80, (recall, len(expected))


def test_simhash_locality(spark, sf_dir):
    """SimHash locality: near-identical docs (token-set Jaccard ~1) must
    have closer signatures than random pairs, on average — the property
    that makes signature banding work."""
    sig = {
        r.doc_id: r.simhash
        for r in llm_dedup.llm_dedup_simhash(spark, sf_dir).collect()
    }
    near = [
        (r.doc_a, r.doc_b)
        for r in llm_dedup.llm_dedup_near(spark, sf_dir)
        .where("jaccard >= 0.999")
        .collect()
    ]
    assert near, "fixture should contain token-set duplicates"
    ham = lambda a, b: bin(sig[a] ^ sig[b]).count("1")  # noqa: E731
    near_avg = sum(ham(a, b) for a, b in near) / len(near)
    ids = sorted(sig)
    rand_pairs = [(ids[i], ids[(i * 7 + 13) % len(ids)]) for i in range(100)]
    rand_pairs = [(a, b) for a, b in rand_pairs if a != b]
    rand_avg = sum(ham(a, b) for a, b in rand_pairs) / len(rand_pairs)
    assert near_avg < rand_avg / 2, (near_avg, rand_avg)


def test_ann_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with learned centroids must recover most of the exact top-10
    despite searching only 1 of 8 buckets per probe. Measured 0.86 on the
    fixture (deterministic: seeded centroids + one exact Lloyd step);
    asserted with headroom."""
    from scala_reactivex_spark.operators.llm_similarity import (
        llm_ann_ivf,
        llm_similarity_topk,
    )

    brute = {
        (r.probe_id, r.neighbor_id)
        for r in llm_similarity_topk(spark, sf_dir).collect()
    }
    ivf = {
        (r.probe_id, r.neighbor_id)
        for r in llm_ann_ivf(spark, sf_dir).collect()
    }
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.7, recall


def test_ann_ivf_multiprobe_recall_dominates_single(spark, sf_dir):
    """nprobe=2 searches a superset of nprobe=1's candidates, and a brute
    top-10 item present in a candidate set always survives the top-10 cut
    (only globally-higher items can outrank it) — so multi-probe recall
    is monotone: recall(mp) >= recall(single)."""
    from scala_reactivex_spark.operators.llm_similarity import (
        llm_ann_ivf,
        llm_ann_ivf_mp,
        llm_similarity_topk,
    )

    brute = {
        (r.probe_id, r.neighbor_id)
        for r in llm_similarity_topk(spark, sf_dir).collect()
    }
    single = {
        (r.probe_id, r.neighbor_id)
        for r in llm_ann_ivf(spark, sf_dir).collect()
    }
    multi = {
        (r.probe_id, r.neighbor_id)
        for r in llm_ann_ivf_mp(spark, sf_dir).collect()
    }
    r1 = len(single & brute) / len(brute)
    r2 = len(multi & brute) / len(brute)
    assert r2 >= r1, (r1, r2)


def test_connected_components_long_chain(spark):
    """Pointer-jumping must resolve a duplicate chain LONGER than the round
    budget (80 links vs 30 rounds — plain min-label propagation would need
    80 rounds), plus a disjoint component and an isolated pair, with
    exactly one canonical per component and cluster_id = min member."""
    from scala_reactivex_spark.operators.llm_dedup import (
        connected_components,
    )

    chain = [(i, i + 1) for i in range(100, 180)]  # 81 nodes, diameter 80
    other = [(500, 501), (501, 502), (502, 503)]
    lone = [(900, 901)]
    pairs = spark.createDataFrame(
        chain + other + lone, "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in connected_components(pairs).collect()
    }
    assert len(out) == 81 + 4 + 2
    for n in range(100, 181):
        assert out[n] == (100, n == 100)
    for n in range(500, 504):
        assert out[n] == (500, n == 500)
    for n in (900, 901):
        assert out[n] == (900, n == 900)


def test_lang_id_mechanism(spark, sf_dir):
    """lang-ID scoring mechanism: exactly one prediction per doc, drawn
    from the candidate language set, deterministic across runs (the
    smoothed-floor scoring covers every candidate, so no doc is lost to
    unseen-token joins)."""
    from scala_reactivex_spark.operators.llm_text import llm_lang_id
    from scala_reactivex_spark.sources.catalog import table as _table

    out = llm_lang_id(spark, sf_dir)
    docs = _table(spark, sf_dir, "documents")
    assert out.count() == docs.count()
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    preds = {r.lang_pred for r in out.select("lang_pred").distinct().collect()}
    assert preds <= langs
    again = llm_lang_id(spark, sf_dir)
    assert out.exceptAll(again).count() == 0


def test_lang_id_pack_cap_fallback(spark, sf_dir, monkeypatch):
    """Round 18 (r17 verdict #3 / ADVICE medium): the lang-ID model pack
    collects the |V|×L profile only under SPARK_GRAFT_PACK_CAP rows;
    over the cap it serves the persisted DISTRIBUTED frame.  Both paths
    must score identically — the cap changes where the bytes live, not
    the values."""
    from scala_reactivex_spark.operators.llm_text import llm_lang_id
    from scala_reactivex_spark.plans.memo import clear_session_memo

    base = sorted(map(tuple, llm_lang_id(spark, sf_dir).collect()))
    clear_session_memo()
    monkeypatch.setenv("SPARK_GRAFT_PACK_CAP", "0")
    try:
        fallback = sorted(
            map(tuple, llm_lang_id(spark, sf_dir).collect())
        )
    finally:
        # Do not leak the distributed-profile pack into other tests.
        clear_session_memo()
    assert base == fallback


def test_pack_sequences_budget_law(spark, sf_dir):
    """Packing law: a pack only exceeds the token budget via its final
    straddling doc — tokens BEFORE the last doc of any pack < budget, and
    pack ids per lang are a contiguous 0..max range."""
    from scala_reactivex_spark.operators.llm_pipeline import (
        CONTEXT_TOKENS,
        llm_pack_sequences,
    )

    out = llm_pack_sequences(spark, sf_dir).collect()
    assert out
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.pack_id)
        assert r.n_docs >= 1
    for lang, ids in by_lang.items():
        ids = sorted(ids)
        assert ids == list(range(len(ids))), (lang, ids[:5])
    # Straddle law on the raw per-doc packing: within any pack, the docs
    # BEFORE the final one fit the budget (pack_tokens − last_doc_tokens
    # < budget) — only the last doc may straddle. Recompute the per-doc
    # assignment independently in Python and also cross-check its pack
    # stats against the query output.
    import collections

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("lang", "doc_id", "size(split(text, ' ')) AS n_tok")
        .collect()
    )
    cum = collections.defaultdict(int)
    packs = collections.defaultdict(lambda: [0, 0, 0])  # n_docs, toks, last
    for r in sorted(docs, key=lambda r: (r.lang, r.doc_id)):
        before = cum[r.lang]
        pack = packs[(r.lang, before // CONTEXT_TOKENS)]
        pack[0] += 1
        pack[1] += r.n_tok
        pack[2] = r.n_tok  # doc_id-ordered loop → last write wins
        cum[r.lang] = before + r.n_tok
    for (lang, pack_id), (n, toks, last) in packs.items():
        assert toks - last < CONTEXT_TOKENS, (lang, pack_id, toks, last)
    got = {(r.lang, r.pack_id): (r.n_docs, r.pack_tokens) for r in out}
    assert got == {k: (n, toks) for k, (n, toks, _) in packs.items()}


def test_embed_quantize_bounds(spark, sf_dir):
    """Quantization law: every quantized component is in [-127, 127], the
    max-abs component maps to ±127 exactly, and the recorded dequant
    error stays under half a quantization step (scale/254 + 1 ulp grid)."""
    from pyspark.sql import functions as FF

    from scala_reactivex_spark.operators.llm_pipeline import (
        llm_embed_quantize,
    )
    out = llm_embed_quantize(spark, sf_dir)
    bad = out.where(
        FF.exists("q", lambda x: (x > 127) | (x < -127))
    ).count()
    assert bad == 0
    no_extreme = out.where(
        ~FF.exists("q", lambda x: FF.abs(x) == 127)
    ).count()
    assert no_extreme == 0
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
        "vec_id",
        "aggregate(transform(embedding, x -> abs(cast(x as double))), "
        "cast(0.0 as double), (a, x) -> greatest(a, x)) AS scale",
    )
    joined = out.join(e, "vec_id").where(
        FF.col("max_err_1e4") > FF.col("scale") / 254 * 10000 + 1
    )
    assert joined.count() == 0


def test_embed_lsh_rejects_wrong_dimension(spark):
    """The dimension guard must fail LOUDLY (it lives in a filter so
    Catalyst cannot prune it) instead of producing a garbage matmul."""
    import pytest as _pytest

    from scala_reactivex_spark.operators.llm_dedup import embed_lsh_pairs

    e = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(Exception, match="64-dim"):
        embed_lsh_pairs(e, 0.4).count()


def test_containment_lsh_subset_of_all_pairs(spark, sf_dir):
    """The capped-LSH containment scale path may only MISS pairs relative
    to the all-pairs baseline (band recall + hot-bucket cap), never
    invent them — and where both report a pair, the exact containment
    verify must agree to the digit."""
    from scala_reactivex_spark.operators import llm_dedup

    base = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in llm_dedup.llm_dedup_containment(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in llm_dedup.llm_containment_lsh(spark, sf_dir).collect()
    }
    assert set(lsh) <= set(base)
    assert lsh, "LSH containment found nothing on the near-dup fixture"
    for pair, c in lsh.items():
        assert base[pair] == c


def test_group_join_vs_interval_join(spark, sf_dir):
    """groupJoin must emit every purchase exactly once, with match
    counts that re-aggregate op_interval_join's pair rows (join ≡
    flattened groupJoin, the Rx law)."""
    from collections import Counter

    from scala_reactivex_spark.operators.combinators import (
        op_group_join,
        op_interval_join,
    )

    g = {r["p_event_id"]: r for r in op_group_join(spark, sf_dir).collect()}
    pairs = Counter(
        r["p_event_id"] for r in op_interval_join(spark, sf_dir).collect()
    )
    purchases = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("event_type = 'purchase'")
        .count()
    )
    assert len(g) == purchases
    for pid, r in g.items():
        assert r["n_clicks"] == pairs.get(pid, 0)
        if r["n_clicks"] == 0:
            assert r["first_c_ms"] is None and r["last_c_ms"] is None
        else:
            assert r["first_c_ms"] <= r["last_c_ms"] <= r["p_ms"]


def test_buffer_slide_covering_laws(spark, sf_dir):
    """Sliding-buffer laws: every full buffer holds exactly COUNT
    elements, buffer 0 starts at the user's first event, and total
    membership equals Σ per-element covering factor (each element sits
    in ceil(min(r, COUNT)/SKIP)-bounded buffers)."""
    from scala_reactivex_spark.operators.stateful import (
        SLIDE_COUNT,
        SLIDE_SKIP,
        op_buffer_slide,
    )

    rows = op_buffer_slide(spark, sf_dir).collect()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .count()
        .collect()
    )
    counts = {r["user_id"]: r["count"] for r in ev}
    for u, bufs in per_user.items():
        n = counts[u]
        bufs.sort(key=lambda r: r["buffer_id"])
        ids = [b["buffer_id"] for b in bufs]
        assert ids == list(range(len(ids))), "contiguous buffer ids"
        for b in bufs:
            assert b["n_in_buffer"] <= SLIDE_COUNT
            # A buffer is partial only if it reaches the stream tail.
            if b["buffer_id"] * SLIDE_SKIP + SLIDE_COUNT <= n:
                assert b["n_in_buffer"] == SLIDE_COUNT
        total = sum(b["n_in_buffer"] for b in bufs)
        member = sum(
            min((r - 1) // SLIDE_SKIP, (n - 1) // SLIDE_SKIP)
            - (0 if r <= SLIDE_COUNT
               else (r - SLIDE_COUNT + 1) // SLIDE_SKIP)
            + 1
            for r in range(1, n + 1)
        )
        # membership bounded by buffers actually opened
        assert total == sum(
            min(b["n_in_buffer"], SLIDE_COUNT) for b in bufs
        )
        assert member >= total > 0


def test_take_last_complement_law(spark, sf_dir):
    """takeLast(n) ∪ skipLast(n) = stream: the tail rows plus the
    non-tail rows partition each user's events, and tail positions
    count down to the final element."""
    from scala_reactivex_spark.operators.stateful import (
        TAKE_LAST_N,
        op_take_last,
    )

    tail = {}
    for r in op_take_last(spark, sf_dir).collect():
        tail.setdefault(r["user_id"], []).append(r)
    counts = {
        r["user_id"]: r["count"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .count()
        .collect()
    }
    for u, rs in tail.items():
        assert len(rs) == min(TAKE_LAST_N, counts[u])
        assert sorted(r["tail_pos"] for r in rs) == list(
            range(1, len(rs) + 1)
        )
        # tail_pos 1 is the chronologically last element
        rs.sort(key=lambda r: r["ms"])
        assert rs[-1]["tail_pos"] == 1


def test_window_toggle_containment(spark, sf_dir):
    """Every emitted event sits inside [its window's opening, the first
    error after it]; events before a user's first signup never appear."""
    from scala_reactivex_spark.operators.stateful import op_window_toggle

    rows = op_window_toggle(spark, sf_dir).collect()
    assert rows
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    first_signup = {}
    for e in ev:
        if e["event_type"] == "signup":
            ts = e["ts"]
            u = e["user_id"]
            if u not in first_signup or ts < first_signup[u]:
                first_signup[u] = ts
    for r in rows:
        assert r["window_ms"] <= r["ms"]
        assert r["user_id"] in first_signup
