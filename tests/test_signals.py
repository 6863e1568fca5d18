"""Invariant tests for the quality-signal operators (llm_signals.py).

The DuckDB oracle gate (scripts/verify_local.py) pins exact values; these
tests pin the LAWS each signal must satisfy at any scale factor, so a
fixture change can't silently degrade them into degenerate output.
"""

from __future__ import annotations

import math

from scala_reactivex_spark.operators.llm_signals import (
    CDC_W,
    llm_cdc_chunks,
    llm_embed_norm_stats,
    llm_repetition_score,
    llm_token_entropy,
    llm_unigram_lm,
)
from scala_reactivex_spark.operators.relational import (
    rel_grouping_sets,
    rel_q6_forecast,
)


def test_repetition_ratios_bounded(spark, sf_dir):
    """All 1e4-scaled masses are proper ratios; distinct ≤ total; a
    nonempty corpus yields nonempty output."""
    rows = llm_repetition_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["top_tok_1e4"] <= 10000
        assert 1 <= r["distinct_1e4"] <= 10000
        assert 1 <= r["top_bigram_1e4"] <= 10000
        assert 1 <= r["n_distinct"] <= r["n_tok"]


def test_entropy_bounds(spark, sf_dir):
    """0 ≤ H ≤ log2(n_distinct) (uniform-distribution maximum), and the
    fixture's word-salad docs are not degenerate single-token streams."""
    rows = llm_token_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy"] <= math.log2(r["n_distinct"]) + 1e-9
    assert any(r["entropy"] > 1.0 for r in rows)


def test_unigram_lm_scores_negative_and_token_consistent(spark, sf_dir):
    """log10 p < 0 for every token ⇒ strictly negative sums; token counts
    agree with the entropy operator's per-doc totals (same tokenizer)."""
    lm = {r["doc_id"]: r for r in llm_unigram_lm(spark, sf_dir).collect()}
    ent = {
        r["doc_id"]: r for r in llm_token_entropy(spark, sf_dir).collect()
    }
    assert set(lm) == set(ent)
    for d, r in lm.items():
        assert r["logp_sum_1e6"] < 0
        assert r["n_tok"] == ent[d]["n_tok"]


def test_cdc_chunk_arithmetic(spark, sf_dir):
    """chunks = boundaries + 1; shingle count = n_tok - (W-1); boundary
    rate over the corpus is near the designed 1/8 (md5 nibble ∈ {0,1})."""
    rows = llm_cdc_chunks(spark, sf_dir).collect()
    ent = {
        r["doc_id"]: r for r in llm_token_entropy(spark, sf_dir).collect()
    }
    assert rows
    tot_sh = tot_b = 0
    for r in rows:
        assert r["n_chunks"] == r["n_bounds"] + 1
        assert r["n_shingles"] == ent[r["doc_id"]]["n_tok"] - (CDC_W - 1)
        tot_sh += r["n_shingles"]
        tot_b += r["n_bounds"]
    rate = tot_b / tot_sh
    assert 0.08 <= rate <= 0.17, f"boundary rate {rate} far from 1/8"


def test_cdc_boundaries_are_edit_local(spark, sf_dir):
    """The CDC property itself: two docs sharing a long suffix produce the
    same boundary decisions inside the shared region (shingle hashes are a
    pure function of shingle content — checked via the registered op on a
    synthetic two-doc frame)."""
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    edited = "PREFIX " + base
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    sh = df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1), F.size(F.split("text", " ")) - (CDC_W - 1)
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split("text", " "), i, CDC_W)
                ),
            )
        ).alias("pos", "s"),
    ).withColumn(
        "bound",
        F.substring(F.md5(F.col("s").cast("binary")), 1, 1).isin("0", "1"),
    )
    a = [
        (r["s"], r["bound"])
        for r in sh.where("doc_id = 1").orderBy("pos").collect()
    ]
    b = [
        (r["s"], r["bound"])
        for r in sh.where("doc_id = 2").orderBy("pos").collect()
    ]
    # Every shingle fully inside the shared suffix decides identically.
    assert b[1:] == a


def test_norm_stats_ordering(spark, sf_dir):
    """min ≤ mean ≤ max per label; every fixture label present."""
    rows = llm_embed_norm_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        mean = r["sum_norm_1e6"] / r["n_vecs"]
        assert r["min_norm_1e6"] <= mean <= r["max_norm_1e6"]
        assert r["min_norm_1e6"] > 0  # no zero vectors in the fixture


def test_grouping_sets_reaggregate(spark, sf_dir):
    """Finest level re-sums to the per-status level, which re-sums to the
    grand total; gid discriminates the three levels."""
    rows = rel_grouping_sets(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[3]) == 1  # one grand-total row
    fine_n = sum(r["n_orders"] for r in by_gid[0])
    mid_n = sum(r["n_orders"] for r in by_gid[1])
    assert fine_n == mid_n == by_gid[3][0]["n_orders"]


def test_q6_selects_strict_subset(spark, sf_dir):
    """The multi-predicate filter keeps a nonzero strict subset and
    revenue is positive."""
    from scala_reactivex_spark.sources.catalog import table

    r = rel_q6_forecast(spark, sf_dir).collect()[0]
    total = table(spark, sf_dir, "lineitem").count()
    assert 0 < r["n_rows"] < total
    assert r["revenue"] > 0


def test_tfidf_topk_laws(spark, sf_dir):
    """≤ k terms per doc, ranked by (score desc, term asc); every scored
    term actually occurs in its doc (tf ≥ 1, df ≥ 1); a corpus-universal
    term (df = N) scores exactly 0."""
    from scala_reactivex_spark.operators.llm_signals import (
        TFIDF_TOPK,
        llm_tfidf,
    )
    from scala_reactivex_spark.sources.catalog import table as _t

    rows = llm_tfidf(spark, sf_dir).collect()
    n_docs = _t(spark, sf_dir, "documents").count()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert r["tf"] >= 1 and 1 <= r["df"] <= n_docs
        if r["df"] == n_docs:
            assert r["tfidf_1e4"] == 0
    for rs in by_doc.values():
        assert 1 <= len(rs) <= TFIDF_TOPK
        rs.sort(key=lambda r: r["rnk"])
        keys = [(-r["tfidf_1e4"], r["tok"]) for r in rs]
        assert keys == sorted(keys)


def test_embed_centroid_bounds(spark, sf_dir):
    """One cell per (label, pos) over the full 64-dim grid; min ≤ centroid
    ≤ max; n_vecs is constant across positions within a label."""
    from scala_reactivex_spark.operators.llm_signals import (
        llm_embed_centroid,
    )

    rows = llm_embed_centroid(spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
        assert r["min_1e6"] <= r["centroid_1e6"] <= r["max_1e6"]
    for rs in by_label.values():
        assert sorted(r["pos"] for r in rs) == list(range(64))
        assert len({r["n_vecs"] for r in rs}) == 1


def test_domain_mix_shares_sum(spark, sf_dir):
    """Cell counts re-sum to corpus totals; integer shares are proper
    ratios whose sum lands within floor-loss of 10000."""
    from scala_reactivex_spark.operators.llm_signals import llm_domain_mix

    rows = llm_domain_mix(spark, sf_dir).collect()
    n_cells = len(rows)
    assert n_cells >= 2
    doc_sum = sum(r["doc_share_1e4"] for r in rows)
    tok_sum = sum(r["tok_share_1e4"] for r in rows)
    assert 10000 - n_cells <= doc_sum <= 10000
    assert 10000 - n_cells <= tok_sum <= 10000


def test_winnowing_guarantee(spark, sf_dir):
    """Winnowing's coverage law on the fixture: selection density is near
    2/(w+1); every window contributes (n_windows = n_shingles - w + 1);
    and two docs sharing a ≥ (w+k-1)-token run share a fingerprint —
    checked on a synthetic pair through the same expressions."""
    from pyspark.sql import functions as F

    from scala_reactivex_spark.operators.llm_signals import (
        WINNOW_K,
        WINNOW_W,
        llm_winnowing,
    )

    rows = llm_winnowing(spark, sf_dir).collect()
    assert rows
    tot_fp = sum(r["n_fp"] for r in rows)
    tot_sh = sum(r["n_shingles"] for r in rows)
    dens = tot_fp / tot_sh
    # theory: expected density 2/(w+1) = 1/3 for w=5; allow fixture slack
    assert 0.15 <= dens <= 0.55, dens
    for r in rows:
        assert r["n_windows"] == r["n_shingles"] - (WINNOW_W - 1)
        assert 1 <= r["n_fp"] <= r["n_windows"]
        assert r["min_fp"] <= r["max_fp"]

    # The guarantee itself, on a synthetic pair sharing a ≥(w+k-1)-token
    # run, recomputed through the same expressions as the operator.
    shared = "one two three four five six seven eight nine ten"
    two = [(1, "PREFIX " + shared), (2, shared + " SUFFIX")]
    fdf = (
        spark.createDataFrame(two, "doc_id long, text string")
        .select("doc_id", F.split("text", " ").alias("words"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.size("words") - (WINNOW_K - 1)),
                lambda i: F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", F.slice(F.col("words"), i, WINNOW_K)
                        ).cast("binary")
                    ),
                    1,
                    16,
                ),
            ).alias("fps"),
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(1), F.size("fps") - (WINNOW_W - 1)),
                lambda j: F.array_min(F.slice(F.col("fps"), j, WINNOW_W)),
            ).alias("wins"),
        )
        .collect()
    )
    sets = {r["doc_id"]: set(r["wins"]) for r in fdf}
    assert sets[1] & sets[2], "shared run must share a fingerprint"


def test_q18_threshold_law(spark, sf_dir):
    """Every returned order's quantity exceeds the threshold, and the
    result covers exactly the qualifying orderkeys."""
    from pyspark.sql import functions as F

    from scala_reactivex_spark.functions.determinism import dsum
    from scala_reactivex_spark.operators.relational import (
        Q18_MIN_QTY,
        rel_q18_large_orders,
    )
    from scala_reactivex_spark.sources.catalog import table as _t

    rows = rel_q18_large_orders(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["total_qty"] > Q18_MIN_QTY
    want = {
        r["l_orderkey"]
        for r in _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("q"))
        .where(F.col("q") > Q18_MIN_QTY)
        .collect()
    }
    assert {r["o_orderkey"] for r in rows} == want


def test_backoff_lm_bounds_vs_bigram(spark, sf_dir):
    """Interpolated probabilities obey (a) p <= 1 so pinned scores are
    non-positive, and (b) p_int >= p_bi/2 so the interpolated score can
    trail the pure-bigram score by at most log10(2) per pair (plus 1
    micro-unit floor slack per term)."""
    from scala_reactivex_spark.operators.llm_signals import (
        llm_backoff_lm,
        llm_bigram_lm,
    )

    bi = {r["doc_id"]: r for r in llm_bigram_lm(spark, sf_dir).collect()}
    it = {r["doc_id"]: r for r in llm_backoff_lm(spark, sf_dir).collect()}
    assert set(bi) == set(it)
    half_log = 301030  # 1e6 * log10(2), ceil
    for d, r in it.items():
        assert r["logp_sum_1e6"] <= 0
        assert r["n_bigram"] == bi[d]["n_bigram"]
        slack = r["n_bigram"] * (half_log + 2)
        assert r["logp_sum_1e6"] >= bi[d]["logp_sum_1e6"] - slack


def test_count_min_never_undercounts(spark, sf_dir):
    """The CM guarantee: estimates NEVER undercount (hard law), and
    the 2N/W bound holds for the overwhelming majority of head terms
    (collisions are probabilistic — one all-rows collision between two
    heavy terms is legitimate sketch behavior, surfaced as data)."""
    from scala_reactivex_spark.operators.llm_signals import (
        CM_TOPK,
        llm_count_min,
    )

    rows = llm_count_min(spark, sf_dir).collect()
    assert len(rows) == min(
        CM_TOPK,
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("explode(split(text, ' ')) AS t")
        .select("t")
        .distinct()
        .count(),
    )
    for r in rows:
        assert r["overcount"] >= 0
        assert r["est_n"] == r["exact_n"] + r["overcount"]
    ok = sum(r["bound_ok"] for r in rows)
    assert ok >= len(rows) * 8 // 10


def test_watermark_z_arithmetic(spark, sf_dir):
    """z must be arithmetically consistent with (g, n), the green count
    bounded by the token count, and the flag consistent with the
    threshold; an unwatermarked corpus should not flag everything."""
    import math

    from scala_reactivex_spark.operators.llm_signals import (
        WM_Z_FLAG_1E4,
        llm_watermark_detect,
    )

    rows = llm_watermark_detect(spark, sf_dir).collect()
    assert rows
    flagged = 0
    for r in rows:
        assert 0 <= r["n_green"] <= r["n_tok"]
        z = math.floor(
            (2 * r["n_green"] - r["n_tok"])
            / math.sqrt(r["n_tok"]) * 10000 + 0.5
        )
        assert r["z_1e4"] == z
        assert r["flagged"] == int(z > WM_Z_FLAG_1E4)
        flagged += r["flagged"]
    assert flagged < len(rows) // 2


def test_bpb_plausible_and_consistent(spark, sf_dir):
    """bpb must be positive (a real LM never compresses to zero bits),
    bounded by a generous ceiling for a 31-token corpus, and byte
    totals must partition the corpus."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.llm_signals import llm_bpb
    from scala_reactivex_spark.sources.catalog import table

    rows = llm_bpb(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["bpb_1e4"] < 50000  # < 5 bits/byte
    tot = (
        table(spark, sf_dir, "documents")
        .agg(F.sum("n_chars"))
        .collect()[0][0]
    )
    assert sum(r["n_bytes"] for r in rows) == tot


def test_hll_portable_accuracy_and_merge_property(spark, sf_dir):
    """The portable HLL must land within the asserted ±25% band (the
    theoretical σ is 1.04/√64 ≈ 13%), and register maxima must be
    mergeable: the sketch of the corpus equals the max-merge of two
    half-corpus sketches."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.functions.portable_hash import (
        kr31_spark_expr,
    )
    from scala_reactivex_spark.operators.llm_signals import (
        HLL_M,
        llm_hll_portable,
    )

    r = llm_hll_portable(spark, sf_dir).collect()[0]
    assert r["band_ok"] == 1
    assert abs(r["est"] - r["n_exact"]) * 4 <= r["n_exact"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def regs(df):
        h = df.select(F.expr(kr31_spark_expr("text")).alias("hv")).distinct()
        out = {}
        for row in h.select(
            (F.col("hv") % HLL_M).alias("reg"),
            F.expr(
                f"CASE WHEN hv DIV {HLL_M} = 0 THEN 26"
                f" ELSE 26 - length(bin(hv DIV {HLL_M})) END"
            ).alias("rho"),
        ).collect():
            out[row["reg"]] = max(out.get(row["reg"], 0), row["rho"])
        return out

    whole = regs(docs)
    a = regs(docs.where("doc_id % 2 = 0"))
    b = regs(docs.where("doc_id % 2 = 1"))
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == whole
