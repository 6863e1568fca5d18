"""llm_nb_filter law: the keep rate IS a calibration-table function.

The r13 verdict #7 acceptance: the filter's keep/drop decisions must tie
exactly to llm_nb_margin_calibration's artifact — threshold = lowest band
whose held-out accuracy clears NB_FILTER_TARGET_1E4, kept docs = exactly
the calibration rows at or above it.  Both frames build from the shared
_nb_doc_margins recipe, so a drift here means the composition forked.
"""

from __future__ import annotations

from scala_reactivex_spark.operators.llm_text import (
    NB_CAL_BANDS,
    NB_FILTER_TARGET_1E4,
    llm_nb_filter,
    llm_nb_margin_calibration,
)


def test_keep_rate_equals_calibration_mass_above_threshold(spark, sf_dir):
    cal = {
        r["band"]: (r["n_docs"], r["acc_1e4"])
        for r in llm_nb_margin_calibration(spark, sf_dir).collect()
    }
    thr = min(
        (b for b, (_, acc) in cal.items() if acc >= NB_FILTER_TARGET_1E4),
        default=NB_CAL_BANDS,
    )
    rows = llm_nb_filter(spark, sf_dir).collect()
    # The filter's published threshold is the calibration-derived one.
    assert {r["thr_band"] for r in rows} == {thr}
    # Decision column semantics: kept ⟺ band >= threshold.
    assert all((r["band"] >= thr) == bool(r["kept"]) for r in rows)
    # Keep COUNT equals the calibration table's mass at/above threshold —
    # the law that lets an operator read the production keep rate off
    # the calibration artifact before running the filter.
    want_kept = sum(n for b, (n, _) in cal.items() if b >= thr)
    assert sum(r["kept"] for r in rows) == want_kept
    # And the filter covers every calibrated doc exactly once.
    assert len(rows) == sum(n for n, _ in cal.values())


def test_novelty_mass_law(spark, sf_dir):
    """Conservation law: summing n_novel over all docs counts each
    df=1 gram exactly once (a gram unique to one doc is novel in that
    doc and in no other), so the per-doc report and the corpus gram
    table cannot drift apart."""
    from scala_reactivex_spark.operators.llm_signals import (
        doc_grams,
        llm_ngram_novelty,
    )
    from scala_reactivex_spark.sources.catalog import table
    from pyspark.sql import functions as F

    rows = llm_ngram_novelty(spark, sf_dir).collect()
    g = doc_grams(table(spark, sf_dir, "documents"))
    n_unique = (
        g.groupBy("gram")
        .count()
        .where(F.col("count") == 1)
        .count()
    )
    assert sum(r["n_novel"] for r in rows) == n_unique
    # Distinct grams per doc sum to the gram frame's row count.
    assert sum(r["n_grams"] for r in rows) == g.count()


def test_diverse_select_is_the_per_cluster_quality_top_k(spark, sf_dir):
    """llm_diverse_select's two-phase top-k must equal the brute-force
    per-cluster top-CAP by (pinned quality DESC, doc_id): the cap
    binds per cluster, ranks are 1..k dense, and no selected doc is
    beaten by an unselected doc of the same cluster."""
    from scala_reactivex_spark.operators.llm_compose import (
        DIVERSE_CAP,
        llm_diverse_select,
    )

    rows = llm_diverse_select(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert len(members) <= DIVERSE_CAP, cid
        ranks = sorted(m["rnk"] for m in members)
        assert ranks == list(range(1, len(members) + 1)), cid
        # Rank order agrees with the (quality DESC, doc_id) key.
        ordered = sorted(members, key=lambda m: (-m["q_1e4"], m["doc_id"]))
        assert [m["rnk"] for m in ordered] == ranks, cid
