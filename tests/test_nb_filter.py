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
