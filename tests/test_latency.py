"""Serving-latency measurement smoke: the bench's twin-latency map has
an entry per measured serving twin (five pinned + the round-14
stateless pair) with a real trigger→commit number."""

from __future__ import annotations

EXPECTED = {
    "twin_ann_ivf",
    "twin_ann_pq",
    "twin_bm25",
    "twin_hybrid_rrf",
    "twin_dedup_gate",
    # round 14: stateless model-pack twins, measured but NEVER part of
    # the frozen TWIN_BASELINE ratio (bench.py iterates pin keys only)
    "twin_nb_filter",
    "twin_zorder_route",
    # round 15 (r14 verdict #2): the third round-14 twin measured too,
    # plus the round-15 compaction ingest router
    "twin_novelty_gate",
    "twin_compaction_route",
}


def test_measure_serving_latency_covers_default_set(spark, sf_dir, tmp_path):
    from scala_reactivex_spark.streaming.latency import (
        measure_serving_latency,
    )

    res = measure_serving_latency(
        spark, sf_dir, str(tmp_path / "lat"), reps=1
    )
    assert set(res) == EXPECTED
    for name, row in res.items():
        assert row["cold_sec"] > 0, name
        # The probe sources are written as 2 files with
        # maxFilesPerTrigger=1, so every twin drains in (at least) two
        # micro-batches — and the listener settle loop must count BOTH
        # (detaching after the first progress event was the r9 bug).
        assert row["batches"] >= 2, name
        # reps=1 records no warm stats by design — drain time is the
        # measured number; the listener still proves ≥1 batch ran.
