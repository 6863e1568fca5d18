"""Serving-latency measurement smoke: the bench's twin-latency map has
an entry per measured serving twin (the shared DEFAULT_TWINS list)
with a real trigger→commit number."""

from __future__ import annotations

from scala_reactivex_spark.streaming.latency import DEFAULT_TWINS

EXPECTED = set(DEFAULT_TWINS)


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
