"""widen_scan / _est_scan_partitions (round 18 — r17 ADVICE: the
widening trigger is now a file-metadata estimate, not a planning pass).

The estimate must reproduce the old ``df.rdd.getNumPartitions()``
probe's DECISION (widen iff the scan is narrower than the session's
parallelism) on the fixture tables, and fail safe (no widening) when
file sizes are unavailable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_reactivex_spark.sources.catalog import (
    _est_scan_partitions,
    _size_conf_bytes,
    table,
    widen_scan,
)


def test_size_conf_parsing(spark):
    assert _size_conf_bytes(spark, "no.such.key", 42) == 42
    spark.conf.set("x.test.size", "128MB")
    assert _size_conf_bytes(spark, "x.test.size", 0) == 128 * 1024 * 1024
    spark.conf.set("x.test.size", "4194304b")
    assert _size_conf_bytes(spark, "x.test.size", 0) == 4 * 1024 * 1024
    spark.conf.set("x.test.size", "1g")
    assert _size_conf_bytes(spark, "x.test.size", 0) == 1 << 30


def test_estimate_matches_probe_decision(spark, sf_dir):
    """The metadata estimate and the old planning probe must agree on
    the widen/no-widen decision for every fixture table at the test SF
    (all are small single files here — both must say 'narrower than
    the session parallelism')."""
    target = spark.sparkContext.defaultParallelism
    for name in ("documents", "events", "lineitem"):
        df = table(spark, sf_dir, name)
        est = _est_scan_partitions(df, spark, target)
        actual = df.rdd.getNumPartitions()
        assert est is not None
        assert (est < target) == (actual < target), (name, est, actual)


def test_widen_scan_widens_fixture_scan(spark, sf_dir):
    df = table(spark, sf_dir, "documents").select("doc_id")
    widened = widen_scan(df, spark)
    assert (
        widened.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # Row-level content is untouched.
    assert widened.count() == df.count()
    assert (
        widened.agg(F.sum("doc_id")).first()[0]
        == df.agg(F.sum("doc_id")).first()[0]
    )


def test_est_none_means_no_widening(spark, sf_dir):
    """Frames that are not file scans (inputFiles() empty) estimate to
    None, and widen_scan leaves them untouched — widening is a
    file-scan fixup only."""
    df = spark.range(10)
    assert _est_scan_partitions(df, spark, 4) is None
    assert widen_scan(df, spark) is df
