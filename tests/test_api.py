"""Fluent API equivalence: EventStream chains must produce EXACTLY the
frames of the registered (oracle-verified) queries they mirror — the veneer
adds ergonomics, never new semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_reactivex_spark.api import EventStream
from scala_reactivex_spark.operators import stateful, windows
from scala_reactivex_spark.sources.catalog import table


def _stream(spark, sf_dir) -> EventStream:
    return EventStream(table(spark, sf_dir, "events"))


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_scan_chain_equals_registered_query(spark, sf_dir):
    got = (
        _stream(spark, sf_dir)
        .scan_sum("value")
        .to_df()
        .select("user_id", "event_id", "ms", "running_sum")
    )
    want = stateful.op_scan_running_sum(spark, sf_dir)
    assert _same(got, want)


def test_take_skip_partition_stream(spark, sf_dir):
    s = _stream(spark, sf_dir)
    n_take = s.take(5).to_df().count()
    n_skip = s.skip(5).to_df().count()
    assert n_take + n_skip == s.to_df().count()
    assert _same(
        s.take(5).to_df().select("user_id", "event_id", "ms", "event_type"),
        stateful.op_take(spark, sf_dir),
    )


def test_debounce_chain_equals_registered_query(spark, sf_dir):
    got = (
        _stream(spark, sf_dir)
        .debounce(2 * 3_600 * 10**9)
        .to_df()
        .select(
            "user_id",
            "event_id",
            "ms",
            "event_type",
            F.round("value", 4).alias("value_r"),
        )
    )
    want = windows.op_debounce(spark, sf_dir)
    assert _same(got, want)


def test_filter_scan_reduce_composition(spark, sf_dir):
    """A real chain: filter → scan → reduce, checked against a direct
    aggregation of the same filtered stream."""
    s = _stream(spark, sf_dir).filter("event_type = 'purchase'")
    red = s.reduce_sum("value")
    direct = (
        table(spark, sf_dir, "events")
        .where("event_type = 'purchase'")
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 4
            ).alias("total_value"),
            F.count("*").alias("n"),
        )
    )
    assert _same(red, direct)
    # and scan's last element per user == the reduce total (Rx law)
    from pyspark.sql import Window

    scanned = s.scan_sum("value").to_df()
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        scanned.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .select("user_id", F.col("running_sum").alias("total_value"))
    )
    assert _same(last, red.select("user_id", "total_value"))


def test_merge_and_take_until_chain(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    purchases = EventStream(ev.where("event_type = 'purchase'"))
    clicks = EventStream(ev.where("event_type = 'click'"))
    signups = EventStream(ev.where("event_type = 'signup'"))
    merged = purchases.merge(clicks)
    assert merged.to_df().count() == (
        purchases.to_df().count() + clicks.to_df().count()
    )
    until = purchases.take_until(signups).to_df()
    from scala_reactivex_spark.operators.combinators import op_take_until

    want = op_take_until(spark, sf_dir)
    got = until.select(
        "user_id", "event_id", "ms", F.round("value", 4).alias("value_r")
    )
    assert _same(got, want)


def test_with_latest_from_chain(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    purchases = EventStream(ev.where("event_type = 'purchase'"))
    clicks = EventStream(ev.where("event_type = 'click'"))
    got = (
        purchases.with_latest_from(clicks, "value", "latest_click")
        .to_df()
        .select(
            "user_id",
            "event_id",
            "ms",
            F.round("value", 4).alias("purchase_value"),
            F.round("latest_click", 4).alias("latest_click"),
        )
    )
    from scala_reactivex_spark.operators.combinators import (
        op_with_latest_from,
    )

    want = op_with_latest_from(spark, sf_dir)
    assert _same(got, want)


def test_with_latest_from_heterogeneous_column_names(spark, sf_dir):
    """Regression: the other stream may use different key/time/seq column
    names — with_latest_from must map through other's own columns."""
    ev = table(spark, sf_dir, "events")
    purchases = EventStream(ev.where("event_type = 'purchase'"))
    clicks_renamed = EventStream(
        ev.where("event_type = 'click'").selectExpr(
            "user_id AS uid", "ts AS ts2", "event_id AS seq", "value AS v"
        ),
        key="uid",
        ts_col="ts2",
        seq_col="seq",
    )
    got = (
        purchases.with_latest_from(clicks_renamed, "v", "latest_click")
        .to_df()
        .select(
            "user_id",
            "event_id",
            "ms",
            F.round("value", 4).alias("purchase_value"),
            F.round("latest_click", 4).alias("latest_click"),
        )
    )
    from scala_reactivex_spark.operators.combinators import (
        op_with_latest_from,
    )

    assert _same(got, op_with_latest_from(spark, sf_dir))


def test_share_caches_and_computes_once(spark, sf_dir):
    """share() must multicast: one upstream materialization feeds every
    downstream action (SURVEY §2.7 publish/share). Evidence: the wrapped
    frame reports a real storage level, downstream plans read an
    InMemoryRelation, and results equal the unshared chain."""
    src = EventStream.from_parquet(spark, f"{sf_dir}/events.parquet")
    plain = src.filter("event_type = 'purchase'").scan_sum("value")
    shared = src.filter("event_type = 'purchase'").scan_sum("value").share()
    try:
        lvl = shared.to_df().storageLevel
        assert lvl.useMemory or lvl.useDisk
        downstream = shared.filter("running_sum > 100").to_df()
        plan = downstream._jdf.queryExecution().optimizedPlan().toString()
        assert "InMemoryRelation" in plan
        assert _same(
            shared.to_df(), plain.to_df()
        )
    finally:
        shared.unpersist()


def test_replay_honors_storage_level(spark, sf_dir):
    src = EventStream.from_parquet(spark, f"{sf_dir}/events.parquet")
    replayed = src.filter("event_type = 'click'").replay("DISK_ONLY")
    try:
        replayed.to_df().count()  # connect
        lvl = replayed.to_df().storageLevel
        assert lvl.useDisk and not lvl.useMemory
    finally:
        replayed.unpersist()


def test_register_views_sql_surface(spark, sf_dir):
    """Raw spark.sql over the registered views works, matches the
    DataFrame path, and keeps pushdown/pruning through the view."""
    from scala_reactivex_spark.sources.catalog import register_views, table
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    got = spark.sql(
        "SELECT event_type, count(*) AS n FROM events "
        "WHERE value > 100 GROUP BY event_type"
    )
    want = {
        (r["event_type"], r["n"])
        for r in table(spark, sf_dir, "events")
        .where(F.col("value") > 100)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {(r["event_type"], r["n"]) for r in got.collect()} == want
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(value,100.0)" in plan
