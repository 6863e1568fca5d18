"""Scale-machinery laws: salting preserves results exactly (SCALING.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_reactivex_spark.functions.scale import salted_sum
from scala_reactivex_spark.operators.stateful import op_reduce
from scala_reactivex_spark.sources.catalog import table


def test_salted_sum_equals_direct(spark, sf_dir):
    """Two-level salted aggregation == direct aggregation, bit-exact
    (decimal partials are associative) — for several salt widths."""
    ev = table(spark, sf_dir, "events")
    direct = op_reduce(spark, sf_dir)  # user_id, total_value, n_events
    for n_salts in (1, 4, 32):
        salted = salted_sum(ev, "user_id", "value", n_salts=n_salts)
        assert salted.count() == direct.count()
        assert (
            salted.exceptAll(
                direct.select("user_id", "total_value", "n_events")
            ).count()
            == 0
        ), f"salted({n_salts}) diverged from direct aggregation"


def test_salted_sum_spreads_hot_key(spark, sf_dir):
    """The level-1 aggregate really splits a key into multiple groups."""
    ev = table(spark, sf_dir, "events")
    one_user = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    partials = (
        ev.where(F.col("user_id") == one_user.user_id)
        .groupBy((F.col("event_id") % 16).alias("salt"))
        .count()
    )
    assert partials.count() > 1
