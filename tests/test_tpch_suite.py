"""Semantic invariants for the round-6 TPC-H shapes (tpch_suite.py).

The oracle gate (scripts/verify_local.py / the driver) proves value
equality vs DuckDB at sf0.01; these tests pin the SEMANTICS each shape is
supposed to have, at sf0.001, so a refactor that stays hash-consistent but
breaks the query's meaning still fails fast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from scala_reactivex_spark.operators import tpch_suite as T
from scala_reactivex_spark.sources.catalog import table


def test_q2_rows_attain_their_parts_minimum(spark, sf_dir):
    """Every emitted (part, supplier) offer equals the min offer for that
    part — and no part appears with two different costs."""
    rows = T.rel_q2_mincost(spark, sf_dir).collect()
    by_part: dict[int, set[int]] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.cost_micro)
    assert rows, "size 10-20 STANDARD parts exist at sf0.001"
    assert all(len(costs) == 1 for costs in by_part.values())


def test_q11_threshold_is_2p5x_mean_part_value(spark, sf_dir):
    df = T.rel_q11_important(spark, sf_dir)
    rows = df.collect()
    # recompute total and part count from the unfiltered aggregate
    li = table(spark, sf_dir, "lineitem")
    asia = T._in_region(spark, sf_dir, "ASIA").select("s_suppkey")
    per_part = (
        li.join(asia, li.l_suppkey == asia.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr("l_extendedprice * (1 - l_discount)").cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("val")
        )
        .agg(F.sum("val").alias("total"), F.count("*").alias("n"))
        .collect()[0]
    )
    threshold = per_part.total * 2.5 / per_part.n
    assert all(r.part_value > threshold * 0.999 for r in rows)


def test_q13_distribution_covers_every_customer(spark, sf_dir):
    rows = T.rel_q13_custdist(spark, sf_dir).collect()
    n_cust = table(spark, sf_dir, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust


def test_q13_includes_zero_or_low_count_bucket(spark, sf_dir):
    """LEFT-join semantics: the distribution domain starts at the true
    minimum order count (a customer with only 5-LOW orders lands in 0)."""
    rows = T.rel_q13_custdist(spark, sf_dir).collect()
    counts = {r.c_count for r in rows}
    assert min(counts) >= 0
    assert len(counts) > 1


def test_q16_excludes_negative_balance_suppliers(spark, sf_dir):
    """No excluded supplier may contribute: rerunning with the anti-join
    disabled must give ≥ the filtered counts, and the filtered result must
    not count suppliers with negative balance."""
    df = T.rel_q16_suppcnt(spark, sf_dir)
    bad = {
        r.s_suppkey
        for r in table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .collect()
    }
    # direct recount over the raw join for one output group
    first = df.orderBy("p_brand", "p_type", "p_size").first()
    if first is None:
        pytest.skip("no qualifying groups at this sf")
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supps = {
        r.l_suppkey
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .where(
            (F.col("p_brand") == first.p_brand)
            & (F.col("p_type") == first.p_type)
            & (F.col("p_size") == first.p_size)
        )
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert first.supplier_cnt == len(supps - bad)


def test_q21_late_supplier_is_unique_per_counted_order(spark, sf_dir):
    """numwait totals can only come from orders with exactly one distinct
    late supplier among ≥2 suppliers — recompute the qualifying order set
    directly and compare totals."""
    df = T.rel_q21_waiting(spark, sf_dir)
    total_wait = df.agg(F.sum("numwait")).collect()[0][0] or 0
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("ns"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("nl"),
        )
    )
    qualifying = per_order.where(
        (F.col("ns") > 1) & (F.col("nl") == 1)
    ).count()
    assert total_wait == qualifying


def test_q22_customers_have_no_recent_orders(spark, sf_dir):
    rows = T.rel_q22_inactive(spark, sf_dir).collect()
    # every counted customer must genuinely lack post-2000 orders: the
    # total customer count must equal a direct anti-join recount
    sel = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        (F.col("c_nationkey") % 10).cast("int").alias("cc"),
    ).where(F.col("cc").isin(0, 1, 3, 5, 7))
    avg_bal = (
        sel.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .collect()[0][0]
    )
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    direct = (
        sel.where(F.col("c_acctbal") > avg_bal)
        .join(recent, sel.c_custkey == recent.o_custkey, "left_anti")
        .count()
    )
    assert sum(r.numcust for r in rows) == pytest.approx(direct, abs=1)


def test_q12_buckets_partition_the_late_lines(spark, sf_dir):
    rows = T.rel_q12_shipclass(spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = table(spark, sf_dir, "orders")
    n_late = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == n_late


def test_q17_small_quantity_filter_is_strict_subset(spark, sf_dir):
    """Dropping the quantity predicate can only increase the line count."""
    strict = T.rel_q17_smallqty(spark, sf_dir).collect()[0]
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    all_lines = li.join(part, li.l_partkey == part.p_partkey).count()
    assert strict.n_lines <= all_lines
