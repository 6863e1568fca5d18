"""Relational substrate battery (SURVEY.md §2.9) — engine-native, T0/T2.

The reference is an operator library with no relational layer; these are the
idiomatic-Spark operators the engine is BUILT FROM, demonstrated on the
TPC-H-ish star schema (FIXTURES.md).  Every query is declarative DataFrame
API so Catalyst gets predicate pushdown, column pruning, join selection and
AQE for free (SURVEY.md §4); dimension joins carry explicit broadcast hints
where the small side is bounded by construction (region/nation/per-key
aggregates), and fact-fact joins stay shuffle hash/sort-merge on their keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import DEC, davg, dsum
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

Q1_CUTOFF = "1998-09-02"


@register(
    "rel_q1_pricing",
    tier="T0",
    doc="FLAGSHIP (entry()): TPC-H Q1-shaped pricing summary — scan + "
    "pushed filter + hash aggregate with map-side partials; decimal sums "
    "for cross-engine exactness.",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS sum_base_price,
       ROUND(CAST(SUM(CAST((l_extendedprice * (1 - l_discount))
           AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(((l_extendedprice * (1 - l_discount))
           * (1 + l_tax)) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(l_quantity), 4) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(l_extendedprice), 4) AS avg_price,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp")
    )
    disc_price = F.expr("l_extendedprice * (1 - l_discount)")
    charge = F.expr("(l_extendedprice * (1 - l_discount)) * (1 + l_tax)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price).alias("sum_disc_price"),
        dsum(charge).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "rel_join_inner",
    tier="T0",
    doc="Multi-way equi join up the star: orders⋈customer⋈nation⋈region with "
    "broadcast hints on the bounded dims; revenue per region.",
    oracle="""
SELECT r.r_name, count(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def rel_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@register(
    "rel_join_semi_anti",
    tier="T2",
    doc="Left semi / left anti joins: customers with vs without orders, as "
    "true LeftSemi/LeftAnti plan nodes (no row duplication, early-out probe).",
    oracle="""
SELECT 'with_orders' AS kind, count(*) AS n
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS kind, count(*) AS n
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def rel_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .agg(F.count("*").alias("n"))
        .select(F.lit("with_orders").alias("kind"), "n")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("without_orders").alias("kind"), "n")
    )
    return semi.unionByName(anti)


@register(
    "rel_join_range",
    tier="T2",
    doc="Equi + range (theta) join: lineitems shipped within 90 days of "
    "their order date — hash join on the equi key with a residual range "
    "predicate (never a cartesian).",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS total_price
FROM orders o
JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
GROUP BY o.o_orderpriority
""",
)
def rel_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )


@register(
    "rel_window_rank",
    tier="T2",
    doc="Ranking + frame-based analytic windows: top-3 orders per customer "
    "by price, with a 3-row moving average over order date.",
    oracle="""
WITH x AS (
  SELECT o_custkey, o_orderkey,
         ROUND(o_totalprice, 4) AS totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
         dense_rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS drnk,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
  FROM orders
)
SELECT o_custkey, o_orderkey, totalprice, rnk, drnk, moving_avg
FROM x WHERE rnk <= 3
""",
)
def rel_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_mov = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.rank().over(w_rank).alias("rnk"),
            F.dense_rank().over(w_rank).alias("drnk"),
            F.round(
                F.sum(F.col("o_totalprice").cast(DEC)).over(w_mov).cast("double")
                / F.count("*").over(w_mov),
                4,
            ).alias("moving_avg"),
        )
        .where(F.col("rnk") <= 3)
    )


@register(
    "rel_rollup",
    tier="T2",
    doc="Hierarchical grouping sets: ROLLUP(mktsegment, orderstatus) with an "
    "explicit grouping-bit id so both engines label subtotal rows identically.",
    oracle="""
SELECT COALESCE(c_mktsegment, 'ALL') AS mktsegment,
       COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       GROUPING(c_mktsegment) * 2 + GROUPING(o_orderstatus) AS gid,
       count(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
""",
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderstatus")
        .agg(
            (F.grouping("c_mktsegment") * 2 + F.grouping("o_orderstatus")).alias(
                "gid"
            ),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("mktsegment"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            "gid",
            "n_orders",
            "revenue",
        )
    )


@register(
    "rel_topk",
    tier="T2",
    doc="Global top-k with deterministic tie-break — Catalyst turns "
    "ORDER BY + LIMIT into TakeOrderedAndProject (per-partition top-k, no "
    "global sort).",
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def rel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 4).alias("totalprice"),
        )
    )


@register(
    "rel_setops",
    tier="T2",
    doc="UNION / INTERSECT / EXCEPT over customer key sets (open-order vs "
    "finished-order customers).",
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT 'union' AS op, count(*) AS n FROM (
    SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
UNION ALL
SELECT 'intersect' AS op, count(*) AS n FROM (
    SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
UNION ALL
SELECT 'except' AS op, count(*) AS n FROM (
    SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
""",
)
def rel_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    b = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    mk = lambda df, name: df.agg(F.count("*").alias("n")).select(  # noqa: E731
        F.lit(name).alias("op"), "n"
    )
    return (
        mk(a.union(b).distinct(), "union")
        .unionByName(mk(a.intersect(b), "intersect"))
        .unionByName(mk(a.exceptAll(b).distinct(), "except"))
    )


@register(
    "rel_agg_distinct",
    tier="T2",
    doc="Distinct aggregation: exact distinct customers per order status "
    "(two-phase distinct aggregate under the hood).",
    oracle="""
SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def rel_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_cust"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "rel_agg_approx",
    tier="T2",
    doc="Sketch aggregate: approx_count_distinct (HLL, rsd=0.02) per order "
    "status — the 100 TB path where exact distinct is too expensive. The "
    "raw estimate is engine-specific, so the HASHED output pins it to a "
    "deterministic error band instead: hll_within_3pct asserts the "
    "estimate lands within ±3% of the exact count (measured ≤1.7% on "
    "sf0.001–0.1), which a DuckDB oracle can replay as a constant — "
    "making the sketch's accuracy contract externally hash-graded.",
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
       CAST(count(*) AS BIGINT) AS n_orders,
       TRUE AS hll_within_3pct
FROM orders GROUP BY o_orderstatus
""",
)
def rel_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The sketch and the exact count run as SEPARATE aggregations: mixing
    # countDistinct with approx_count_distinct in one agg makes Catalyst's
    # distinct-rewrite evaluate the HLL partial per (status, custkey) group
    # — one sketch buffer per customer instead of per status
    # (~10× slower at sf0.1). Two thin scans + a per-status join of two
    # O(#groups) frames is the cheap shape; at 100 TB you'd run only the
    # sketch branch — the exact branch exists to grade its accuracy.
    orders = table(spark, sf_dir, "orders")
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_cust"),
        F.count("*").alias("n_orders"),
    )
    approx = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_cust"),
    )
    err = F.abs(
        F.col("approx_cust").cast("double") - F.col("exact_cust")
    ) / F.col("exact_cust")
    return exact.join(approx, "o_orderstatus").select(
        "o_orderstatus",
        "exact_cust",
        "n_orders",
        (err <= 0.03).alias("hll_within_3pct"),
    )


@register(
    "rel_agg_approx_pct",
    tier="T2",
    doc="Quantile-sketch aggregate: approx_percentile (KLL-family sketch, "
    "accuracy 10000) of line price per return flag — the 100 TB path "
    "where exact per-group sorted mass is too expensive. Like "
    "rel_agg_approx, the engine-specific sketch values are pinned to a "
    "deterministic accuracy contract: approx p50/p95 must land within "
    "±3% of the exact percentile_disc values (rank error ≤ n/10000 "
    "makes the value band loose by construction), which DuckDB replays "
    "as a constant. Exact branch exists only to grade the sketch.",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       quantile_disc(l_extendedprice, 0.50) AS exact_p50,
       quantile_disc(l_extendedprice, 0.95) AS exact_p95,
       TRUE AS approx_within_3pct
FROM lineitem GROUP BY l_returnflag
""",
)
def rel_agg_approx_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round-17 optimization, two steps (guide §2.4, §1.2-order-1).  First
    # the exact and approx branches were collapsed from two corpus scans
    # re-joined on l_returnflag into one groupBy.  Then the remaining
    # cost — two percentile_disc TypedImperativeAggregate buffers whose
    # per-row OpenHashMap update dominated the pass (isolated: the two
    # buffers alone 2.0 s of the 2.4 s warm time; approx sketch 0.5 s) —
    # was replaced by ONE collect_list buffer (per-row append, the cheap
    # update) sorted once per group, with both discrete percentiles read
    # off by index: percentile_disc(q) over n rows IS the ceil(q*n)-th
    # element (1-based) of the sorted multiset — #\{x ≤ s[k]\} ≥ k ≥ q·n
    # and any v < s[k] has #\{x ≤ v\} ≤ k−1 < q·n.  Fuzz-proven
    # bit-identical to percentile_disc on 60 grouped cases × 7 quantiles
    # (sizes 1..1001, heavy duplicates) and on the fixture at all three
    # SFs.  Memory shape is unchanged — the old percentile map held every
    # distinct value (583k of 600k at sf0.1), the list holds every value;
    # both are the declared exact-baseline O(group) state the doc scopes
    # to grading the sketch (at 100 TB only the sketch branch runs).
    # Isolated warm 2.4-3.4 s → 0.8-1.3 s.
    #
    # Bound note (r17 ADVICE): "unchanged" holds only while values are
    # near-distinct, as on this fixture.  In general percentile_disc's
    # buffer is O(distinct values) (bounded by the price domain) while
    # collect_list is O(rows): around sf100 a single returnflag group
    # (~300M rows ≈ 2.4 GB of doubles) would hit Spark's 2 GB
    # single-array limit where the old map survived.  The exact branch
    # is graded at fixture scales only (the sketch IS the scale path);
    # if an exact branch ever had to survive large SFs, compute the two
    # percentiles via two narrow sort+row_number passes (O(1) aggregate
    # state) instead.
    li = table(spark, sf_dir, "lineitem")
    both = li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.array_sort(F.collect_list("l_extendedprice")).alias("arr"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("ap"),
    )
    disc = lambda q: F.element_at(  # noqa: E731
        "arr", F.ceil(F.lit(q) * F.col("n_lines")).cast("int")
    )
    both = both.withColumn("exact_p50", disc(0.50)).withColumn(
        "exact_p95", disc(0.95)
    )
    within = (
        F.abs(F.col("ap")[0] - F.col("exact_p50")) / F.col("exact_p50")
        <= 0.03
    ) & (
        F.abs(F.col("ap")[1] - F.col("exact_p95")) / F.col("exact_p95")
        <= 0.03
    )
    return both.select(
        "l_returnflag",
        "n_lines",
        "exact_p50",
        "exact_p95",
        within.alias("approx_within_3pct"),
    )


@register(
    "rel_scalar_battery",
    tier="T2",
    doc="Scalar function battery in one projection: string (upper/substr/"
    "concat/like/regexp), date (year/month/day/datediff), math (abs/mod/"
    "product), JSON extraction — all JVM builtins inside codegen.",
    oracle="""
SELECT event_id,
       upper(event_type) AS etype_u,
       substr(event_type, 1, 3) AS etype_3,
       event_type || '_' || CAST(user_id AS VARCHAR) AS label,
       event_type LIKE 'p%' AS is_p,
       regexp_extract(props, '([0-9]+)', 1) AS k_str,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       year(ts) AS yr, month(ts) AS mo, day(ts) AS dom,
       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
       ROUND(abs(value - 100), 4) AS v_abs,
       ROUND(value * value, 4) AS v_sq,
       event_id % 7 AS id_mod
FROM events
""",
)
def rel_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.upper("event_type").alias("etype_u"),
        F.substring("event_type", 1, 3).alias("etype_3"),
        F.concat_ws("_", "event_type", F.col("user_id").cast("string")).alias(
            "label"
        ),
        F.col("event_type").like("p%").alias("is_p"),
        F.regexp_extract("props", r"([0-9]+)", 1).alias("k_str"),
        F.expr("try_cast(get_json_object(props, '$.k') AS INT)").alias("k_int"),
        F.year("tsm").alias("yr"),
        F.month("tsm").alias("mo"),
        F.dayofmonth("tsm").alias("dom"),
        F.datediff(F.to_date("tsm"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        F.round(F.abs(F.col("value") - 100), 4).alias("v_abs"),
        F.round(F.col("value") * F.col("value"), 4).alias("v_sq"),
        (F.col("event_id") % 7).alias("id_mod"),
    )


@register(
    "op_udf_textlen",
    tier="T2",
    doc="Pandas-UDF surface (Arrow-batched, the ONLY sanctioned Python "
    "path): char length + whitespace token count per document, verified "
    "against the fixture's stored n_chars ground truth.",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_udf,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       length(text) = n_chars AS matches_meta
FROM documents
""",
)
def op_udf_textlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Nullable Int64 (not int64): a null text yields <NA>, which Arrow
    # hands back to Spark as SQL NULL — mirroring the oracle's
    # length(NULL) = NULL instead of crashing the task on the NaN cast.
    @F.pandas_udf("long")
    def char_len(s: pd.Series) -> pd.Series:
        return s.str.len().astype("Int64")

    @F.pandas_udf("long")
    def tok_count(s: pd.Series) -> pd.Series:
        return s.str.split(" ").str.len().astype("Int64")

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        char_len("text").alias("n_chars_udf"),
        tok_count("text").alias("n_tokens"),
        (char_len("text") == F.col("n_chars")).alias("matches_meta"),
    )


@register(
    "rel_subquery_corr",
    tier="T2",
    doc="Correlated scalar subquery: orders beating 1.5x their customer's "
    "average — Catalyst decorrelates into an aggregate + join "
    "(SURVEY.md §4 'subquery decorrelation'), no per-row re-execution.",
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS totalprice
FROM orders o
WHERE o_totalprice > (
    SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey)
""",
)
def rel_subquery_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    # View name keyed by sf_dir: a fixed global name would silently rebind
    # under a still-lazy DataFrame from an earlier call with another sf_dir.
    view = "_orders_sq_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS totalprice
        FROM {view} o
        WHERE o_totalprice > (
            SELECT 1.5 * avg(o2.o_totalprice) FROM {view} o2
            WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "rel_cube",
    tier="T2",
    doc="CUBE grouping sets (completes the rollup/cube/grouping-sets "
    "family): all 4 aggregation levels over (orderstatus, orderpriority).",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
       count(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") * 2
                + F.grouping("o_orderpriority")
            ).alias("gid"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias(
                "orderpriority"
            ),
            "gid",
            "n_orders",
            "revenue",
        )
    )


@register(
    "rel_window_range",
    tier="T2",
    doc="RANGE window frame (value-based, vs the ROWS frames elsewhere): "
    "per customer, rolling 90-day order count and spend ordered by "
    "order-date epoch days.",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS od_day,
       count(*) OVER w AS n_90d,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w
           AS DOUBLE), 4) AS spend_90d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT)
             RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)
""",
)
def rel_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # o_orderdate is TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) —
    # unix_millis refuses it; day numbers via calendar datediff instead.
    o = table(spark, sf_dir, "orders").withColumn(
        "od_day",
        F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("bigint"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("od_day")
        .rangeBetween(-90, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "od_day",
        F.count("*").over(w).alias("n_90d"),
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"), 4
        ).alias("spend_90d"),
    )


@register(
    "rel_pivot",
    tier="T2",
    doc="PIVOT (wide conditional aggregation): per return-flag row with one "
    "(sum_qty, sum_price) column pair per line-status.  Spark's "
    "`.pivot(col, values)` with the value list given EXPLICITLY — the "
    "two-pass 'discover distinct values first' form collects to the driver "
    "and makes the output schema data-dependent, both wrong at 100 TB.  "
    "With pinned values this stays ONE hash aggregate over "
    "(flag × status)-conditional partials: same single shuffle as a plain "
    "groupBy, map-side combined, whole-stage codegen.",
    oracle="""
SELECT l_returnflag,
       ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
           THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE), 4)
           AS f_qty,
       ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
           THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE), 4)
           AS f_price,
       ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
           THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE), 4)
           AS o_qty,
       ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
           THEN CAST(l_extendedprice AS DECIMAL(38,6)) END) AS DOUBLE), 4)
           AS o_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            dsum("l_quantity").alias("qty"),
            dsum("l_extendedprice").alias("price"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("F_qty").alias("f_qty"),
        F.col("F_price").alias("f_price"),
        F.col("O_qty").alias("o_qty"),
        F.col("O_price").alias("o_price"),
    )


@register(
    "rel_grouping_sets",
    tier="T2",
    doc="Explicit GROUPING SETS ((status,priority),(status),()) — the "
    "third member of the rollup/cube/grouping-sets family, with a "
    "grouping-id discriminator; decimal sums for cross-engine exactness. "
    "Scale shape: Catalyst expands the sets into one Expand + single "
    "hash aggregate (map-side partials intact) — not one scan per set.",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
       count(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
""",
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            (
                F.grouping("o_orderstatus") * 2
                + F.grouping("o_orderpriority")
            ).alias("gid"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias(
                "orderpriority"
            ),
            "gid",
            "n_orders",
            "revenue",
        )
    )


@register(
    "rel_q6_forecast",
    tier="T2",
    doc="TPC-H Q6-shaped revenue-change forecast: tight multi-predicate "
    "scan (date range + discount band + quantity cap) into a single "
    "global aggregate — the canonical predicate-pushdown showcase: every "
    "filter reaches the parquet scan, ReadSchema is 3 columns, and the "
    "aggregate is one map-side-combined row per partition.",
    oracle="""
SELECT count(*) AS n_rows,
       ROUND(CAST(SUM(CAST(l_extendedprice * l_discount
           AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def rel_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum(F.expr("l_extendedprice * l_discount")).alias("revenue"),
    )


@register(
    "rel_window_funcs",
    tier="T2",
    doc="Analytic-function battery: lag/lead (neighbor access), ntile "
    "(equi-depth bucketing), percent_rank and cume_dist (pinned to "
    "integer 1e6 — the (rank-1)/(n-1) and k/n quotients are identical "
    "IEEE doubles both engines, half-up floored).  Scale shape (two-"
    "phase, round-9 sf10 rewrite): o_orderstatus has cardinality 3, so "
    "a status-partitioned window caps parallelism at 3 tasks — the sf10 "
    "probe measured it as the campaign's worst ratio.  Because the "
    "(date, key) ordering is UNIQUE per row, every rank-family value "
    "decomposes into a fine-grained (status, date)-partitioned window "
    "plus a day-domain offset table (the zipf two-phase-rank pattern): "
    "rank = per-day offset + in-day row_number, percent_rank/cume_dist/"
    "ntile are closed forms of (rank, n), and lag/lead stitch at day "
    "boundaries from the same tiny table.  One fine-grained shuffle + "
    "two broadcast joins; parallelism scales with days × statuses.",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_orderkey) OVER w AS next_key,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT)
           AS pr_1e6,
       CAST(floor(cume_dist() OVER w * 1000000 + 0.5) AS BIGINT) AS cd_1e6
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey)
""",
)
def rel_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    # Phase 1: fine-grained (status, day) window — parallel in
    # days × statuses, never 3 corpus-wide sort tasks.
    wd = Window.partitionBy("o_orderstatus", "o_orderdate").orderBy(
        "o_orderkey"
    )
    base = (
        o.withColumn("r_in", F.row_number().over(wd))
        .withColumn("prev_in", F.lag("o_totalprice").over(wd))
        .withColumn("next_in", F.lead("o_orderkey").over(wd))
    )
    # Phase 2: day-domain offsets + boundary rows (|days|×|statuses|
    # rows — the zipf _freq_rank_offsets shape, broadcast-sized).
    bnd = o.groupBy("o_orderstatus", "o_orderdate").agg(
        F.count("*").alias("cnt"),
        F.max(
            F.struct(F.col("o_orderkey"), F.col("o_totalprice"))
        ).alias("lastrow"),
        F.min("o_orderkey").alias("first_key"),
    )
    ws = Window.partitionBy("o_orderstatus").orderBy("o_orderdate")
    bnd2 = (
        bnd.withColumn(
            "off",
            F.coalesce(
                F.sum("cnt").over(
                    ws.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "prev_last_price",
            F.lag(F.col("lastrow.o_totalprice")).over(ws),
        )
        .withColumn("next_first_key", F.lead("first_key").over(ws))
        .select(
            "o_orderstatus",
            "o_orderdate",
            "cnt",
            "off",
            "prev_last_price",
            "next_first_key",
        )
    )
    ntot = bnd.groupBy("o_orderstatus").agg(
        F.sum("cnt").alias("n_part")
    )
    j = base.join(
        F.broadcast(bnd2), ["o_orderstatus", "o_orderdate"]
    ).join(F.broadcast(ntot), "o_orderstatus")
    rank = (F.col("off") + F.col("r_in")).alias("rank")
    n = F.col("n_part")
    # Closed forms of (rank, n); the doubles replicate the native
    # percent_rank/cume_dist divisions bit-for-bit ((rank-1)/(n-1),
    # rank/n on a unique ordering), then the same 1e6 half-up pin.
    pin6 = (
        lambda c: F.floor(c * 1000000 + F.lit(0.5)).cast(  # noqa: E731
            "bigint"
        )
    )
    # ntile(4), the standard equi-depth split both engines implement:
    # qd = n DIV 4 rows per bucket, the first n MOD 4 buckets take one
    # extra row.  Exact integer DIV throughout; greatest(qd, 1) guards
    # the (never-taken when n < 4) second branch against ANSI division
    # by zero.
    qd = F.expr("n_part DIV 4")
    rm = n % 4
    thr = rm * (qd + 1)
    rank_e = F.col("off") + F.col("r_in")
    quartile = F.when(
        rank_e <= thr,
        F.expr("(off + r_in - 1) DIV (n_part DIV 4 + 1)") + 1,
    ).otherwise(
        rm
        + F.expr(
            "(off + r_in - (n_part % 4) * (n_part DIV 4 + 1) - 1)"
            " DIV greatest(n_part DIV 4, 1)"
        )
        + 1
    )
    rank = rank_e
    pr = F.when(
        n > 1,
        pin6(
            (rank - 1).cast("double") / (n - 1).cast("double")
        ),
    ).otherwise(F.lit(0))
    cd = pin6(rank.cast("double") / n.cast("double"))
    prev_price = F.when(
        F.col("r_in") == 1, F.col("prev_last_price")
    ).otherwise(F.col("prev_in"))
    next_key = F.when(
        F.col("r_in") == F.col("cnt"), F.col("next_first_key")
    ).otherwise(F.col("next_in"))
    return j.select(
        "o_orderkey",
        "o_orderstatus",
        prev_price.alias("prev_price"),
        next_key.alias("next_key"),
        quartile.cast("bigint").alias("quartile"),
        pr.cast("bigint").alias("pr_1e6"),
        cd.cast("bigint").alias("cd_1e6"),
    )


@register(
    "rel_percentiles",
    tier="T2",
    doc="Exact distribution summary per order priority: discrete "
    "percentiles (p25/p50/p75/p95 via percentile_disc ≡ DuckDB "
    "quantile_disc — both return an ACTUAL data value, no interpolation, "
    "so the doubles are parquet-exact passthroughs), plus min/max/count. "
    "Scale shape: exact percentiles need the per-group sorted mass — one "
    "shuffle on the (low-cardinality) group key; at extreme group sizes "
    "the approx path is rel_agg_approx's percentile_approx sketch.",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n,
       min(o_totalprice) AS min_price,
       quantile_disc(o_totalprice, 0.25) AS p25,
       quantile_disc(o_totalprice, 0.50) AS p50,
       quantile_disc(o_totalprice, 0.75) AS p75,
       quantile_disc(o_totalprice, 0.95) AS p95,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
""",
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    pd_ = lambda q: F.expr(  # noqa: E731
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)"
    )
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("min_price"),
        pd_(0.25).alias("p25"),
        pd_(0.50).alias("p50"),
        pd_(0.75).alias("p75"),
        pd_(0.95).alias("p95"),
        F.max("o_totalprice").alias("max_price"),
    )


Q3_CUTOFF = "1998-06-01"


@register(
    "rel_q3_shipping",
    tier="T2",
    doc="TPC-H Q3-shaped shipping priority: segment-filtered customers ⨝ "
    "pre-cutoff orders ⨝ post-cutoff lineitems → per-order revenue → "
    "top 10.  Scale shape: both join predicates and all three filters push "
    "into the scans; customer⨝orders shuffles on custkey, the result "
    "joins lineitem on orderkey (AQE picks broadcast only if the filtered "
    "side collapses); the final top-10 is TakeOrderedAndProject on the "
    "ROUNDED revenue with orderkey tie-break — a total order, so the "
    "LIMIT frontier is engine-independent.",
    oracle=f"""
SELECT l_orderkey,
       CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS od_day,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
           AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
GROUP BY l_orderkey, od_day
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def rel_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp")
    )
    od_day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("od_day", od_day)
        .groupBy("l_orderkey", "od_day")
        .agg(dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


Q18_MIN_QTY = 200


@register(
    "rel_q18_large_orders",
    tier="T2",
    doc="TPC-H Q18-shaped large-volume orders: per-order quantity "
    "aggregate → HAVING threshold → join back to orders and customers. "
    "Scale shape: the HAVING side is one map-side-combined aggregate that "
    "shrinks lineitem to qualifying orderkeys BEFORE any wide join; both "
    "joins are then keyed equi-joins on the reduced set (AQE broadcasts "
    "the survivor side when it collapses).  The threshold compares the "
    "ROUND(…,4) decimal sum both engines, so the frontier cannot drift.",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey,
         ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4)
             AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4)
         > {Q18_MIN_QTY}
)
SELECT c_name, o_custkey, o_orderkey,
       CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS od_day,
       o_totalprice, total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def rel_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > Q18_MIN_QTY)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    od_day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            od_day.alias("od_day"),
            "o_totalprice",
            "total_qty",
        )
    )


Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"


@register(
    "rel_q5_volume",
    tier="T2",
    doc="TPC-H Q5 shape (local supplier volume): revenue per nation where "
    "the customer AND the line's supplier sit in the same ASIA nation, "
    "orders within one year — the engine's 6-way join benchmark. Scale "
    "shape: region/nation broadcast (bounded dims), customer and supplier "
    "hash-join the fact chain on their keys, the residual c_nationkey = "
    "s_nationkey equality rides the supplier join, ONE aggregate at the "
    "end; lineitem (the 100 TB table) is never broadcast and its scan "
    "prunes to 4 columns.",
    oracle="""
SELECT n.n_name,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def rel_q5_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region").where(
        F.col("r_name") == Q5_REGION
    )
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_TO).cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy("n_name")
        .agg(
            dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias(
                "revenue"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_FROM = "1996-01-01"
Q7_TO = "1998-01-01"


@register(
    "rel_q7_trade",
    tier="T2",
    doc="TPC-H Q7 shape (volume shipping between two nations): revenue "
    "per (supplier nation, customer nation, ship year) for the ordered "
    "nation pairs (A,B) and (B,A) inside a 2-year ship window. Scale "
    "shape: BOTH nation dims broadcast (bounded), the pair predicate is "
    "applied to the broadcast side BEFORE the fact joins so lineitem "
    "rows from other nations drop at the supplier/customer hash joins, "
    "the ship-window filter is pushed into the parquet scan, and the "
    "fact chain shuffles only on its join keys — one aggregate at the "
    "end, lineitem never broadcast, 5-column scan.",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
)
def rel_q7_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = (Q7_NATION_A, Q7_NATION_B)
    n1 = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("s_nkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q7_FROM).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(Q7_TO).cast("timestamp_ntz"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        )
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        # inner join against the 2-row broadcast nation dim drops all
        # other supplier nations before the orders/customer joins
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias(
                "revenue"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@register(
    "rel_q10_returns",
    tier="T2",
    doc="TPC-H Q10 shape (returned-item reporting): top 20 customers by "
    "revenue lost to returns in one quarter. Scale shape: the return-flag "
    "and order-window filters push into the lineitem/orders scans, the "
    "fact chain joins on keys, nation broadcasts, and ORDER BY+LIMIT "
    "compiles to TakeOrderedAndProject — no global sort at any size.",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       c.c_acctbal AS acctbal,
       ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def rel_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("c_acctbal").alias("acctbal"),
        )
        .agg(
            dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias(
                "revenue"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "rel_q4_priority",
    tier="T2",
    doc="TPC-H Q4 shape (order priority checking): orders in one quarter "
    "having at least one late-shipped line (shipdate > orderdate + 60 "
    "days), counted per priority. The EXISTS compiles to a LEFT SEMI "
    "join — the fact probe early-outs on first match and never "
    "duplicates order rows; the order-window filter pushes to the scan.",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
)
def rel_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


@register(
    "rel_q14_promo",
    tier="T2",
    doc="TPC-H Q14 shape (promotion effect): promo parts' share of one "
    "month's revenue. Revenue sums are DECIMAL-exact then cast to DOUBLE "
    "before the single division, and the percentage is pinned to an "
    "integer (floor(pct*1e4+0.5)) — identical doubles divide identically "
    "in both engines, and the integer pin removes the 4-dp rounding-tie "
    "hazard of emitted quotients. Scale shape: ship-window filter pushed "
    "to the lineitem scan, part joined on its key (AQE picks broadcast "
    "at fixture scale), one scalar aggregate.",
    oracle="""
SELECT CAST(floor(
         100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) * 10000 + 0.5)
       AS BIGINT) AS promo_pct_1e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def rel_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.expr("l_extendedprice * (1 - l_discount)").cast(DEC)
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo_rev).alias("ps"),
            F.sum(rev).alias("ts"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
        .select(
            F.floor(
                F.lit(100.0)
                * F.col("ps").cast("double")
                / F.col("ts").cast("double")
                * 10000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("promo_pct_1e4"),
            "n_lines",
        )
    )


@register(
    "rel_q15_top_supplier",
    tier="T2",
    doc="TPC-H Q15 shape (top supplier): per-supplier revenue for one "
    "quarter, returning every supplier that attains the maximum — the "
    "scalar-subquery-max + join-back pattern (distinct from rel_topk's "
    "ORDER BY+LIMIT: ties are NOT cut). The max rides a 1-row broadcast "
    "cross join (declared scalar pattern); revenue is decimal-exact then "
    "rounded before the equality, so the tie test is engine-stable.",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(38,6))) AS DOUBLE), 4)
             AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN rev r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def rel_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias(
            "total_revenue"
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "rel_q19_brackets",
    tier="T2",
    doc="TPC-H Q19 shape (discounted revenue, disjunctive brackets): "
    "lineitem ⋈ part on the part key with an OR-of-ANDs residual over "
    "(brand, size, quantity) brackets — the disjunction can't push into "
    "either scan whole, but each conjunct's column set is pruned and the "
    "equi key still drives a hash join (never a cartesian). One scalar "
    "decimal-exact aggregate.",
    oracle="""
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 25)
   OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 10 AND 40
       AND l.l_quantity BETWEEN 10 AND 40)
""",
)
def rel_q19_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    bracket1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 25)
    )
    bracket2 = (
        (F.col("p_brand") == "Brand#9")
        & F.col("p_size").between(10, 40)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .where(bracket1 | bracket2)
        .agg(
            dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias(
                "revenue"
            ),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@register(
    "rel_mad_outliers",
    tier="T2",
    doc="Robust outlier detection via median absolute deviation: per "
    "event type, med = discrete median of value, mad = discrete median "
    "of |value - med|, and the count of events beyond 3·MAD — the "
    "robust-statistics alternative to z-scores that a monitoring "
    "pipeline runs on skewed metrics.  percentile_disc picks an actual "
    "data value (engine-stable, no interpolation); |x - med| and the "
    "3·MAD comparison are identical IEEE ops on identical doubles.  "
    "Scale shape: two grouped exact-percentile passes + one counting "
    "pass, all keyed on the bounded event_type; the per-type medians "
    "ride a broadcast join back.",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_disc(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type,
         quantile_disc(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(max(m.med), 4) AS med,
       ROUND(max(d.mad), 4) AS mad,
       CAST(count(*) FILTER (WHERE abs(e.value - m.med) > 3 * d.mad)
            AS BIGINT) AS n_outliers
FROM events e
JOIN med m ON e.event_type = m.event_type
JOIN mad d ON e.event_type = d.event_type
GROUP BY e.event_type
""",
)
def rel_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "med"
        )
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = (
        with_med.select(
            "event_type", F.abs(F.col("value") - F.col("med")).alias("ad")
        )
        .groupBy("event_type")
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)"
            ).alias("mad")
        )
    )
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.max("med"), 4).alias("med"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * F.col("mad"),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "rel_ivm_merge",
    tier="T2",
    doc="Incremental view maintenance: a per-user aggregate refreshed by "
    "MERGING yesterday's partial state (epoch-days with day%4 != 0) "
    "with today's delta partition (day%4 = 0) — counts add, "
    "DECIMAL-exact sums add, maxes take greatest — and the merged view "
    "is checked cell-for-cell against a full recompute, emitting the "
    "match flag as data.  This algebraic mergeability is WHY a 100 TB "
    "rollup refreshes by partition instead of rescanning history "
    "(and why AVG must be carried as sum+count, never averaged "
    "averages).  Scale shape: two partition-pruned aggregates + one "
    "keyed merge join; the audit recompute is the declared check cost.",
    oracle="""
WITH tagged AS (
  SELECT user_id, value, epoch_ms(ts) AS ms,
         (epoch_ms(ts) // 86400000) % 4 = 0 AS is_delta
  FROM events
), base AS (
  SELECT user_id, count(*) AS n,
         SUM(CAST(value AS DECIMAL(38,6))) AS s, max(ms) AS m
  FROM tagged WHERE NOT is_delta GROUP BY user_id
), delta AS (
  SELECT user_id, count(*) AS n,
         SUM(CAST(value AS DECIMAL(38,6))) AS s, max(ms) AS m
  FROM tagged WHERE is_delta GROUP BY user_id
), merged AS (
  SELECT coalesce(b.user_id, d.user_id) AS user_id,
         coalesce(b.n, 0) + coalesce(d.n, 0) AS n,
         coalesce(b.s, 0) + coalesce(d.s, 0) AS s,
         greatest(coalesce(b.m, 0), coalesce(d.m, 0)) AS m
  FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
), full_v AS (
  SELECT user_id, count(*) AS n,
         SUM(CAST(value AS DECIMAL(38,6))) AS s, max(ms) AS m
  FROM tagged GROUP BY user_id
)
SELECT m.user_id, CAST(m.n AS BIGINT) AS n,
       ROUND(CAST(m.s AS DOUBLE), 4) AS total,
       CAST(m.m AS BIGINT) AS last_ms,
       CAST(m.n = f.n AND m.s = f.s AND m.m = f.m AS INT) AS ivm_ok
FROM merged m JOIN full_v f ON m.user_id = f.user_id
""",
)
def rel_ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        "ms",
        (F.expr("(ms DIV 86400000) % 4") == 0).alias("is_delta"),
    )
    dec = F.sum(F.col("value").cast("decimal(38,6)"))

    def agg(df):
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"), dec.alias("s"), F.max("ms").alias("m")
        )

    base = agg(tagged.where(~F.col("is_delta")))
    delta = agg(tagged.where("is_delta"))
    b = base.alias("b")
    d = delta.alias("d")
    merged = (
        b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
        .select(
            F.coalesce("b.user_id", "d.user_id").alias("user_id"),
            (
                F.coalesce("b.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))
            ).alias("n"),
            (
                F.coalesce(F.col("b.s"), F.lit(0).cast("decimal(38,6)"))
                + F.coalesce(F.col("d.s"), F.lit(0).cast("decimal(38,6)"))
            ).alias("s"),
            F.greatest(
                F.coalesce("b.m", F.lit(0)), F.coalesce("d.m", F.lit(0))
            ).alias("m"),
        )
    )
    full_v = agg(tagged).select(
        F.col("user_id").alias("f_user"),
        F.col("n").alias("fn"),
        F.col("s").alias("fs"),
        F.col("m").alias("fm"),
    )
    return (
        merged.join(full_v, merged.user_id == full_v.f_user)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("s").cast("double"), 4).alias("total"),
            F.col("m").cast("bigint").alias("last_ms"),
            (
                (F.col("n") == F.col("fn"))
                & (F.col("s") == F.col("fs"))
                & (F.col("m") == F.col("fm"))
            )
            .cast("int")
            .alias("ivm_ok"),
        )
    )
