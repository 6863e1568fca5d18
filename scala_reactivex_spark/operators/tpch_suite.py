"""Remaining TPC-H query shapes (SURVEY.md §2.9 extras, round 6).

Completes the TPC-H sweep started in relational.py (Q1/Q3/Q4/Q5/Q6/Q7/Q10/
Q14/Q15/Q18/Q19) with the eleven shapes that were still missing: Q2, Q8, Q9,
Q11, Q12, Q13, Q16, Q17, Q20, Q21, Q22.  The fixture star schema
(FIXTURES.md) has no ``partsupp`` table and lacks ``l_shipmode`` /
``l_commitdate`` / ``l_receiptdate`` / ``c_phone`` / ``p_container`` /
``p_mfgr``, so each query keeps the REFERENCE SHAPE — the join topology,
subquery pattern, and aggregation structure that makes the TPC-H query
interesting — while substituting available columns; every substitution is
stated in the query's doc.

Scale notes apply throughout: dimension joins (region/nation/supplier/part)
carry broadcast hints or are small enough for AQE's broadcast pick;
correlated subqueries are expressed as pre-aggregated frames joined back on
their group key (one shuffle each, map-side partials intact); scalar
thresholds ride 1-row broadcast cross joins (the declared scalar pattern,
PLANS.md).  Nothing collects; nothing iterates on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import DEC, dsum
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table


def _in_region(
    spark: SparkSession, sf_dir: str, r_name: str
) -> DataFrame:
    """Supplier keys in one region with nation names — a tiny dim frame.

    supplier ⋈ nation ⋈ region is at most |supplier| rows (bounded dims),
    always broadcast-able; used by Q2/Q11/Q20.
    """
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == r_name)
    return (
        supp.join(
            F.broadcast(nation),
            supp.s_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


@register(
    "rel_q2_mincost",
    tier="T2",
    doc="TPC-H Q2 shape (minimum-cost supplier): for each STANDARD part in "
    "a size band, every EUROPE supplier whose unit price equals the "
    "part's minimum unit price among EUROPE suppliers — the correlated-"
    "MIN-subquery + join-back pattern. No partsupp table in the fixture: "
    "the part-supplier offer relation is derived from lineitem as "
    "min(l_extendedprice/l_quantity) per (part, supplier), pinned to "
    "integer micro-units (floor(x*1e6+0.5)) so the MIN and the equality "
    "test are bit-stable across engines. Scale: the offer aggregate is "
    "one shuffle on (partkey, suppkey); the per-part minimum reuses the "
    "same partkey partitioning; supplier×nation×region is a broadcast "
    "dim.",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(floor(l_extendedprice / l_quantity * 1000000 + 0.5)
                  AS BIGINT)) AS cost_micro
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), po AS (
  SELECT o.l_partkey, o.cost_micro, eu.s_name, eu.s_acctbal, eu.n_name
  FROM offers o JOIN eu ON o.l_suppkey = eu.s_suppkey
), best AS (
  SELECT l_partkey, MIN(cost_micro) AS best_micro FROM po GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, po.s_name, po.n_name, po.s_acctbal,
       po.cost_micro
FROM po
JOIN best ON po.l_partkey = best.l_partkey
         AND po.cost_micro = best.best_micro
JOIN part p ON po.l_partkey = p.p_partkey
WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 20
""",
)
def rel_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") / F.col("l_quantity") * 1_000_000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("line_micro"),
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("line_micro").alias("cost_micro")
    )
    eu = _in_region(spark, sf_dir, "EUROPE")
    po = offers.join(
        F.broadcast(eu), offers.l_suppkey == eu.s_suppkey
    ).select("l_partkey", "cost_micro", "s_name", "s_acctbal", "n_name")
    best = po.groupBy(F.col("l_partkey").alias("best_partkey")).agg(
        F.min("cost_micro").alias("best_micro")
    )
    part = table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    return (
        po.join(
            best,
            (F.col("l_partkey") == F.col("best_partkey"))
            & (F.col("cost_micro") == F.col("best_micro")),
        )
        .drop("best_partkey")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name", "s_acctbal",
            "cost_micro",
        )
    )


@register(
    "rel_q8_mktshare",
    tier="T2",
    doc="TPC-H Q8 shape (national market share): NATION_3's share of "
    "AMERICA customers' ECONOMY-part revenue per order year, 1995-1996. "
    "Full Q8 topology — lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region "
    "on the demand side, supplier ⋈ nation on the supply side. Share is "
    "pinned to integer 1e-6 units of the decimal-exact revenue ratio. "
    "Scale: the only big-table shuffle is lineitem⋈orders on the order "
    "key; every dim is broadcast; the final aggregate is 2 rows.",
    oracle="""
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(floor(
         CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
             THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(38,6)) ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE)
         * 1000000 + 0.5) AS BIGINT) AS share_1e6,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN region r   ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY EXTRACT(year FROM o.o_orderdate)
""",
)
def rel_q8_mktshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    region = table(spark, sf_dir, "region").where(
        F.col("r_name") == "AMERICA"
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    part = table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    rev = F.expr("l_extendedprice * (1 - l_discount)").cast(DEC)
    nation3_rev = F.when(
        F.col("supp_nation") == "NATION_3", rev
    ).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(nation3_rev).alias("ns"),
            F.sum(rev).alias("ts"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
        .select(
            "o_year",
            F.floor(
                F.col("ns").cast("double")
                / F.col("ts").cast("double")
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("share_1e6"),
            "n_lines",
        )
    )


@register(
    "rel_q9_profit",
    tier="T2",
    doc="TPC-H Q9 shape (product-type profit by nation and year): profit "
    "per supplier nation per order year over parts whose name contains "
    "'red'. No partsupp: supply cost is modeled as 60% of p_retailprice "
    "per unit (the substitution is stated, the shape — 5-way fact⋈dim "
    "join + two-level group — is intact). Decimal-exact profit sum. "
    "Scale: lineitem⋈orders is the one fact-fact shuffle; part/supplier/"
    "nation broadcast; ~25 nations × 7 years output.",
    oracle="""
SELECT sn.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CAST(
           l.l_extendedprice * (1 - l.l_discount)
           - 0.6 * p.p_retailprice * l.l_quantity
         AS DECIMAL(38,6))) AS DOUBLE), 4) AS profit,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY sn.n_name, EXTRACT(year FROM o.o_orderdate)
""",
)
def rel_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    part = table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    profit = F.expr(
        "l_extendedprice * (1 - l_discount)"
        " - 0.6 * p_retailprice * l_quantity"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            dsum(profit).alias("profit"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@register(
    "rel_q11_important",
    tier="T2",
    doc="TPC-H Q11 shape (important stock): per-part traded value of ASIA "
    "suppliers, keeping parts whose value exceeds a fraction of the "
    "global total — the groupBy + global-scalar-threshold HAVING "
    "pattern. No partsupp: value is sum(l_extendedprice*(1-l_discount)) "
    "from lineitem. The global threshold is 2.5× the MEAN per-part value "
    "— a second-level aggregate of the SAME decimal-exact per-part sums "
    "(no re-scan), joined back as a 1-row broadcast; expressing it "
    "relative to the mean (not a fixed corpus fraction) keeps the "
    "selectivity scale-free, exactly as TPC-H scales Q11's fraction by "
    "1/SF. Scale: one shuffle on partkey; the threshold side is O(1).",
    oracle="""
WITH v AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(38,6))) AS val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY l.l_partkey
)
SELECT v.l_partkey AS p_partkey,
       ROUND(CAST(v.val AS DOUBLE), 4) AS part_value
FROM v
WHERE CAST(v.val AS DOUBLE)
      > (SELECT CAST(SUM(val) AS DOUBLE) * 2.5 / COUNT(*) FROM v)
""",
)
def rel_q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    asia = _in_region(spark, sf_dir, "ASIA").select("s_suppkey")
    val = (
        li.join(F.broadcast(asia), li.l_suppkey == asia.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr("l_extendedprice * (1 - l_discount)").cast(DEC)
            ).alias("val")
        )
    )
    total = val.agg(
        (F.sum("val").cast("double") * F.lit(2.5) / F.count("*")).alias(
            "threshold"
        )
    )
    return (
        val.join(F.broadcast(total))
        .where(F.col("val").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val").cast("double"), 4).alias("part_value"),
        )
    )


@register(
    "rel_q12_shipclass",
    tier="T2",
    doc="TPC-H Q12 shape (shipping-mode priority check): lines shipped "
    "≥90 days after their order date during 1996, counted per class "
    "into high-priority (1-URGENT/2-HIGH) vs low-priority buckets. No "
    "l_shipmode/l_commitdate/l_receiptdate in the fixture: the class "
    "column is l_returnflag and 'late' is shipdate > orderdate + 90 "
    "days (substitutions stated; the conditional-aggregation-after-join "
    "shape is intact). Scale: one orderkey shuffle, ship-window filter "
    "pushed to the lineitem scan, 3-row output.",
    oracle="""
SELECT l.l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
""",
)
def rel_q12_shipclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@register(
    "rel_q13_custdist",
    tier="T2",
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT join "
    "customer→orders (excluding 5-LOW priority orders — stand-in for "
    "Q13's comment anti-filter, stated), count orders per customer "
    "INCLUDING zero-order customers, then the distribution of those "
    "counts. The two-level aggregate is the interesting bit: the first "
    "groupBy shuffles on custkey, the second on the (small-domain) "
    "count. Scale: order counts per customer are bounded; the second "
    "shuffle is tiny.",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
""",
)
def rel_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@register(
    "rel_q16_suppcnt",
    tier="T2",
    doc="TPC-H Q16 shape (part-supplier relationship variety): distinct "
    "supplier count per (brand, type, size) over selected sizes, "
    "excluding one brand, the PROMO type, and suppliers with negative "
    "account balance (stand-in for Q16's complaint-comment NOT IN, "
    "stated) — the anti-join + count-distinct pattern. No partsupp: the "
    "part-supplier relation is distinct (l_partkey, l_suppkey) pairs "
    "from lineitem. Scale: the excluded-supplier list is a tiny "
    "broadcast anti-join; countDistinct shuffles once on the group "
    "key with partial distinct-aggregation map-side.",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#3' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def rel_q16_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            li.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


@register(
    "rel_q17_smallqty",
    tier="T2",
    doc="TPC-H Q17 shape (small-quantity-order revenue): yearly-average "
    "revenue from lines of one brand's SMALL-type parts (container "
    "stand-in, stated) whose quantity is below half the part's average "
    "quantity — the correlated-AVG-subquery pattern, expressed as a "
    "per-part aggregate joined back on partkey. The avg is exact "
    "decimal sum ÷ count so both engines compare against the identical "
    "double. Scale: the per-part avg shuffles once on partkey and is "
    "dimension-sized thereafter; the probe join is broadcast at fixture "
    "scale.",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6)))
             AS DOUBLE) / 7.0, 4) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
  AND l.l_quantity < 0.5 * pa.avg_qty
""",
)
def rel_q17_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(pa), li.l_partkey == F.col("pa_partkey"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                / F.lit(7.0),
                4,
            ).alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@register(
    "rel_q20_excess",
    tier="T2",
    doc="TPC-H Q20 shape (suppliers with excess stock): AFRICA suppliers "
    "who shipped more than 250 units of 'blue'-named parts during 1996 "
    "— the aggregate-subquery→semi-join chain. No partsupp/availqty: "
    "the quantity threshold is over shipped lineitem quantity "
    "(stated). Scale: part filter is a broadcast; the per-supplier "
    "aggregate shuffles once on suppkey and is supplier-sized "
    "thereafter; region dims broadcast.",
    oracle="""
WITH qty AS (
  SELECT l.l_suppkey,
         ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6)))
               AS DOUBLE), 4) AS blue_qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'blue%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, q.blue_qty
FROM supplier s
JOIN qty q ON s.s_suppkey = q.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AFRICA' AND q.blue_qty > 250
""",
)
def rel_q20_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    blue = table(spark, sf_dir, "part").where(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    qty = (
        li.join(F.broadcast(blue), li.l_partkey == blue.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 4
            ).alias("blue_qty")
        )
        .where(F.col("blue_qty") > 250)
    )
    africa = _in_region(spark, sf_dir, "AFRICA").select(
        "s_suppkey", "s_name"
    )
    return africa.join(
        qty, F.col("s_suppkey") == F.col("l_suppkey")
    ).select("s_suppkey", "s_name", "blue_qty")


@register(
    "rel_q21_waiting",
    tier="T2",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): per "
    "supplier, the number of finalized multi-supplier orders where that "
    "supplier was the ONLY late one. No l_receiptdate/l_commitdate: "
    "'late' is shipdate > orderdate + 60 days (stated). The "
    "EXISTS/NOT-EXISTS pair collapses into ONE per-order aggregate — "
    "countDistinct(suppliers), countDistinct(late suppliers), and the "
    "late supplier itself (well-defined exactly when the distinct-late "
    "count is 1) — so the whole query is two shuffles (orderkey, then "
    "suppkey) instead of two extra fact self-joins; that rewrite is the "
    "scale win.",
    oracle="""
WITH l2 AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN is_late = 1 THEN l_suppkey END) AS late_supp
  FROM l2 GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order po
JOIN supplier s ON po.late_supp = s.s_suppkey
WHERE po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_suppkey, s.s_name
""",
)
def rel_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    # Round-17 (guide §2.3): the two countDistinct(suppkey) buffers
    # planned an Expand whose distinct state re-derived the same
    # (order, supplier) grid twice.  Aggregate to that grid FIRST
    # (map-side combinable): its rows ARE the distinct suppliers, a
    # supplier is late iff any of its lines is, and the unique late
    # supplier is the max over late suppliers — values identical.
    per_supp = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("any_late"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum("any_late").alias("n_late"),
            F.max(
                F.when(F.col("any_late") == 1, F.col("l_suppkey"))
            ).alias("late_supp"),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(
            F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey")
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )


@register(
    "rel_q22_inactive",
    tier="T2",
    doc="TPC-H Q22 shape (global sales opportunity): country-coded "
    "customers with above-average positive balance and NO recent "
    "activity. No c_phone: the country code is c_nationkey % 10, and "
    "(because every fixture customer has orders) 'no orders' becomes "
    "'no orders on/after 2000-01-01' (substitutions stated) — the "
    "shape is intact: scalar-AVG subquery + anti-join + grouped "
    "output. Scale: the threshold is a 1-row broadcast; the anti-join "
    "probe side is pre-filtered orders; customer shuffles once.",
    oracle="""
WITH sel AS (
  SELECT c.c_custkey, c.c_acctbal,
         CAST(c.c_nationkey % 10 AS INT) AS cntrycode
  FROM customer c
  WHERE CAST(c.c_nationkey % 10 AS INT) IN (0, 1, 3, 5, 7)
), thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(c_acctbal) AS avg_bal
  FROM sel WHERE c_acctbal > 0
)
SELECT sel.cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(CAST(SUM(CAST(sel.c_acctbal AS DECIMAL(38,6)))
             AS DOUBLE), 4) AS totacctbal
FROM sel, thr
WHERE sel.c_acctbal > thr.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = sel.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY sel.cntrycode
""",
)
def rel_q22_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    sel = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        (F.col("c_nationkey") % 10).cast("int").alias("cntrycode"),
    ).where(F.col("cntrycode").isin(0, 1, 3, 5, 7))
    thr = sel.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        sel.join(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, sel.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
