"""Aggregate / boolean / set operators (SURVEY.md §2.6).

Reference surface: count/sum/min/max/average [RX:count], groupBy
[RX:groupby], all/exists/contains/isEmpty [RX:all], sequenceEqual
[RX:sequenceequal].

Spark-first design: plain hash aggregates (map-side partials + one shuffle);
boolean aggregates use bool_and/bool_or (JVM builtins); sequenceEqual is the
symmetric EXCEPT ALL — the multiset-difference formulation distributes as
two hash anti-aggregations instead of a positional pairwise walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import davg, dsum
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import events_stream, table


@register(
    "op_agg_basic",
    tier="T0",
    doc="Mathematical aggregates per group [RX:count/sum/min/max/average].",
    oracle="""
SELECT event_type, count(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS total_value,
       ROUND(min(value), 4) AS min_value,
       ROUND(max(value), 4) AS max_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(value), 4) AS avg_value
FROM events
GROUP BY event_type
""",
)
def op_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("total_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            davg("value").alias("avg_value"),
        )
    )


@register(
    "op_group_by",
    tier="T0",
    doc="Partition the stream into keyed sub-streams [RX:groupby] — in batch "
    "form, per-key aggregates over the composite key.",
    oracle="""
SELECT user_id, event_type, count(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS total_value
FROM events
GROUP BY user_id, event_type
""",
)
def op_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
    )


@register(
    "op_bool",
    tier="T1",
    doc="Boolean aggregates per stream [RX:all/exists/contains/isEmpty].",
    oracle="""
SELECT user_id,
       bool_and(value > 0) AS all_positive,
       bool_or(event_type = 'error') AS has_error,
       bool_or(event_type = 'purchase' AND value > 150) AS contains_big_buy,
       count(*) = 0 AS is_empty
FROM events
GROUP BY user_id
""",
)
def op_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.bool_and(F.col("value") > 0).alias("all_positive"),
            F.bool_or(F.col("event_type") == "error").alias("has_error"),
            F.bool_or(
                (F.col("event_type") == "purchase") & (F.col("value") > 150)
            ).alias("contains_big_buy"),
            (F.count("*") == 0).alias("is_empty"),
        )
    )


@register(
    "op_sequence_equal",
    tier="T2",
    doc="Are two streams element-wise equal [RX:sequenceequal]: symmetric "
    "EXCEPT ALL between the purchase and click user_id multisets — both "
    "leftover counts 0 ⇔ equal. Covers the EXCEPT set-op surface.",
    oracle="""
WITH ab AS (
  SELECT count(*) AS n FROM (
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'click')
), ba AS (
  SELECT count(*) AS n FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'purchase')
)
SELECT ab.n AS a_minus_b, ba.n AS b_minus_a,
       (ab.n = 0 AND ba.n = 0) AS sequences_equal
FROM ab, ba
""",
)
def op_sequence_equal(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = events_stream(spark, sf_dir, "purchase").select("user_id")
    b = events_stream(spark, sf_dir, "click").select("user_id")
    ab = a.exceptAll(b).agg(F.count("*").alias("a_minus_b"))
    ba = b.exceptAll(a).agg(F.count("*").alias("b_minus_a"))
    return ab.crossJoin(ba).select(
        "a_minus_b",
        "b_minus_a",
        ((F.col("a_minus_b") == 0) & (F.col("b_minus_a") == 0)).alias(
            "sequences_equal"
        ),
    )


@register(
    "op_default_if_empty",
    tier="T1",
    doc="Seed value when a stream is empty [RX:defaultifempty]: per-user "
    "purchase totals defaulted to 0.0 for users whose purchase stream is "
    "empty (left join against the user dimension + coalesce).",
    oracle="""
WITH users AS (
  SELECT DISTINCT user_id FROM events
), p AS (
  SELECT user_id,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
             AS total
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT u.user_id, COALESCE(p.total, 0.0) AS purchase_total,
       p.user_id IS NULL AS defaulted
FROM users u LEFT JOIN p ON u.user_id = p.user_id
""",
)
def op_default_if_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dsum("value").alias("total"))
        .withColumnRenamed("user_id", "p_user")
    )
    return users.join(p, users.user_id == p.p_user, "left").select(
        "user_id",
        F.coalesce("total", F.lit(0.0)).alias("purchase_total"),
        F.col("p_user").isNull().alias("defaulted"),
    )
