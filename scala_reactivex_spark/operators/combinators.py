"""Multi-stream combining operators (SURVEY.md §2.5).

Reference surface: merge [RX:merge], concat/startWith [RX:concat], zip
[RX:zip], combineLatest [RX:combinelatest], withLatestFrom
[RX:combinelatest], takeUntil [RX:takeuntil].

Derived streams (SURVEY.md §2 header): purchases/clicks/signups = ``events``
filtered by event_type — the reference's independently subscribable
Observables.

Spark-first design: interleaving is a union (order is data, never physical
row order); zip is per-key row_number + equi join; combineLatest /
withLatestFrom use the union + ``last(..., ignorenulls) OVER (ROWS UNBOUNDED
PRECEDING)`` as-of trick — Spark has no native as-of join, and this
formulation is one shuffle on user_id with no state on the driver
(SURVEY.md §7 hard-parts, verified cross-engine).  takeUntil is a
broadcastable per-key min join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.order import w_running, w_user
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import events_stream

@register(
    "op_merge",
    tier="T0",
    doc="Interleave two streams by time [RX:merge]: union — the merged order "
    "is carried by (ts, event_id), not by physical row order.",
    oracle="""
SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type,
       ROUND(value, 4) AS value_r
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type,
       ROUND(value, 4) AS value_r
FROM events WHERE event_type = 'click'
""",
)
def op_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = lambda df: df.select(  # noqa: E731
        "event_id",
        "user_id",
        "ms",
        "event_type",
        F.round("value", 4).alias("value_r"),
    )
    return proj(events_stream(spark, sf_dir, "purchase")).unionByName(
        proj(events_stream(spark, sf_dir, "click"))
    )


@register(
    "op_concat",
    tier="T1",
    doc="A fully, then B [RX:concat]: source-major order carried by an "
    "explicit src_rank column (0=first stream), composing with (ts, "
    "event_id) for the total order.",
    oracle="""
SELECT 0 AS src_rank, event_id, user_id, epoch_ms(ts) AS ms
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT 1 AS src_rank, event_id, user_id, epoch_ms(ts) AS ms
FROM events WHERE event_type = 'click'
""",
)
def op_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    tag = lambda df, rank: df.select(  # noqa: E731
        F.lit(rank).cast("int").alias("src_rank"), "event_id", "user_id", "ms"
    )
    return tag(events_stream(spark, sf_dir, "purchase"), 0).unionByName(
        tag(events_stream(spark, sf_dir, "click"), 1)
    )


@register(
    "op_zip",
    tier="T1",
    doc="Pair i-th purchase with i-th click per user [RX:zip]: per-stream "
    "row_number over event-time order, then an equi join on (user_id, rn) — "
    "inner join truncates to the shorter stream, exactly zip's semantics.",
    oracle="""
WITH a AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'click'
)
SELECT a.user_id, a.rn, a.event_id AS p_event_id, b.event_id AS c_event_id,
       a.ms AS p_ms, b.ms AS c_ms,
       ROUND(a.value + b.value, 4) AS pair_value
FROM a JOIN b ON a.user_id = b.user_id AND a.rn = b.rn
""",
)
def op_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    number = lambda df: df.select(  # noqa: E731
        "user_id",
        "event_id",
        "ms",
        "value",
        F.row_number().over(w_user()).alias("rn"),
    )
    a = number(events_stream(spark, sf_dir, "purchase")).alias("a")
    b = number(events_stream(spark, sf_dir, "click")).alias("b")
    return a.join(b, ["user_id", "rn"]).select(
        "user_id",
        "rn",
        F.col("a.event_id").alias("p_event_id"),
        F.col("b.event_id").alias("c_event_id"),
        F.col("a.ms").alias("p_ms"),
        F.col("b.ms").alias("c_ms"),
        F.round(F.col("a.value") + F.col("b.value"), 4).alias("pair_value"),
    )


def _tagged_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union purchases (a_val) and clicks (b_val) with null padding.

    The building block of the as-of family: after the union, ``last(x,
    ignorenulls=True)`` over ROWS UNBOUNDED PRECEDING gives, at every event,
    the most recent value of each side — the reference's 'latest' cell.
    """
    a = events_stream(spark, sf_dir, "purchase").select(
        "user_id",
        "ts",
        "event_id",
        "ms",
        F.col("value").alias("a_val"),
        F.lit(None).cast("double").alias("b_val"),
    )
    b = events_stream(spark, sf_dir, "click").select(
        "user_id",
        "ts",
        "event_id",
        "ms",
        F.lit(None).cast("double").alias("a_val"),
        F.col("value").alias("b_val"),
    )
    u = a.unionByName(b)
    return u.select(
        "user_id",
        "ts",
        "event_id",
        "ms",
        "a_val",
        "b_val",
        F.last("a_val", ignorenulls=True).over(w_running()).alias("la"),
        F.last("b_val", ignorenulls=True).over(w_running()).alias("lb"),
    )


@register(
    "op_combine_latest",
    tier="T1",
    doc="On every arrival from either stream, pair with the latest value of "
    "the other [RX:combinelatest]; rows before both sides have emitted are "
    "dropped (Rx contract).",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
         value AS a_val, NULL::DOUBLE AS b_val
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
         NULL::DOUBLE AS a_val, value AS b_val
  FROM events WHERE event_type = 'click'
), x AS (
  SELECT user_id, event_id, ms,
         last_value(a_val IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS la,
         last_value(b_val IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lb
  FROM u
)
SELECT user_id, event_id, ms,
       ROUND(la, 4) AS latest_purchase, ROUND(lb, 4) AS latest_click
FROM x WHERE la IS NOT NULL AND lb IS NOT NULL
""",
)
def op_combine_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _tagged_union(spark, sf_dir)
        .where(F.col("la").isNotNull() & F.col("lb").isNotNull())
        .select(
            "user_id",
            "event_id",
            "ms",
            F.round("la", 4).alias("latest_purchase"),
            F.round("lb", 4).alias("latest_click"),
        )
    )


@register(
    "op_with_latest_from",
    tier="T1",
    doc="Emit on A (purchases) only, joined to the latest B (click) at or "
    "before it [RX:combinelatest/withLatestFrom] — the as-of join.",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
         value AS a_val, NULL::DOUBLE AS b_val
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
         NULL::DOUBLE AS a_val, value AS b_val
  FROM events WHERE event_type = 'click'
), x AS (
  SELECT user_id, event_id, ms, a_val,
         last_value(b_val IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lb
  FROM u
)
SELECT user_id, event_id, ms,
       ROUND(a_val, 4) AS purchase_value, ROUND(lb, 4) AS latest_click
FROM x WHERE a_val IS NOT NULL AND lb IS NOT NULL
""",
)
def op_with_latest_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _tagged_union(spark, sf_dir)
        .where(F.col("a_val").isNotNull() & F.col("lb").isNotNull())
        .select(
            "user_id",
            "event_id",
            "ms",
            F.round("a_val", 4).alias("purchase_value"),
            F.round("lb", 4).alias("latest_click"),
        )
    )


@register(
    "op_take_until",
    tier="T1",
    doc="Elements of A (purchases) strictly before the first element of the "
    "other stream (signups) [RX:takeuntil]; if the other never emits, take "
    "all. The per-key min is a broadcastable aggregate join.",
    oracle="""
WITH s AS (
  SELECT user_id, min(ts) AS s_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
)
SELECT a.user_id, a.event_id, epoch_ms(a.ts) AS ms,
       ROUND(a.value, 4) AS value_r
FROM events a LEFT JOIN s ON a.user_id = s.user_id
WHERE a.event_type = 'purchase' AND (s.s_ts IS NULL OR a.ts < s.s_ts)
""",
)
def op_take_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = events_stream(spark, sf_dir, "purchase")
    s = (
        events_stream(spark, sf_dir, "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    # Per-key firsts are tiny relative to the stream — broadcast them.
    return (
        a.join(F.broadcast(s), "user_id", "left")
        .where(F.col("s_ts").isNull() | (F.col("ts") < F.col("s_ts")))
        .select(
            "user_id", "event_id", "ms", F.round("value", 4).alias("value_r")
        )
    )


@register(
    "op_amb",
    tier="T1",
    doc="Keep only the stream that emits first [RX:amb]: per user, the "
    "purchase vs click stream with the earlier first emission wins "
    "(tie → purchase); all events of the winning stream pass through.",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts,
         min(CASE WHEN event_type = 'click' THEN ts END) AS c_ts
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY user_id
), winner AS (
  SELECT user_id,
         CASE WHEN c_ts IS NULL OR (p_ts IS NOT NULL AND p_ts <= c_ts)
              THEN 'purchase' ELSE 'click' END AS win
  FROM firsts
)
SELECT e.user_id, e.event_type AS src, e.event_id, epoch_ms(e.ts) AS ms
FROM events e JOIN winner w
  ON e.user_id = w.user_id AND e.event_type = w.win
""",
)
def op_amb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scala_reactivex_spark.sources.catalog import table

    both = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    firsts = both.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "p_ts"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "c_ts"
        ),
    )
    winner = firsts.select(
        "user_id",
        F.when(
            F.col("c_ts").isNull()
            | (F.col("p_ts").isNotNull() & (F.col("p_ts") <= F.col("c_ts"))),
            F.lit("purchase"),
        )
        .otherwise(F.lit("click"))
        .alias("win"),
    )
    # Per-key winner table is one row per user — broadcast it. Alias both
    # sides: winner derives from `both`, so this is a self-join.
    e = both.alias("e")
    w = winner.withColumnRenamed("user_id", "w_user").alias("w")
    return e.join(
        F.broadcast(w),
        (F.col("e.user_id") == F.col("w.w_user"))
        & (F.col("e.event_type") == F.col("w.win")),
    ).select(
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("src"),
        F.col("e.event_id").alias("event_id"),
        F.col("e.ms").alias("ms"),
    )


@register(
    "op_switch",
    tier="T1",
    doc="Only the most recent inner stream [RX:switch]: signups are the "
    "outer triggers, clicks the inner elements — every click is owned by "
    "the LATEST signup at or before it (as-of assignment via the union + "
    "last IGNORE NULLS trick); clicks before any signup are dropped "
    "(no inner stream subscribed yet).",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
         event_id AS sig_id, NULL::BIGINT AS clk_id
  FROM events WHERE event_type = 'signup'
  UNION ALL
  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
         NULL::BIGINT AS sig_id, event_id AS clk_id
  FROM events WHERE event_type = 'click'
), x AS (
  SELECT user_id, event_id, ms, clk_id,
         last_value(sig_id IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS owner_sig
  FROM u
)
SELECT user_id, event_id, ms, owner_sig
FROM x WHERE clk_id IS NOT NULL AND owner_sig IS NOT NULL
""",
)
def op_switch(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = events_stream(spark, sf_dir, "signup").select(
        "user_id",
        "ts",
        "event_id",
        "ms",
        F.col("event_id").alias("sig_id"),
        F.lit(None).cast("bigint").alias("clk_id"),
    )
    clk = events_stream(spark, sf_dir, "click").select(
        "user_id",
        "ts",
        "event_id",
        "ms",
        F.lit(None).cast("bigint").alias("sig_id"),
        F.col("event_id").alias("clk_id"),
    )
    u = sig.unionByName(clk).withColumn(
        "owner_sig", F.last("sig_id", ignorenulls=True).over(w_running())
    )
    return u.where(
        F.col("clk_id").isNotNull() & F.col("owner_sig").isNotNull()
    ).select("user_id", "event_id", "ms", "owner_sig")


@register(
    "op_interval_join",
    tier="T1",
    doc="Window join [RX:join]: pair each purchase with every click of the "
    "same user in the preceding 6 hours — each element opens a time window "
    "and joins all elements of the other stream that fall inside it. Equi "
    "key + range predicate → hash join with residual, never a cartesian; "
    "the streaming twin is twin_interval_join (watermarked state).",
    oracle="""
SELECT p.user_id, p.event_id AS p_event_id, c.event_id AS c_event_id,
       epoch_ms(p.ts) AS p_ms, epoch_ms(c.ts) AS c_ms
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 6 HOURS
 AND c.ts <= p.ts
""",
)
def op_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = events_stream(spark, sf_dir, "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.col("ms").alias("p_ms"),
    )
    c = events_stream(spark, sf_dir, "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("c_ts"),
        F.col("ms").alias("c_ms"),
    )
    six_hours_ns = 6 * 3_600 * 1_000_000_000
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - six_hours_ns)
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select("user_id", "p_event_id", "c_event_id", "p_ms", "c_ms")
    )


@register(
    "op_group_join",
    tier="T1",
    doc="groupJoin [RX:groupJoin]: unlike join (op_interval_join), every "
    "LEFT row is emitted exactly once with its window of right matches "
    "AGGREGATED — here each purchase carries the count and first/last "
    "timestamps of the user's clicks in the preceding 6 hours (zero "
    "matches included via left outer join, Rx's empty inner "
    "observable).  Scale shape: the interval join shuffles on user_id "
    "once; the per-left aggregate reuses the same key — no second "
    "corpus pass, no window over the fact table.",
    oracle="""
SELECT p.user_id, p.event_id AS p_event_id, epoch_ms(p.ts) AS p_ms,
       CAST(count(c.event_id) AS BIGINT) AS n_clicks,
       CAST(min(epoch_ms(c.ts)) AS BIGINT) AS first_c_ms,
       CAST(max(epoch_ms(c.ts)) AS BIGINT) AS last_c_ms
FROM events p
LEFT JOIN events c
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 6 HOURS
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.user_id, p.event_id, p.ts
""",
)
def op_group_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = events_stream(spark, sf_dir, "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.col("ms").alias("p_ms"),
    )
    c = events_stream(spark, sf_dir, "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event_id"),
        F.col("ts").alias("c_ts"),
        F.col("ms").alias("c_ms"),
    )
    six_hours_ns = 6 * 3_600 * 1_000_000_000
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - six_hours_ns)
            & (F.col("c_ts") <= F.col("p_ts")),
            "left",
        )
        .groupBy("user_id", "p_event_id", "p_ms")
        .agg(
            F.count("c_event_id").cast("bigint").alias("n_clicks"),
            F.min("c_ms").cast("bigint").alias("first_c_ms"),
            F.max("c_ms").cast("bigint").alias("last_c_ms"),
        )
    )
