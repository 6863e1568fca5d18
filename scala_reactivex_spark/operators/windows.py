"""Time-based windowing & rate operators (SURVEY.md §2.4).

Reference surface: buffer(time)/window(time[, slide]) [RX:window], debounce
[RX:debounce], throttleFirst/sample [RX:sample], session grouping (debounce
family).  Parameter constants fixed by SURVEY.md §2: TUMBLE=1 day,
WIDTH=2 days/SLIDE=1 day, SESSION_GAP=2 hours, DEBOUNCE_GAP=2 hours,
THROTTLE=6 hours.

Spark-first design: tumbling/sliding/session windows are the native
``window()`` / ``session_window()`` grouping expressions (hash aggregate
with map-side partials — one shuffle); debounce/throttle/sample are
lead/lag/row_number over the per-user order (one shuffle on user_id).
All time math on the raw int64 nanosecond column stays exact; emitted time
is epoch-ms (catalog convention).  Streaming twins in streaming/twins.py use
the same expressions over readStream with watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import dsum
from scala_reactivex_spark.functions.order import w_user
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

NS_PER_HOUR = 3_600 * 1_000_000_000
DEBOUNCE_NS = 2 * NS_PER_HOUR
THROTTLE_NS = 6 * NS_PER_HOUR


@register(
    "op_window_tumbling",
    tier="T0",
    doc="Non-overlapping 1-day time buckets [RX:window]: native window() "
    "grouping; bucket start emitted as epoch-ms.",
    oracle="""
SELECT epoch_ms(date_trunc('day', ts)) AS bucket_ms, event_type,
       count(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS total_value
FROM events
GROUP BY 1, 2
""",
)
def op_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("tsm", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.unix_millis("w.start").alias("bucket_ms"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "op_window_sliding",
    tier="T1",
    doc="Overlapping windows [RX:window]: width 2 days, slide 1 day — each "
    "event lands in exactly 2 windows. Oracle self-expands via unnest of the "
    "two covering window starts.",
    oracle="""
WITH x AS (
  SELECT unnest([epoch_ms(date_trunc('day', ts)) - 86400000,
                 epoch_ms(date_trunc('day', ts))]) AS ws_ms,
         event_type, value
  FROM events
)
SELECT ws_ms, event_type, count(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS total_value
FROM x GROUP BY ws_ms, event_type
""",
)
def op_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("tsm", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.unix_millis("w.start").alias("ws_ms"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "op_window_session",
    tier="T1",
    doc="Gap-delimited activity bursts per user [RX:debounce grouping]: "
    "native session_window(gap=2h). Spark session = [start, last_ts + gap), "
    "so the oracle's gaps-and-islands split uses >= (verified in SURVEY.md "
    "§7 hard-parts).",
    oracle="""
WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 2 HOURS
              THEN 1 ELSE 0 END AS new_session
  FROM events
), y AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM x
)
SELECT user_id, min(epoch_ms(ts)) AS session_start_ms,
       count(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS session_sum
FROM y GROUP BY user_id, sid
""",
)
def op_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.session_window("tsm", "2 hours").alias("w"), "user_id")
        .agg(
            F.min("ms").alias("session_start_ms"),
            F.count("*").alias("n_events"),
            dsum("value").alias("session_sum"),
        )
        .select("user_id", "session_start_ms", "n_events", "session_sum")
    )


@register(
    "op_debounce",
    tier="T1",
    doc="Emit only if no newer element arrives within the gap [RX:debounce]: "
    "keep rows whose successor is >= 2h away (exact int64 ns math).",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
         ROUND(value, 4) AS value_r,
         epoch_ns(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
             - epoch_ns(ts) AS gap_ns
  FROM events
)
SELECT user_id, event_id, ms, event_type, value_r
FROM x WHERE gap_ns IS NULL OR gap_ns >= 7200000000000
""",
)
def op_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap = F.lead("ts").over(w_user()) - F.col("ts")
    return (
        table(spark, sf_dir, "events")
        .withColumn("gap_ns", gap)
        .where(F.col("gap_ns").isNull() | (F.col("gap_ns") >= DEBOUNCE_NS))
        .select(
            "user_id",
            "event_id",
            "ms",
            "event_type",
            F.round("value", 4).alias("value_r"),
        )
    )


def _bucketed(spark: SparkSession, sf_dir: str, desc: bool) -> DataFrame:
    """First/last element per (user, fixed 6h period) — throttle/sample core.

    Bucketing is integer division on the raw ns epoch — no timezone, no
    calendar, identical on both engines; rank within bucket uses the total
    order (ts, event_id).
    """
    df = table(spark, sf_dir, "events").withColumn(
        "bucket", F.expr(f"ts div {THROTTLE_NS}")
    )
    order = (
        [F.col("ts").desc(), F.col("event_id").desc()]
        if desc
        else [F.col("ts"), F.col("event_id")]
    )
    w = Window.partitionBy("user_id", "bucket").orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "bucket",
            "event_id",
            "ms",
            F.round("value", 4).alias("value_r"),
        )
    )


@register(
    "op_throttle_first",
    tier="T1",
    doc="First element per 6h period [RX:sample/throttleFirst].",
    oracle="""
WITH x AS (
  SELECT user_id, epoch_ns(ts) // 21600000000000 AS bucket, event_id,
         epoch_ms(ts) AS ms, ROUND(value, 4) AS value_r,
         row_number() OVER (
             PARTITION BY user_id, epoch_ns(ts) // 21600000000000
             ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, bucket, event_id, ms, value_r FROM x WHERE rn = 1
""",
)
def op_throttle_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bucketed(spark, sf_dir, desc=False)


@register(
    "op_sample",
    tier="T1",
    doc="Last element per 6h period [RX:sample].",
    oracle="""
WITH x AS (
  SELECT user_id, epoch_ns(ts) // 21600000000000 AS bucket, event_id,
         epoch_ms(ts) AS ms, ROUND(value, 4) AS value_r,
         row_number() OVER (
             PARTITION BY user_id, epoch_ns(ts) // 21600000000000
             ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, bucket, event_id, ms, value_r FROM x WHERE rn = 1
""",
)
def op_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bucketed(spark, sf_dir, desc=True)


@register(
    "op_timeout_flag",
    tier="T1",
    doc="Flag gaps exceeding a duration [RX:timeout]: marks stretches where "
    "the successor is > 12h away (timeout markers as data, not exceptions).",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
         epoch_ns(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
             - epoch_ns(ts) AS gap_ns
  FROM events
)
SELECT user_id, event_id, ms,
       CAST(gap_ns // 1000000 AS BIGINT) AS gap_ms
FROM x WHERE gap_ns > 43200000000000
""",
)
def op_timeout_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    gap = F.lead("ts").over(w_user()) - F.col("ts")
    return (
        table(spark, sf_dir, "events")
        .withColumn("gap_ns", gap)
        .where(F.col("gap_ns") > 12 * NS_PER_HOUR)
        .select(
            "user_id",
            "event_id",
            "ms",
            F.expr("gap_ns div 1000000").cast("bigint").alias("gap_ms"),
        )
    )


TOPK_WINDOW_K = 3
TOPK_SALT = 16


@register(
    "rel_topk_window",
    tier="T2",
    doc="Per-window heavy hitters: top-3 spenders per 1-day tumbling "
    "bucket (purchases only), ranked on (rounded spend DESC, user_id). "
    "Scale shape: the (bucket, user) aggregate map-side combines, then "
    "top-k runs TWO-PHASE — rank within (bucket, user_id %% 16) salt "
    "groups keeping ≤k each, then rank the ≤16k survivors per bucket — "
    "so no reducer ever sorts a whole day's users (the per-day window "
    "sort is the straggler at 100 TB; every salt's top-k contains every "
    "global top-k member of that salt, so the result is identical). "
    "Live twin: streaming/twins.py twin_topk_window.",
    oracle="""
WITH g AS (
  SELECT epoch_ms(date_trunc('day', ts)) AS bucket_ms, user_id,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
             AS spend,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket_ms
                               ORDER BY spend DESC, user_id) AS rnk
  FROM g
)
SELECT bucket_ms, user_id, spend, n, rnk FROM r WHERE rnk <= 3
""",
)
def rel_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.window("tsm", "1 day").alias("w"), "user_id")
        .agg(dsum("value").alias("spend"), F.count("*").alias("n"))
        .select(
            F.unix_millis("w.start").alias("bucket_ms"),
            "user_id",
            "spend",
            "n",
        )
    )
    # Phase 1: top-k inside each (bucket, salt) slice — bounded sorts.
    wsalt = Window.partitionBy(
        "bucket_ms", F.col("user_id") % TOPK_SALT
    ).orderBy(F.col("spend").desc(), "user_id")
    survivors = (
        g.withColumn("srnk", F.row_number().over(wsalt))
        .where(F.col("srnk") <= TOPK_WINDOW_K)
        .drop("srnk")
    )
    # Phase 2: final rank over ≤ salt·k rows per bucket.
    wb = Window.partitionBy("bucket_ms").orderBy(
        F.col("spend").desc(), "user_id"
    )
    return (
        survivors.withColumn("rnk", F.row_number().over(wb))
        .where(F.col("rnk") <= TOPK_WINDOW_K)
        .select("bucket_ms", "user_id", "spend", "n", "rnk")
    )
