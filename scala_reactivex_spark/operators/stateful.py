"""Ordered-stream stateful operators (SURVEY.md §2.3) — the heart of Rx.

Reference surface: scan [RX:scan], reduce [RX:reduce], pairwise
[RX:buffer variant], distinct [RX:distinct], distinctUntilChanged
[RX:distinct], take [RX:take], takeWhile [RX:takewhile], first/last/elementAt
[RX:first], buffer(n) [RX:buffer], toList/collect [RX:to].

Spark-first design: the reference's per-subscription mutable state becomes
window functions over the per-user event-time total order
``(ts, event_id)`` — state is re-expressed as a frame over ordered data, so
each user's stream evaluates independently (partition-parallel, one shuffle
on user_id, no driver state).  Running double sums go through DECIMAL so the
fold is order-exact (functions/determinism.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import DEC, davg, dsum
from scala_reactivex_spark.functions.order import w_running, w_user, w_user_desc
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

BUFFER_N = 10  # SURVEY.md §2 parameter constants
TAKE_N = 5


@register(
    "op_scan_running_sum",
    tier="T0",
    doc="Running fold emitting every intermediate [RX:scan]: per-user "
    "cumulative sum over the (ts, event_id) order.",
    oracle="""
SELECT user_id, event_id, epoch_ms(ts) AS ms,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
           AS running_sum
FROM events
""",
)
def op_scan_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ms",
        F.round(
            F.sum(F.col("value").cast(DEC)).over(w_running()).cast("double"), 4
        ).alias("running_sum"),
    )


@register(
    "op_reduce",
    tier="T0",
    doc="Fold emitting only the final value [RX:reduce]: per-user total.",
    oracle="""
SELECT user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS total_value,
       count(*) AS n_events
FROM events
GROUP BY user_id
""",
)
def op_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(dsum("value").alias("total_value"), F.count("*").alias("n_events"))
    )


@register(
    "op_pairwise",
    tier="T1",
    doc="Emit (previous, current) pairs [RX:buffer variant / pairwise].",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
         ROUND(value, 4) AS cur_value,
         ROUND(lag(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 4) AS prev_value
  FROM events
)
SELECT user_id, event_id, ms, prev_value, cur_value
FROM x WHERE prev_value IS NOT NULL
""",
)
def op_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "ms",
            F.round(F.lag("value").over(w_user()), 4).alias("prev_value"),
            F.round("value", 4).alias("cur_value"),
        )
        .where(F.col("prev_value").isNotNull())
    )


@register(
    "op_distinct",
    tier="T1",
    doc="First occurrence per key [RX:distinct]: keySelector = "
    "(user_id, event_type), first in event-time order.",
    oracle="""
WITH x AS (
  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ms,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_type, event_id, ms FROM x WHERE rn = 1
""",
)
def op_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ms")
    )


@register(
    "op_distinct_until_changed",
    tier="T0",
    doc="Drop elements equal to their predecessor [RX:distinct]: keep rows "
    "whose event_type differs from the previous one in the user's stream.",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT user_id, event_id, ms, event_type
FROM x WHERE prev_type IS NULL OR event_type <> prev_type
""",
)
def op_distinct_until_changed(spark: SparkSession, sf_dir: str) -> DataFrame:
    prev = F.lag("event_type").over(w_user())
    return (
        table(spark, sf_dir, "events")
        .withColumn("prev_type", prev)
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_id", "ms", "event_type")
    )


@register(
    "op_take",
    tier="T1",
    doc="First n elements per stream [RX:take], n=5.",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_id, ms, event_type FROM x WHERE rn <= 5
""",
)
def op_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w_user()))
        .where(F.col("rn") <= TAKE_N)
        .select("user_id", "event_id", "ms", "event_type")
    )


@register(
    "op_take_while",
    tier="T1",
    doc="Prefix while predicate holds [RX:takewhile]: p = event_type <> "
    "'error'; rank-based so ties at identical timestamps stay exact.",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), y AS (
  SELECT *, min(CASE WHEN event_type = 'error' THEN rn END)
             OVER (PARTITION BY user_id) AS first_err_rn
  FROM x
)
SELECT user_id, event_id, ms, event_type
FROM y WHERE first_err_rn IS NULL OR rn < first_err_rn
""",
)
def op_take_while(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = table(spark, sf_dir, "events").withColumn(
        "rn", F.row_number().over(w_user())
    )
    first_err = F.min(
        F.when(F.col("event_type") == "error", F.col("rn"))
    ).over(Window.partitionBy("user_id"))
    return (
        x.withColumn("first_err_rn", first_err)
        .where(F.col("first_err_rn").isNull() | (F.col("rn") < F.col("first_err_rn")))
        .select("user_id", "event_id", "ms", "event_type")
    )


@register(
    "op_first_last",
    tier="T1",
    doc="Positional selection per stream [RX:first]: first, last and "
    "elementAt(3) per user, in one grouped pass.",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id,
       max(CASE WHEN rn_a = 1 THEN event_id END) AS first_event_id,
       max(CASE WHEN rn_a = 1 THEN ms END) AS first_ms,
       max(CASE WHEN rn_d = 1 THEN event_id END) AS last_event_id,
       max(CASE WHEN rn_d = 1 THEN ms END) AS last_ms,
       max(CASE WHEN rn_a = 3 THEN event_id END) AS third_event_id
FROM x GROUP BY user_id
""",
)
def op_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ms",
        F.row_number().over(w_user()).alias("rn_a"),
        F.row_number().over(w_user_desc()).alias("rn_d"),
    )
    pick = lambda cond, col: F.max(F.when(cond, F.col(col)))  # noqa: E731
    return x.groupBy("user_id").agg(
        pick(F.col("rn_a") == 1, "event_id").alias("first_event_id"),
        pick(F.col("rn_a") == 1, "ms").alias("first_ms"),
        pick(F.col("rn_d") == 1, "event_id").alias("last_event_id"),
        pick(F.col("rn_d") == 1, "ms").alias("last_ms"),
        pick(F.col("rn_a") == 3, "event_id").alias("third_event_id"),
    )


@register(
    "op_buffer_count",
    tier="T1",
    doc="Chop the stream into fixed-size count buffers [RX:buffer], n=10; "
    "emit per-buffer aggregates.",
    oracle="""
WITH x AS (
  SELECT user_id, value,
         CAST(floor((row_number() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) - 1) / 10) AS BIGINT) AS bucket
  FROM events
)
SELECT user_id, bucket, count(*) AS n_in_buffer,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS buffer_sum
FROM x GROUP BY user_id, bucket
""",
)
def op_buffer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = table(spark, sf_dir, "events").withColumn(
        "bucket",
        F.floor((F.row_number().over(w_user()) - 1) / BUFFER_N).cast("bigint"),
    )
    return x.groupBy("user_id", "bucket").agg(
        F.count("*").alias("n_in_buffer"), dsum("value").alias("buffer_sum")
    )


@register(
    "op_collect_sorted",
    tier="T2",
    doc="Gather stream elements into a collection [RX:to]: per "
    "(user, event_type) the ordered id list, emitted as a CSV string so the "
    "value hash is representation-stable across engines.",
    oracle="""
SELECT user_id, event_type,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS ids,
       count(*) AS n
FROM events
GROUP BY user_id, event_type
""",
)
def op_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(event_id)),"
                " x -> cast(x AS STRING)), ',')"
            ).alias("ids"),
            F.count("*").alias("n"),
        )
    )


@register(
    "op_stats_battery",
    tier="T1",
    doc="Mathematical aggregate battery per user [RX:average]: avg via "
    "exact decimal sum ÷ count (order-independent).",
    oracle="""
SELECT user_id,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(value), 4) AS avg_value,
       ROUND(min(value), 4) AS min_value,
       ROUND(max(value), 4) AS max_value
FROM events
GROUP BY user_id
""",
)
def op_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            davg("value").alias("avg_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )


@register(
    "op_skip",
    tier="T1",
    doc="Drop the first n elements per stream [RX:skip], n=5 — the "
    "complement of op_take (same rank pass, inverted predicate).",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, event_id, ms, event_type FROM x WHERE rn > 5
""",
)
def op_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w_user()))
        .where(F.col("rn") > TAKE_N)
        .select("user_id", "event_id", "ms", "event_type")
    )


SLIDE_COUNT = 4  # elements per sliding buffer
SLIDE_SKIP = 2  # new buffer starts every SKIP elements


@register(
    "op_buffer_slide",
    tier="T1",
    doc="buffer(count, skip) [RX:buffer]: OVERLAPPING count-based "
    f"buffers — a new {SLIDE_COUNT}-element buffer opens every "
    f"{SLIDE_SKIP} elements, so each element belongs to up to "
    f"{SLIDE_COUNT // SLIDE_SKIP} buffers (completes the buffer "
    "family next to the partitioning op_buffer_count).  Covering "
    "buffer ids come from a per-row integer sequence (all operands "
    "non-negative, so Spark DIV ≡ DuckDB // exactly); partial tail "
    "buffers are kept, matching Rx.  Scale shape: one rank window on "
    "the per-user order the engine already standardizes, a bounded "
    "explode (×2), one hash aggregate.",
    oracle=f"""
WITH x AS (
  SELECT user_id, epoch_ms(ts) AS ms,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS r
  FROM events
), e AS (
  SELECT user_id, ms,
         unnest(range(
           CASE WHEN r <= {SLIDE_COUNT} THEN 0
                ELSE (r - {SLIDE_COUNT - 1}) // {SLIDE_SKIP} END,
           (r - 1) // {SLIDE_SKIP} + 1)) AS buffer_id
  FROM x
)
SELECT user_id, CAST(buffer_id AS BIGINT) AS buffer_id,
       CAST(count(*) AS BIGINT) AS n_in_buffer,
       CAST(min(ms) AS BIGINT) AS first_ms,
       CAST(max(ms) AS BIGINT) AS last_ms
FROM e GROUP BY user_id, buffer_id
""",
)
def op_buffer_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = table(spark, sf_dir, "events").select(
        "user_id",
        "ms",
        F.row_number().over(w_user()).alias("r"),
    )
    lo = F.expr(
        f"CASE WHEN r <= {SLIDE_COUNT} THEN 0"
        f" ELSE (r - {SLIDE_COUNT - 1}) DIV {SLIDE_SKIP} END"
    )
    hi = F.expr(f"(r - 1) DIV {SLIDE_SKIP}")
    e = x.select(
        "user_id",
        "ms",
        F.explode(F.sequence(lo, hi)).alias("buffer_id"),
    )
    return e.groupBy(
        "user_id", F.col("buffer_id").cast("bigint").alias("buffer_id")
    ).agg(
        F.count("*").cast("bigint").alias("n_in_buffer"),
        F.min("ms").cast("bigint").alias("first_ms"),
        F.max("ms").cast("bigint").alias("last_ms"),
    )


TAKE_LAST_N = 5


@register(
    "op_take_last",
    tier="T1",
    doc=f"takeLast(n)/skipLast boundary [RX:takeLast]: the LAST "
    f"{TAKE_LAST_N} elements of each per-user stream, tagged with "
    "their tail position (1 = final element) — the complement of "
    "op_take/op_skip, which cover the head side.  A descending rank "
    "over the SAME (ts, event_id) total order; rows outside the tail "
    "are exactly Rx's skipLast output, so one rank covers both "
    "operators.  Scale shape: one window on the standard per-user "
    "partitioning — no extra shuffle.",
    oracle=f"""
WITH x AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM events
)
SELECT user_id, event_id, ms, event_type,
       CAST(rd AS BIGINT) AS tail_pos
FROM x WHERE rd <= {TAKE_LAST_N}
""",
)
def op_take_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .withColumn("rd", F.row_number().over(w_user_desc()))
        .where(F.col("rd") <= TAKE_LAST_N)
        .select(
            "user_id",
            "event_id",
            "ms",
            "event_type",
            F.col("rd").cast("bigint").alias("tail_pos"),
        )
    )


@register(
    "op_window_toggle",
    tier="T1",
    doc="window(openings, closings) [RX:window]: per user, a window "
    "OPENS at each signup event and CLOSES at the first error strictly "
    "after it; every event is assigned to the most recent open window "
    "whose close it precedes (as-of opening via last-ignorenulls on "
    "one partitioned order, close via a per-window min over the "
    "window-id key).  Events before the first signup or after their "
    "window's close fall outside every window — dropped, matching Rx. "
    " Scale shape: both window passes ride the per-user shuffle; the "
    "close lookup joins on the (user, window) key.",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS ms, event_type,
         max(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS win_open
  FROM events
), c AS (
  SELECT user_id, win_open, min(ts) AS win_close
  FROM o WHERE event_type = 'error' AND ts > win_open
  GROUP BY user_id, win_open
)
SELECT o.user_id, CAST(epoch_ms(o.win_open) AS BIGINT) AS window_ms,
       o.event_id, o.ms, o.event_type
FROM o LEFT JOIN c
  ON o.user_id = c.user_id AND o.win_open = c.win_open
WHERE o.win_open IS NOT NULL
  AND (c.win_close IS NULL OR o.ts <= c.win_close)
""",
)
def op_window_toggle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    o = ev.withColumn(
        "win_open",
        F.max(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).over(w),
    )
    c = (
        o.where(
            (F.col("event_type") == "error")
            & (F.col("ts") > F.col("win_open"))
        )
        .groupBy("user_id", "win_open")
        .agg(F.min("ts").alias("win_close"))
    )
    return (
        o.join(c, ["user_id", "win_open"], "left")
        .where(
            F.col("win_open").isNotNull()
            & (
                F.col("win_close").isNull()
                | (F.col("ts") <= F.col("win_close"))
            )
        )
        .select(
            "user_id",
            F.expr("CAST(win_open DIV 1000000 AS BIGINT)").alias(
                "window_ms"
            ),
            "event_id",
            "ms",
            "event_type",
        )
    )
