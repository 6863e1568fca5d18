"""Stateless element-wise operators (SURVEY.md §2.2).

Reference surface: map [RX:map], filter [RX:filter], flatMap [RX:flatmap],
materialize [RX:materialize], onErrorReturn/catch [RX:catch], delay
[RX:delay], timestamp/timeInterval [RX:timestamp].

Spark-first design: every operator here is a narrow projection/filter —
no shuffle, fully inside whole-stage codegen, and filters/projections push
down into the parquet scan.  Error semantics use ``try_*`` expressions so
failures become in-band data (the Rx ``onError`` channel as a column) instead
of task aborts — ANSI-mode safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.order import w_user
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

@register(
    "op_map",
    tier="T0",
    doc="Per-element projection [RX:map].",
    oracle="""
SELECT event_id, epoch_ms(ts) AS ms,
       ROUND(value * (1 - 0.1), 4) AS discounted
FROM events
""",
)
def op_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Expression text matches the oracle so constant folding yields
    # bit-identical doubles on both engines.
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ms"),
        F.expr("ROUND(value * (1 - 0.1), 4)").alias("discounted"),
    )


@register(
    "op_filter",
    tier="T0",
    doc="Keep elements satisfying a predicate [RX:filter]; pushes to scan.",
    oracle="""
SELECT event_id, user_id, epoch_ms(ts) AS ms, ROUND(value, 4) AS value_r
FROM events
WHERE event_type = 'purchase' AND value > 100
""",
)
def op_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & (F.col("value") > 100))
        .select("event_id", "user_id", "ms", F.round("value", 4).alias("value_r"))
    )


@register(
    "op_flatmap",
    tier="T1",
    doc="Map each element to a sub-stream and flatten [RX:flatmap].",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
""",
)
def op_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode() is a generator inside codegen — the flatten never touches
    # the driver and parallelism follows the input partitioning.
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


@register(
    "op_materialize",
    tier="T1",
    doc="Reify onNext/onError as data [RX:materialize]: the error channel "
    "becomes a (kind, value, error) wide row via try_-casts.",
    oracle="""
SELECT event_id,
       CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
                 IS NOT NULL THEN 'next' ELSE 'error' END AS kind,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
                 IS NULL THEN 'missing_k' END AS error
FROM events
""",
)
def op_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.when(k.isNotNull(), F.lit("next")).otherwise(F.lit("error")).alias("kind"),
        k.alias("k_value"),
        F.when(k.isNull(), F.lit("missing_k")).alias("error"),
    )


@register(
    "op_error_return",
    tier="T1",
    doc="Replace failure with a fallback value [RX:catch]: try_divide + "
    "coalesce keeps div-by-zero/missing-key failures in-band.",
    oracle="""
SELECT event_id,
       floor(COALESCE(value / NULLIF(TRY_CAST(
           json_extract_string(props, '$.k') AS INTEGER), 0), -1.0)
           * 10000 + 0.5) / 10000 AS safe_ratio
FROM events
""",
)
def op_error_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Manual half-up rounding in pure IEEE ops (floor(q*1e4+0.5)/1e4):
    # value is 2-dp data, so value/k lands EXACTLY on 4-dp ties (e.g.
    # 0.95125) where Spark's decimal-repr HALF_UP and DuckDB's binary
    # rounding disagree — arithmetic-only rounding is bit-identical.
    q = F.coalesce(
        F.expr(
            "try_divide(value, try_cast(get_json_object(props, '$.k')"
            " AS INT))"
        ),
        F.lit(-1.0),
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        (F.floor(q * 10000 + 0.5) / 10000).alias("safe_ratio"),
    )


@register(
    "op_delay",
    tier="T1",
    doc="Shift emission time by a fixed duration [RX:delay].",
    oracle="""
SELECT event_id, epoch_ms(ts + INTERVAL 1 HOUR) AS delayed_ms
FROM events
""",
)
def op_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis(F.col("tsm") + F.expr("INTERVAL 1 HOUR")).alias("delayed_ms"),
    )


@register(
    "op_time_interval",
    tier="T1",
    doc="Attach time delta to the previous element [RX:timestamp]: "
    "per-user lag over the (ts, event_id) total order.",
    oracle="""
SELECT event_id, user_id, epoch_ms(ts) AS ms,
       epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS delta_ms
FROM events
""",
)
def op_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ms",
        (F.col("ms") - F.lag("ms").over(w_user())).alias("delta_ms"),
    )


def ignore_elements(df: DataFrame) -> DataFrame:
    """Drop every element, keep only the terminal signal [RX:ignoreelements]
    (SURVEY §2.2 no-query row).

    Rx semantics require SUBSCRIBING upstream: side effects run and an
    upstream error still reaches the terminal channel. ``limit(0)`` /
    ``where(lit(False))`` would NOT do that — Catalyst's OptimizeLimitZero
    and PruneFilters fold deterministic always-empty plans to an empty
    relation, and (Spark 4) even ``rand() < -1`` is range-folded to false.
    Instead: aggregate upstream to a 1-row count (upstream executes exactly
    ONCE, its filters — where this engine keeps its guards — included),
    filter on ``count < 0`` (unfoldable: the value is runtime data), and
    re-project the original column names as typed nulls. Net: zero rows,
    upstream's terminal signal (completion or error) preserved."""
    counted = df.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    return counted.where(F.col("_n") < 0).select(
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
    )
