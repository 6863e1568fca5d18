"""Creation / source operators (SURVEY.md §2.1).

Reference surface: the Rx creation family — ``range``/``just``/``from``
[RX:range], ``interval`` [RX:interval], plus stream materialization from
storage [RS:1.1].  (Reference mount is empty — SURVEY.md §0 — so citations
use the public ReactiveX/reactive-streams spec notation from the survey.)

Spark-first design: sources are declarative scans (``spark.read.parquet``,
``spark.range``, ``sequence()+explode``) so Catalyst applies column pruning
and predicate pushdown; nothing is generated driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table


@register(
    "src_scan_events",
    tier="T0",
    doc="Materialize a stream from storage; sanity stats [RS:1.1].",
    oracle="""
SELECT count(*) AS n_events,
       min(event_id) AS min_id,
       max(event_id) AS max_id
FROM events
""",
)
def src_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@register(
    "src_range",
    tier="T1",
    doc="Emit a finite integer sequence as a stream [RX:range].",
    # CAST pins DuckDB's HUGEINT (int128) sum back to BIGINT so the value
    # representation matches Spark's LongType (determinism convention §2.11:
    # type-pin every computed column).  Round-1 hash fail was exactly this.
    oracle=(
        "SELECT count(*) AS n, CAST(sum(i) AS BIGINT) AS total "
        "FROM range(1, 101) t(i)"
    ),
)
def src_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spark.range is a distributed source (splittable), not a driver loop.
    return spark.range(1, 101).agg(
        F.count("*").alias("n"), F.sum("id").alias("total")
    )


@register(
    "src_interval",
    tier="T1",
    doc="Emit ticks at a fixed period [RX:interval]; batch twin of rate source.",
    oracle="""
SELECT epoch_ms(ts) AS tick_ms
FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-30',
                     INTERVAL 1 DAY) t(ts)
""",
)
def src_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequence() + explode generates JVM-side; the streaming twin is
    # spark.readStream.format("rate") (see streaming/twins.py).
    return spark.sql(
        """
        SELECT unix_millis(tick) AS tick_ms
        FROM (
          SELECT explode(sequence(TIMESTAMP '2024-01-01',
                                  TIMESTAMP '2024-01-30',
                                  INTERVAL 1 DAY)) AS tick
        )
        """
    )
