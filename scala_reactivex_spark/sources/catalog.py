"""Catalog layer: parquet table access with canonical derived columns.

The fixture schemas are documented in FIXTURES.md; the engine never infers
beyond the parquet footer and normalizes time once, here, so every operator
downstream sees the same deterministic columns:

``events`` (the Observable[T] stand-in, SURVEY.md §1.2):
- ``ts``   bigint — raw nanosecond epoch. Parquet TIMESTAMP(NANOS) fixtures
  read as bigint under ``spark.sql.legacy.parquet.nanosAsLong=true``;
  TIMESTAMP(MICROS) fixtures read as timestamp and are converted to
  bigint ns here (``_normalize_events``). Used as the primary sort
  key together with ``event_id`` (total order — SURVEY.md §2.11.4).
- ``tsm``  timestamp — microsecond truncation (``ts div 1000``), for Spark's
  native time windowing (window / session_window / watermarks).
- ``ms``   bigint — millisecond truncation (``ts div 1_000_000``), the ONLY
  time representation ever emitted in query output (≡ DuckDB ``epoch_ms``).

Scale note: at 100 TB the same loader works over partitioned datasets —
reads are plain ``spark.read.parquet`` so partition pruning / predicate
pushdown apply; no collect, no schema inference pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: The five observed event_type values (FIXTURES.md) — derived streams.
EVENT_TYPES = ("click", "purchase", "error", "signup", "view")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with canonical derived columns."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events(df)
    elif name in _DATE_COLS:
        df = _normalize_dates(df, _DATE_COLS[name])
    return df


#: Date-valued columns whose parquet type has changed between fixture
#: generations (events.ts did in round 6) — pin them to timestamp_ntz so
#: every operator and oracle comparison sees one type regardless of
#: whether the driver ships DATE, TIMESTAMP or TIMESTAMP_NTZ.
_DATE_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def _normalize_dates(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Cast each date-ish column to timestamp_ntz (midnight for DATE,
    same wall clock for TIMESTAMP under the UTC session timezone)."""
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) != "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    """Derive the canonical (ts bigint-ns, tsm timestamp, ms bigint) columns.

    Fixture generations differ in the parquet type of ``ts``: TIMESTAMP(NANOS)
    arrives as bigint under ``nanosAsLong`` (the documented contract), while
    TIMESTAMP(MICROS) arrives as timestamp/timestamp_ntz.  Normalize the
    latter to bigint nanoseconds so every downstream operator (and the
    streaming twins' BIGINT state schemas) sees one representation.  The
    NTZ→instant cast happens under the UTC session timezone
    (configure_session), matching DuckDB's naive-timestamp ``epoch_ms``.
    """
    if dict(df.dtypes)["ts"] != "bigint":
        df = df.withColumn(
            "ts",
            (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                "bigint"
            ),
        )
    # Integer division keeps the full int64 — ns values (~1.7e18) exceed
    # double's 53-bit mantissa, so a float path would corrupt timestamps.
    return df.withColumn(
        "tsm", F.timestamp_micros(F.expr("ts div 1000"))
    ).withColumn("ms", F.expr("ts div 1000000"))


def widen_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Scale-ADAPTIVE scan widening for per-row-expensive pipelines
    (optimization guide §2: derive partitioning from the input, never a
    constant).

    The fixture tables are single parquet files with one row group, so a
    scan yields 1-3 partitions and every downstream per-row stage (hash
    folds, Expand, explode, aggregate buffers) runs on ONE core of the
    local[N] box regardless of N.  At 100 TB the same scan has thousands
    of row groups and needs no help — so this helper round-robins the
    rows across ``defaultParallelism`` partitions ONLY when the scan
    itself produced fewer, and is a no-op otherwise.  The repartition is
    an explicit-N shuffle (AQE never coalesces REPARTITION_BY_NUM), and
    the caller is expected to ``select()`` down to the needed columns
    FIRST so the widening exchange moves the minimum bytes (guide §2.3).
    Because the trigger is the measured scan partition count, the
    driver's lower-core bench run widens to ITS parallelism, keeping the
    core-scaling measurement honest.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (canonical derived
    columns included), so users can drive the engine with raw
    ``spark.sql`` — the same table names the DuckDB oracles use.  Views
    are lazy: registration costs one footer read per table, and Catalyst
    still pushes filters/prunes columns through them (asserted in
    tests/test_api.py)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (used by bench / exploratory sessions)."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def events_stream(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    """A derived stream: ``events`` filtered to one event_type.

    These model the reference's independently subscribable Observables
    (purchases/clicks/signups/errors/views) used by combinator operators.
    """
    return table(spark, sf_dir, "events").where(F.col("event_type") == event_type)
