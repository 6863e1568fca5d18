"""Source/sink format surface beyond parquet (SURVEY.md §2.1).

The reference has no file formats at all (in-memory streams only); the
engine standardizes on parquet for fixtures but exposes the full
lake-format surface a pipeline needs: CSV and JSON-lines readers with
EXPLICIT schemas (inference is nondeterministic and scans twice — banned),
and partitioned/bucketed writers. Everything is declarative
``spark.read``/``df.write`` so pushdown and pruning behave like the parquet
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scala_reactivex_spark.session import configure_session


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """CSV scan with explicit schema; malformed rows go to the PERMISSIVE
    corrupt-record column instead of failing the job (in-band errors,
    matching the engine's try_* philosophy).

    PERMISSIVE only routes malformed rows if the corrupt-record column is
    PRESENT in the schema — without it they silently become all-null rows,
    so it is appended here (and the reader told its name) whenever the
    caller didn't declare it."""
    configure_session(spark)
    from pyspark.sql.types import StructType

    corrupt_col = "_corrupt_record"
    # Parse the DDL and check actual column NAMES — a substring test would
    # be fooled by e.g. a caller column named "my_corrupt_record".
    if corrupt_col not in [f.name for f in StructType.fromDDL(schema)]:
        schema = f"{schema}, {corrupt_col} STRING"
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines scan with explicit schema (no sampling pass)."""
    configure_session(spark)
    return spark.read.schema(schema).json(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet sink — the layout that makes
    partition pruning work on the read side at 100 TB."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)
