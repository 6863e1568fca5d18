"""Scale machinery: skew salting and bucketed co-located joins.

These are the two knobs SCALING.md points at when a keyed operator meets a
pathological key distribution at 100 TB:

- :func:`salted_sum` — two-level aggregation: explode each hot key into
  ``n_salts`` sub-keys (map-side), aggregate per (key, salt), then merge the
  partials. The per-key decimal partials are exact, so the merged result is
  bit-identical to the direct aggregation — verified by property test.
- :func:`write_bucketed` / :func:`read_bucketed_join` — persist both sides
  of a recurring join bucketed by the join key so the join plans with ZERO
  exchanges (the 100 TB fact-fact join pattern; demonstrated by
  scripts/bucketing_demo.py whose plan excerpt lands in PLANS.md).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import DEC


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    salt_col: str = "event_id",
) -> DataFrame:
    """Skew-proof SUM(value) GROUP BY key via two-level aggregation.

    Level 1 groups on (key, salt) — a hot key's rows spread over
    ``n_salts`` reducers instead of one; level 2 merges the ≤ n_salts
    partials per key.  Decimal partials keep the result exactly equal to
    the direct single-level aggregation regardless of the split.
    """
    salt = (F.col(salt_col) % n_salts).alias("_salt")
    partial = (
        df.select(F.col(key), salt, F.col(value).cast(DEC).alias("_v"))
        .groupBy(key, "_salt")
        .agg(F.sum("_v").alias("_partial"), F.count("*").alias("_n"))
    )
    return partial.groupBy(key).agg(
        F.round(F.sum("_partial").cast("double"), 4).alias("total_value"),
        F.sum("_n").alias("n_events"),
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str | Column,
    n_buckets: int = 8,
    sort_key: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    Both sides of a recurring join written this way are co-partitioned on
    disk — Spark's bucketed scan reports the required hash distribution,
    so the join needs no shuffle at read time (and no sort, if sorted).

    Idempotent: a stale managed-table LOCATION from a previous run (e.g.
    a killed job that dropped the catalog entry but not the directory)
    would fail overwrite with LOCATION_ALREADY_EXISTS, so the table AND
    its leftover directory are cleared first.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # Directory cleanup only for BARE default-database identifiers, where
    # the managed location is warehouse/<name> by construction — a
    # qualified or funky name (db.table, quoting, separators) must not
    # drive an rmtree at a guessed path.
    if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table_name):
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        )
        leftover = os.path.join(
            warehouse.removeprefix("file:"), table_name.lower()
        )
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)


def read_bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two bucketed tables on their bucket keys — exchange-free."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
