"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``scala_reactivex_spark.plans.registry``): every operator module registers
its (query, oracle) pair with one decorator, and this file re-exports the
registry in the driver's shape.  See SURVEY.md §2 for the inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from scala_reactivex_spark.plans.registry import all_oracles, all_queries

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from scala_reactivex_spark.operators.relational import rel_q1_pricing

    return rel_q1_pricing(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys → rows-only check."""
    return all_oracles()
