"""Salted two-level escape hatches (operators/salted.py): each hatch
must equal its single-window twin row-for-row — on the fixture corpus
AND on a synthetic hot-key corpus where one user holds 60% of the rows
(the distribution the hatch exists for).  Chunk-boundary stitching is
the sharp edge: a wrong boundary shows up as a missing/extra row at a
chunk's first or last element."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import registry

PAIRS = [
    ("op_scan_running_sum", "op_scan_running_sum_salted"),
    ("op_pairwise", "op_pairwise_salted"),
    ("op_distinct_until_changed", "op_distinct_until_changed_salted"),
    ("op_debounce", "op_debounce_salted"),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("base,salted", PAIRS)
def test_salted_equals_base_on_fixture(spark, sf_dir, base, salted):
    specs = registry()
    got = _rows(specs[salted].fn(spark, sf_dir))
    want = _rows(specs[base].fn(spark, sf_dir))
    assert got == want and got


@pytest.mark.parametrize("base,salted", PAIRS)
def test_salted_equals_base_on_hot_key(
    spark, tmp_path, base, salted
):
    """60% of rows on user 1, including repeated timestamps ON chunk
    boundaries (ts strides make many equal-ts runs) — the distribution
    that binds the single-window plan and stresses the time-range
    chunking's equal-ts invariant."""
    n = 4000
    base_ns = 1_700_000_000_000_000_000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            # Repeated ts values (id div 3) so equal-ts ties cross the
            # would-be boundary if chunking were row-based.
            (
                F.lit(base_ns)
                + (F.col("id") / 3).cast("bigint") * 600_000_000_000
            ).alias("ts"),
            F.when(F.col("id") % 10 < 6, 1)
            .otherwise(F.col("id") % 97)
            .cast("bigint")
            .alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias(
                "event_type"
            ),
            ((F.col("id") * 37 % 1000) / 10.0).alias("value"),
            F.lit("p").alias("props"),
        )
    )
    src = str(tmp_path / "hot")
    ev.write.parquet(f"{src}/events.parquet")
    specs = registry()
    got = _rows(specs[salted].fn(spark, src))
    want = _rows(specs[base].fn(spark, src))
    assert got == want and got
