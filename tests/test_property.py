"""Hypothesis property tests (SURVEY.md §5.3) — the engine's analogue of
the reference's ScalaCheck suites.

Each property generates a random small event stream, runs the ENGINE
formulation (window functions over a DataFrame) and an independent pure-
Python reference fold of the Rx semantics, and requires exact agreement.
This is the strongest parity signal with the reference's law-based test
style: same laws, randomized inputs, two independent implementations.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# One user's stream: (ts_ns, event_type, value); event_id = index.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**7),
        st.sampled_from(["click", "purchase", "error"]),
        st.integers(min_value=0, max_value=1000),
    ),
    min_size=0,
    max_size=40,
)

SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    data = [
        (i, int(ts), et, float(v), 0)
        for i, (ts, et, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts long, event_type string, value double, "
        "user_id long"
    )


def _ordered(rows):
    return sorted(
        ((int(ts), i, et, v) for i, (ts, et, v) in enumerate(rows)),
    )


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_scan_matches_pure_fold(spark, rows):
    """scan [RX:scan]: engine running sum == pure left fold, elementwise."""
    df = _df(spark, rows)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r.event_id: r.s
        for r in df.select(
            "event_id", F.sum("value").over(w).alias("s")
        ).collect()
    }
    acc = 0.0
    expected = {}
    for ts, i, et, v in _ordered(rows):
        acc += v
        expected[i] = acc
    assert got == expected


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_distinct_until_changed_matches_pure(spark, rows):
    """distinctUntilChanged [RX:distinct]: keep iff type differs from
    predecessor in event-time order."""
    df = _df(spark, rows)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = {
        r.event_id
        for r in df.withColumn("p", F.lag("event_type").over(w))
        .where(F.col("p").isNull() | (F.col("p") != F.col("event_type")))
        .collect()
    }
    expected, last = set(), object()
    for ts, i, et, v in _ordered(rows):
        if et != last:
            expected.add(i)
            last = et
    assert got == expected


@given(rows=events_strategy, gap=st.integers(min_value=1, max_value=10**6))
@settings(**SETTINGS)
def test_debounce_matches_pure(spark, rows, gap):
    """debounce [RX:debounce]: emit iff successor is >= gap away (or last)."""
    df = _df(spark, rows)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = {
        r.event_id
        for r in df.withColumn("g", F.lead("ts").over(w) - F.col("ts"))
        .where(F.col("g").isNull() | (F.col("g") >= gap))
        .collect()
    }
    ordered = _ordered(rows)
    expected = {
        i
        for (ts, i, *_), nxt in zip(
            ordered, list(ordered[1:]) + [None]
        )
        if nxt is None or nxt[0] - ts >= gap
    }
    assert got == expected


@given(rows=events_strategy)
@settings(**SETTINGS)
def test_pairwise_count_law(spark, rows):
    """pairwise [RX:buffer variant]: exactly n-1 pairs for n elements."""
    df = _df(spark, rows)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n_pairs = (
        df.withColumn("p", F.lag("value").over(w))
        .where(F.col("p").isNotNull())
        .count()
    )
    assert n_pairs == max(0, len(rows) - 1)


@given(rows=events_strategy, width=st.integers(min_value=1, max_value=10**6))
@settings(**SETTINGS)
def test_tumbling_partition_law(spark, rows, width):
    """window(time) [RX:window]: buckets partition the stream — counts sum
    to n and every element maps to exactly floor(ts/width)."""
    df = _df(spark, rows)
    agg = (
        df.groupBy(F.expr(f"ts div {width}").alias("b"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sum(r.n for r in agg) == len(rows)
    from collections import Counter

    expected = Counter(int(ts) // width for ts, *_ in rows)
    assert {r.b: r.n for r in agg} == dict(expected)


def test_sign_lsh_config_invariants():
    """For ANY threshold, the chosen banding must fit the plane budget and
    respect the random-pair candidate-rate cap — the invariant that keeps
    the LSH path linear at every operating point."""
    from scala_reactivex_spark.operators.llm_dedup import (
        N_HYPERPLANES,
        sign_lsh_config,
    )

    for t in [i / 20 for i in range(20)] + [0.999]:
        rows, bands = sign_lsh_config(t)
        assert rows * bands <= N_HYPERPLANES
        assert bands * (2.0**-rows) <= 0.04, (t, rows, bands)


@given(
    tokens=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=16,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_kr31_portable_hash_three_way_parity(spark, tokens):
    """Foundation law for every sketch oracle (MinHash, SimHash, CM,
    DSIR, Bloom...): the Karp-Rabin 31-bit fold must agree EXACTLY
    between the Spark SQL expression, the DuckDB expression, and an
    independent pure-Python fold, for arbitrary printable-ASCII
    tokens including the empty string."""
    import duckdb

    from scala_reactivex_spark.functions.portable_hash import (
        KR_BASE,
        P31,
        kr31_duck_expr,
        kr31_spark_expr,
    )

    def pure(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * KR_BASE + ord(ch)) % P31
        return acc

    df = spark.createDataFrame([(t,) for t in tokens], "t string")
    got_spark = {
        r["t"]: r["h"]
        for r in df.selectExpr(
            "t", f"{kr31_spark_expr('t')} AS h"
        ).collect()
    }
    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            f"SELECT t, {kr31_duck_expr('t')} AS h FROM "
            "(SELECT unnest(?) AS t)",
            [tokens],
        ).fetchall()
    )
    for t in tokens:
        assert got_spark[t] == got_duck[t] == pure(t), repr(t)


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=(1 << 31) - 2),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_fold31_and_affine_three_way_parity(spark, vals, k):
    """The band-bucket fold and the affine permutation family must agree
    between Spark columns, DuckDB SQL and pure Python for arbitrary
    31-bit inputs — the other half of every LSH oracle's portability."""
    import duckdb

    from scala_reactivex_spark.functions.portable_hash import (
        FOLD_BASE,
        P31,
        affine_seeds,
        fold31,
        fold31_duck,
    )

    acc = 0
    for v in vals:
        acc = (acc * FOLD_BASE + v) % P31
    cols = [F.lit(v).cast("long") for v in vals]
    got_spark = spark.range(1).select(fold31(cols).alias("f")).collect()[
        0
    ]["f"]
    con = duckdb.connect()
    lst = "[" + ", ".join(f"CAST({v} AS BIGINT)" for v in vals) + "]"
    got_duck = con.execute(
        f"SELECT {fold31_duck(lst)}"
    ).fetchone()[0]
    assert got_spark == got_duck == acc

    a, b = affine_seeds(k)[-1]
    h = vals[0]
    want = (a * h + b) % P31
    gs = spark.range(1).selectExpr(
        f"(CAST({a} AS BIGINT) * {h} + {b}) % {P31} AS g"
    ).collect()[0]["g"]
    gd = con.execute(
        f"SELECT (CAST({a} AS BIGINT) * {h} + {b}) % {P31}"
    ).fetchone()[0]
    assert gs == gd == want
