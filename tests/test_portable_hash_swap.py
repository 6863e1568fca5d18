"""Bit-equality law for the two Karp-Rabin fold implementations.

``kr31_pandas_udf`` (vectorized Arrow, used for whole-document folds)
must produce EXACTLY the values of ``kr31_spark_expr`` (Catalyst
``aggregate()``, used for token/gram folds) — they share the pinned
cross-engine hash contract with the DuckDB oracles, so any divergence
silently corrupts every fingerprinting operator.  The law runs over the
full fixture corpus plus adversarial strings (empty, single char,
non-ASCII codepoints, long runs).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_vectorized_fold_equals_catalyst_fold_on_corpus(spark, sf_dir):
    from scala_reactivex_spark.functions.portable_hash import (
        kr31_pandas_udf,
        kr31_spark_expr,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mismatch = (
        docs.select(
            F.expr(kr31_spark_expr("text")).alias("a"),
            kr31_pandas_udf()("text").alias("b"),
        )
        .where(~F.col("a").eqNullSafe(F.col("b")))
        .count()
    )
    assert mismatch == 0


def test_vectorized_fold_equals_catalyst_fold_edge_cases(spark):
    from scala_reactivex_spark.functions.portable_hash import (
        kr31_pandas_udf,
        kr31_spark_expr,
    )

    cases = [
        "",
        "a",
        " ",
        "hello world",
        "é",  # non-ASCII: codepoint semantics (ascii() ≡ ord())
        "naïve café über",
        "日本語テキスト",
        "x" * 5000,  # long run: exercises many fold positions
        "mixed ascii と 漢字 0123",
        None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["text"])
    rows = df.select(
        "text",
        F.expr(kr31_spark_expr("text")).alias("a"),
        kr31_pandas_udf()("text").alias("b"),
    ).collect()
    for r in rows:
        assert r["a"] == r["b"], (r["text"], r["a"], r["b"])
