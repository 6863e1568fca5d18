"""Round-7 additions: RAG chunking, bucketed co-located join, tokenizer
fertility (SURVEY.md §2.10 family extensions).

- ``llm_chunk_overlap``: overlapping sliding-window chunking — the RAG
  ingestion primitive (fixed window, fixed stride, trailing partial
  chunk).  Distinct from ``llm_doc_split`` (hash train/val/test routing)
  and ``llm_cdc_chunks`` (content-defined boundaries): RAG retrieval
  wants uniform spans with overlap so no answer straddles a boundary.
- ``src_bucketed_join``: the shuffle-free co-located fact-to-fact join —
  lineitem and orders written ONCE as bucketed tables on their join key
  (8 buckets, sorted), then joined with zero Exchange on the keys
  (pytest asserts the executed plan).  At 100 TB this is the difference
  between re-shuffling both fact tables per query and reading
  co-partitioned buckets; the bucket layout is the materialized
  partitioning every repeated big join should ride.
- ``llm_bpe_fertility``: per-language tokenizer fertility — symbols per
  word before/after the learned BPE merges, the metric that tells a
  tokenizer owner which languages pay the most symbols per word (the
  multilingual-fairness number).  Composes the graded ``llm_bpe_apply``
  per-doc table; its oracle embeds that operator's green oracle.

These keys are listed in registry._HOLD_NEXT_ROUND for round 7 so the
driver window stays exactly the 47 banked-pending keys + 3 re-confirms;
they are verified by the identical local protocol this round and float
to the front of the round-8 window automatically.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import dsum

# Importing llm_subdoc guarantees llm_bpe_apply's @register block ran
# before the peek() at the bottom of this module, regardless of whether
# this module is imported directly or via load_all().
from scala_reactivex_spark.operators import llm_subdoc  # noqa: F401
from scala_reactivex_spark.plans.registry import peek, register
from scala_reactivex_spark.sources.catalog import table

#: RAG chunking geometry: 24-token windows, stride 16 (8-token overlap).
CHUNK_W = 24
CHUNK_S = 16

#: Bucket count for the co-located join demo (fixed — both sides MUST
#: agree or Spark re-shuffles one side).
N_BUCKETS = 8


@register(
    "llm_chunk_overlap",
    tier="T3",
    doc=f"Overlapping sliding-window chunking for RAG ingestion: each "
    f"document yields ceil-strided {CHUNK_W}-token windows every "
    f"{CHUNK_S} tokens (trailing chunk may be short), emitting the "
    "chunk index, 1-based token offset, chunk length and the chunk-text "
    "md5 (the retrieval unit's content address).  Scale shape: pure "
    "per-row generation — sequence+explode over the per-doc chunk "
    "count, slice on the token array, all JVM-side; output rows = "
    "Σ chunks, no shuffle at all (the plan is scan → generate → "
    "project).  Overlap factor W/S ≈ 1.5 is the storage price of "
    "boundary-robust retrieval.",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
), c AS (
  SELECT doc_id, toks,
         CASE WHEN n <= {CHUNK_W} THEN 1
              ELSE 1 + (n - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S}
         END AS nc
  FROM d
), e AS (
  SELECT doc_id, toks, unnest(range(0, nc)) AS ci FROM c
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * {CHUNK_S} + 1 AS BIGINT) AS start_tok,
       CAST(len(list_slice(toks, ci * {CHUNK_S} + 1,
                           ci * {CHUNK_S} + {CHUNK_W})) AS BIGINT)
         AS n_tok,
       md5(array_to_string(list_slice(toks, ci * {CHUNK_S} + 1,
                                      ci * {CHUNK_S} + {CHUNK_W}), ' '))
         AS chunk_md5
FROM e
""",
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .withColumn(
            "nc",
            F.expr(
                f"IF(n <= {CHUNK_W}, 1L, 1L + CAST((n - {CHUNK_W} "
                f"+ {CHUNK_S} - 1) DIV {CHUNK_S} AS BIGINT))"
            ),
        )
    )
    e = d.select(
        "doc_id",
        "toks",
        F.explode(F.expr("sequence(0L, nc - 1L)")).alias("ci"),
    )
    chunk = F.expr(f"slice(toks, ci * {CHUNK_S} + 1, {CHUNK_W})")
    return e.select(
        "doc_id",
        F.col("ci").cast("bigint").alias("chunk_idx"),
        (F.col("ci") * CHUNK_S + 1).cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_tok"),
        F.md5(F.concat_ws(" ", chunk).cast("binary")).alias("chunk_md5"),
    )


def _bucketed_table(
    spark: SparkSession, sf_dir: str, tbl: str, key: str
) -> DataFrame:
    """Attach (and on first use, materialize) a bucketed copy of a
    fixture table under ``<repo>/.cache/bucketdemo``.

    The in-memory catalog forgets tables between sessions, but the
    bucketed FILES persist — so each session re-issues the CREATE TABLE
    DDL (metadata only, carries the bucket spec) and only populates when
    the location is empty.  This mirrors production exactly: the
    bucketed layout is written once; every later session re-attaches the
    metastore entry and reads co-partitioned buckets with no shuffle."""
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    warehouse = os.path.join(repo_root, ".cache", "bucketdemo")
    base = re.sub(
        r"[^0-9a-zA-Z]", "_", os.path.basename(os.path.normpath(sf_dir))
    )
    name = f"bucketdemo.{tbl}_{base}"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{warehouse}'"
    )
    if not spark.catalog.tableExists(name):
        src = table(spark, sf_dir, tbl)
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in src.schema
        )
        spark.sql(
            f"CREATE TABLE {name} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {N_BUCKETS} BUCKETS "
            f"LOCATION '{os.path.join(warehouse, f'{tbl}_{base}')}'"
        )
        if not spark.table(name).head(1):
            src.write.mode("overwrite").insertInto(name)
    return spark.table(name)


@register(
    "src_bucketed_join",
    tier="T2",
    doc="Shuffle-free co-located join via bucketed tables: lineitem and "
    f"orders each written once bucketed by their join key ({N_BUCKETS} "
    "buckets, sorted), re-attached per session by DDL, then merge-joined "
    "— the executed plan has a SortMergeJoin with ZERO Exchange on the "
    "join keys (pytest-asserted; the only shuffle left is the 5-row "
    "priority rollup).  This is the materialized partitioning story for "
    "100 TB fact-to-fact joins: pay the bucketing write once, skip both "
    "sides' shuffles on every subsequent join on that key.  Output: "
    "order-priority revenue rollup (decimal-exact).",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def src_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    od = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    # merge hint: keep the SortMergeJoin so the co-located bucket read is
    # what executes (AQE would otherwise broadcast at small fixtures and
    # hide the layout's effect — at real scale neither side broadcasts).
    j = li.hint("merge").join(
        od.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


@register(
    "llm_bpe_fertility",
    tier="T3",
    doc="Per-language tokenizer fertility: total symbols per language "
    "before/after the 3 learned BPE merges (composing the graded "
    "llm_bpe_apply per-doc table with the documents language column) "
    "and the compression ratio in 1e4 units — the multilingual-fairness "
    "diagnostic showing which languages pay the most symbols per word "
    "under a shared vocabulary.  Oracle embeds llm_bpe_apply's green "
    "oracle, so the rollup grades as a composition of graded parts.  "
    "Scale shape: the per-doc table hash-aggregates to |langs| rows.",
    oracle=None,  # assigned below (embeds llm_bpe_apply's oracle)
)
def llm_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scala_reactivex_spark.operators.llm_subdoc import llm_bpe_apply

    base = llm_bpe_apply(spark, sf_dir)
    langs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        base.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("syms_before").cast("bigint").alias("syms_before"),
            F.sum("syms_after").cast("bigint").alias("syms_after"),
            F.expr(
                "CAST(sum(syms_after) * 10000 DIV sum(syms_before)"
                " AS BIGINT)"
            ).alias("ratio_1e4"),
        )
    )


peek("llm_bpe_fertility").oracle = f"""
WITH base AS (
{peek("llm_bpe_apply").oracle}
), j AS (
  SELECT d.lang, b.syms_before, b.syms_after
  FROM base b JOIN documents d ON b.doc_id = d.doc_id
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(syms_before) AS BIGINT) AS syms_before,
       CAST(sum(syms_after) AS BIGINT) AS syms_after,
       CAST(sum(syms_after) * 10000 // sum(syms_before) AS BIGINT)
         AS ratio_1e4
FROM j GROUP BY lang
"""
