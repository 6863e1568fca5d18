"""Corpus-filter composition: the keep/drop decision stage of a training
-data pipeline, assembled from the graded primitives (SURVEY.md §2.10).

A real 100 TB ingest run does not execute dedup, language ID and quality
scoring as separate jobs with separate scans — it joins their per-doc
verdicts into ONE decision table and materializes keep flags with reasons.
``llm_corpus_filter`` is that stage: exact-dedup survivorship ⋈ language
prediction ⋈ quality score → (is_dup, keep) per document.

Oracle strategy: the composition's DuckDB oracle embeds the already-green
oracles of the three primitives as parenthesized sub-selects (DuckDB
allows a full WITH...SELECT inside a CTE body), so the composed grading
is exactly the composition of the graded parts — no re-derivation that
could drift.

Scale shape: three branch pipelines each scan documents once (their own
graded cost), then join on doc_id / text_hash — at cluster scale the
branches share the scan via in-memory reuse or run as one multi-output
pass; the decision join itself shuffles only (doc_id, few columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Importing the modules guarantees their @register blocks ran (and gives
# direct access to the query fns), regardless of load_all() order.
from scala_reactivex_spark.operators import llm_dedup, llm_similarity, llm_text
from scala_reactivex_spark.plans.registry import peek, register
from scala_reactivex_spark.sources.catalog import table

#: Quality keep-threshold: fixture scores span 0.12-0.9 (median ~0.41);
#: 0.35 drops the bottom quartile. Scores are ROUND(x,4) in BOTH engines
#: before the comparison, so the threshold test is deterministic.
QUALITY_KEEP = 0.35

_CORPUS_FILTER_ORACLE = f"""
WITH q AS (
{peek("llm_quality_score").oracle}
), lang AS (
{peek("llm_lang_id").oracle}
), dups AS (
{peek("llm_dedup_exact").oracle}
), h AS (
  SELECT doc_id, md5(text) AS text_hash FROM documents
)
SELECT h.doc_id, lang.lang_pred, q.quality,
       (dups.keep_id <> h.doc_id) AS is_dup,
       ((dups.keep_id = h.doc_id) AND q.quality >= {QUALITY_KEEP}) AS keep
FROM h
JOIN dups ON dups.text_hash = h.text_hash
JOIN q ON q.doc_id = h.doc_id
JOIN lang ON lang.doc_id = h.doc_id
"""


@register(
    "llm_corpus_filter",
    tier="T3",
    doc="Corpus keep/drop decision table — the filter stage of a training"
    "-data pipeline composed from graded primitives: exact-dedup "
    "survivorship (md5 keeper), language prediction (llm_lang_id), and "
    "quality score (llm_quality_score) joined per doc into (is_dup, "
    "keep). keep = canonical copy AND quality >= 0.35. The oracle embeds "
    "the three primitives' green oracles as sub-selects, so composed "
    "grading is exactly the composition of the graded parts.",
    oracle=_CORPUS_FILTER_ORACLE,
)
def llm_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    quality = llm_text.llm_quality_score(spark, sf_dir).select(
        "doc_id", "quality"
    )
    lang = llm_text.llm_lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    keepers = llm_dedup.llm_dedup_exact(spark, sf_dir).select(
        "text_hash", "keep_id"
    )
    hashed = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash")
    )
    is_canonical = F.col("keep_id") == F.col("doc_id")
    return (
        hashed.join(keepers, "text_hash")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .select(
            "doc_id",
            "lang_pred",
            "quality",
            (~is_canonical).alias("is_dup"),
            (is_canonical & (F.col("quality") >= QUALITY_KEEP)).alias(
                "keep"
            ),
        )
    )


_PIPELINE_E2E_ORACLE = f"""
WITH cf AS (
{_CORPUS_FILTER_ORACLE}
), kept AS (
  SELECT cf.doc_id, cf.lang_pred,
         CASE
           WHEN substr(md5(d.text), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
           WHEN substr(md5(d.text), 1, 1) IN ('c', 'd') THEN 'val'
           ELSE 'test'
         END AS split,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
  FROM cf JOIN documents d ON cf.doc_id = d.doc_id
  WHERE cf.keep
)
SELECT split, lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM kept GROUP BY split, lang_pred
"""


@register(
    "llm_pipeline_e2e",
    tier="T3",
    doc="End-to-end curation data card — the full pipeline chained as ONE "
    "declarative plan: exact-dedup survivorship + language ID + quality "
    "filter (llm_corpus_filter), then the deterministic content-hash "
    "train/val/test assignment (llm_doc_split's rule) and whitespace "
    "token counts, aggregated per (split, predicted language). This is "
    "the table a training run is provisioned from. The oracle nests the "
    "corpus-filter composition (itself built from green primitive "
    "oracles) one level deeper — grading stays the composition of "
    "graded parts. Scale: everything rides the primitives' own shapes; "
    "the final aggregate is over a bounded (split, lang) domain.",
    oracle=_PIPELINE_E2E_ORACLE,
)
def llm_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = llm_corpus_filter(spark, sf_dir).where(F.col("keep")).select(
        "doc_id", "lang_pred"
    )
    nib = F.substring(F.md5(F.col("text").cast("binary")), 1, 1)
    split = (
        F.when(nib.between("0", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        split.alias("split"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    return (
        kept.join(docs, "doc_id")
        .groupBy("split", "lang_pred")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tok_sum"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


def _ann_recall_oracle() -> str:
    """Embed the three green similarity oracles (brute-force ground truth,
    single-probe IVF, multi-probe IVF) as sub-selects — composed grading
    is exactly the composition of the graded parts."""
    bf = peek("llm_similarity_topk").oracle
    ivf = peek("llm_ann_ivf").oracle
    mp = peek("llm_ann_ivf_mp").oracle
    return f"""
WITH bf AS (
{bf}
), ivf AS (
{ivf}
), mp AS (
{mp}
)
SELECT bf.probe_id,
       CAST(count(*) AS BIGINT) AS k,
       CAST(count(ivf.neighbor_id) AS BIGINT) AS hits_ivf,
       CAST(count(mp.neighbor_id) AS BIGINT) AS hits_mp,
       CAST(count(ivf.neighbor_id) * 10000 // count(*) AS BIGINT)
         AS recall_ivf_1e4,
       CAST(count(mp.neighbor_id) * 10000 // count(*) AS BIGINT)
         AS recall_mp_1e4
FROM bf
LEFT JOIN ivf ON ivf.probe_id = bf.probe_id
             AND ivf.neighbor_id = bf.neighbor_id
LEFT JOIN mp ON mp.probe_id = bf.probe_id
            AND mp.neighbor_id = bf.neighbor_id
GROUP BY bf.probe_id
"""


@register(
    "llm_ann_recall",
    tier="T3",
    doc="ANN recall evaluation — the acceptance gate every approximate "
    "index must pass before it replaces brute force: per probe, "
    "recall@10 of single-probe IVF and multi-probe (nprobe=2) IVF "
    "against the brute-force ground truth (1e4 integer units).  The "
    "oracle embeds the three primitives' green oracles, so the diagnostic "
    "is graded as exactly the composition of graded parts.  Scale shape: "
    "the ground-truth side is the bounded probe set's top-k (never "
    "corpus-scale); two left equi-joins + one per-probe aggregate.",
    oracle=_ann_recall_oracle(),
)
def llm_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = llm_similarity.llm_similarity_topk(spark, sf_dir).select(
        "probe_id", "neighbor_id"
    )
    ivf = (
        llm_similarity.llm_ann_ivf(spark, sf_dir)
        .select("probe_id", "neighbor_id")
        .withColumn("hit_ivf", F.lit(1))
    )
    mp = (
        llm_similarity.llm_ann_ivf_mp(spark, sf_dir)
        .select("probe_id", "neighbor_id")
        .withColumn("hit_mp", F.lit(1))
    )
    return (
        bf.join(ivf, ["probe_id", "neighbor_id"], "left")
        .join(mp, ["probe_id", "neighbor_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count("*").cast("bigint").alias("k"),
            F.count("hit_ivf").cast("bigint").alias("hits_ivf"),
            F.count("hit_mp").cast("bigint").alias("hits_mp"),
            F.expr(
                "CAST(count(hit_ivf) * 10000 DIV count(*) AS BIGINT)"
            ).alias("recall_ivf_1e4"),
            F.expr(
                "CAST(count(hit_mp) * 10000 DIV count(*) AS BIGINT)"
            ).alias("recall_mp_1e4"),
        )
    )


@register(
    "llm_source_scorecard",
    tier="T3",
    doc="Per-source scorecard — the one-row-per-feed report a crawl "
    "partnership is judged by: document count, mean quality (1e4, "
    "integer floor over DECIMAL-exact sums), duplicate rate and keep "
    "rate (1e4) from the composed corpus-filter decision table.  The "
    "oracle nests the green corpus-filter oracle.  Scale shape: one "
    "bounded-key rollup over the decision table, joined to the "
    "source dimension.",
    oracle=f"""
WITH cf AS (
{_CORPUS_FILTER_ORACLE}
), src AS (
  SELECT doc_id, source FROM documents
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(floor(SUM(CAST(cf.quality AS DECIMAL(38,6))) * 10000
                  / count(*)) AS BIGINT) AS mean_quality_1e4,
       CAST(count(*) FILTER (WHERE cf.is_dup) * 10000 // count(*)
            AS BIGINT) AS dup_rate_1e4,
       CAST(count(*) FILTER (WHERE cf.keep) * 10000 // count(*)
            AS BIGINT) AS keep_rate_1e4
FROM cf JOIN src s ON cf.doc_id = s.doc_id
GROUP BY s.source
""",
)
def llm_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    cf = llm_corpus_filter(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        cf.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.expr(
                "CAST(floor(SUM(CAST(quality AS DECIMAL(38,6))) * 10000"
                " / count(*)) AS BIGINT)"
            ).alias("mean_quality_1e4"),
            F.expr(
                "CAST(count(CASE WHEN is_dup THEN 1 END) * 10000"
                " DIV count(*) AS BIGINT)"
            ).alias("dup_rate_1e4"),
            F.expr(
                "CAST(count(CASE WHEN keep THEN 1 END) * 10000"
                " DIV count(*) AS BIGINT)"
            ).alias("keep_rate_1e4"),
        )
    )
