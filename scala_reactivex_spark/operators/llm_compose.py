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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Importing the modules guarantees their @register blocks ran (and gives
# direct access to the query fns), regardless of load_all() order.
# llm_cluster is peeked at import time too (llm_diverse_select composes
# the kmeans oracle), so it must load here, not via load_all.
from scala_reactivex_spark.operators import (
    llm_cluster,  # noqa: F401 — registers llm_kmeans for peek() below
    llm_dedup,
    llm_similarity,
    llm_text,
)
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
    # The keep/drop decision table is read by three graded consumers
    # (this key, the per-source scorecard, the e2e data card) — one
    # doc-sized build per session (plans/memo.py), persisted.
    from scala_reactivex_spark.plans.memo import session_memo

    return session_memo(
        spark,
        sf_dir,
        "corpus_filter",
        lambda: _corpus_filter(spark, sf_dir).persist(),
    )


def _corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
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


BUDGET_DIV = 3  # select the best ~1/3 of corpus tokens


@register(
    "llm_budget_select",
    tier="T3",
    doc="Token-budget corpus selection — 'give me the best N tokens': "
    "docs are admitted by quality band (4-dp scores ARE exact integer "
    "1e4 bands) from the top down; whole bands whose cumulative tokens "
    "fit the budget (total/3) enter outright, the single straddling "
    "band admits docs in content-hash order until the remainder is "
    "spent, and an exact boundary hit simply yields no straddling band "
    "(per-band conditions, no sentinel cases).  The corpus-wide 'sort "
    "by quality' this replaces would be a global sort; here the only "
    "corpus-wide structure is the BOUNDED band histogram (the "
    "ppl_filter/curriculum trick), and the one positional window runs "
    "inside the straddling band alone.  Emits per doc: band, tokens, "
    "keep flag and admission reason (band/marginal/out).",
    oracle=f"""
WITH q AS (
  SELECT doc_id, text,
         CAST(floor(ROUND(
           (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                 THEN 1.0 ELSE 0.5 END)
           * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                          t -> t IN ('the', 'a'))) AS DOUBLE)
              / len(string_split(text, ' ')))
           * (CAST(len(list_distinct(string_split(text, ' ')))
                   AS DOUBLE) / len(string_split(text, ' '))), 4)
           * 10000 + 0.5) AS BIGINT) AS band,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         ((instr('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
          + instr('0123456789abcdef', substr(md5(text), 4, 1)) - 1) * 256
         + (instr('0123456789abcdef', substr(md5(text), 5, 1)) - 1) * 16
         + instr('0123456789abcdef', substr(md5(text), 6, 1)) - 1 AS u16
  FROM documents
), hist AS (
  SELECT band, sum(n_tok) AS btok FROM q GROUP BY band
), cum AS (
  SELECT band, btok,
         coalesce(sum(btok) OVER (ORDER BY band DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS above
  FROM hist
), budget AS (
  SELECT CAST(sum(n_tok) // {{BUDGET_DIV}} AS BIGINT) AS b FROM q
), ranked AS (
  SELECT q.doc_id, q.band, q.n_tok, c.above, c.btok, bu.b,
         sum(q.n_tok) OVER (PARTITION BY q.band
             ORDER BY q.u16, q.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mcum
  FROM q JOIN cum c ON q.band = c.band CROSS JOIN budget bu
)
SELECT doc_id, band, n_tok,
       CASE
         WHEN above + btok <= b THEN 'band'
         WHEN above < b AND above + mcum <= b THEN 'marginal'
         ELSE 'out'
       END AS reason,
       CAST(above + btok <= b
            OR (above < b AND above + mcum <= b) AS INT) AS keep
FROM ranked
""".format(BUDGET_DIV=BUDGET_DIV),
)
def llm_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    hexpos = (
        "instr('0123456789abcdef', substr(md5(cast(text as binary)), {}, 1))"
    )
    _, _, quality = llm_text.quality_col()
    q = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.floor(quality * 10000 + F.lit(0.5)).cast("bigint").alias("band"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        F.expr(
            f"(({hexpos.format(3)} - 1) * 16 + {hexpos.format(4)} - 1)"
            f" * 256 + ({hexpos.format(5)} - 1) * 16"
            f" + {hexpos.format(6)} - 1"
        ).alias("u16"),
    )
    hist = q.groupBy("band").agg(F.sum("n_tok").alias("btok"))
    wdesc = (
        Window.orderBy(F.col("band").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "above", F.coalesce(F.sum("btok").over(wdesc), F.lit(0))
    )
    budget = q.agg(
        F.expr(f"CAST(sum(n_tok) DIV {BUDGET_DIV} AS BIGINT)").alias("b")
    )
    wm = (
        Window.partitionBy("band")
        .orderBy("u16", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        q.join(F.broadcast(cum), "band")
        .crossJoin(F.broadcast(budget))
        .withColumn("mcum", F.sum("n_tok").over(wm))
    )
    band_in = F.col("above") + F.col("btok") <= F.col("b")
    marginal_in = (F.col("above") < F.col("b")) & (
        F.col("above") + F.col("mcum") <= F.col("b")
    )
    reason = (
        F.when(band_in, F.lit("band"))
        .when(marginal_in, F.lit("marginal"))
        .otherwise(F.lit("out"))
    )
    return ranked.select(
        "doc_id",
        "band",
        "n_tok",
        reason.alias("reason"),
        (band_in | marginal_in).cast("int").alias("keep"),
    )


@register(
    "llm_source_lang_entropy",
    tier="T3",
    doc="Per-source language-mix entropy — the single number that "
    "separates a monolingual feed from a mixed crawl: Shannon entropy "
    "of each source's language distribution, summed from per-(source, "
    "lang) terms −p·log10(p) pinned to 1e6 integers (identical doubles "
    "of identical integer ratios; exact integer cell sums — the "
    "llm_token_entropy convention at the source level).  Scale shape: "
    "one hash aggregate to the bounded source×lang grid, one rollup.",
    oracle="""
WITH g AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
), t AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM g GROUP BY source
), cells AS (
  SELECT g.source, g.n, t.tot,
         CAST(floor(-(CAST(g.n AS DOUBLE) / t.tot)
                    * log10(CAST(g.n AS DOUBLE) / t.tot)
                    * 1000000 + 0.5) AS BIGINT) AS h
  FROM g JOIN t ON g.source = t.source
)
SELECT source,
       CAST(max(tot) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       CAST(sum(h) AS BIGINT) AS entropy_1e6
FROM cells GROUP BY source
""",
)
def llm_source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
    )
    t = g.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    h = F.floor(-p * F.log10(p) * 1_000_000 + F.lit(0.5)).cast("bigint")
    return (
        g.join(t, "source")
        .select("source", "tot", h.alias("h"))
        .groupBy("source")
        .agg(
            F.max("tot").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_langs"),
            F.sum("h").cast("bigint").alias("entropy_1e6"),
        )
    )


def _spann_recall_oracle() -> str:
    """Compose the three green search oracles — brute force ground
    truth, single-probe IVF, and SPANN (boundary-replicated, still
    single-probe) — into the head-to-head recall table that decides
    whether build-time replication buys back the quantization-boundary
    misses multiprobe pays query time for."""
    bf = peek("llm_similarity_topk").oracle
    ivf = peek("llm_ann_ivf").oracle
    sp = peek("llm_ann_spann").oracle
    return f"""
WITH bf AS (
{bf}
), ivf AS (
{ivf}
), sp AS (
{sp}
)
SELECT bf.probe_id,
       CAST(count(*) AS BIGINT) AS k,
       CAST(count(ivf.neighbor_id) AS BIGINT) AS hits_ivf,
       CAST(count(sp.neighbor_id) AS BIGINT) AS hits_spann,
       CAST(count(ivf.neighbor_id) * 10000 // count(*) AS BIGINT)
         AS recall_ivf_1e4,
       CAST(count(sp.neighbor_id) * 10000 // count(*) AS BIGINT)
         AS recall_spann_1e4
FROM bf
LEFT JOIN ivf ON ivf.probe_id = bf.probe_id
             AND ivf.neighbor_id = bf.neighbor_id
LEFT JOIN sp ON sp.probe_id = bf.probe_id
            AND sp.neighbor_id = bf.neighbor_id
GROUP BY bf.probe_id
"""


@register(
    "llm_spann_recall",
    tier="T3",
    doc="SPANN acceptance gate: per probe, recall@10 of single-probe "
    "IVF vs SPANN (same single-probe query, boundary-replicated "
    "postings) against brute-force ground truth — the graded evidence "
    "that index-time replication recovers boundary misses without "
    "multiprobe's per-query fan-out.  Oracle embeds the three green "
    "search oracles; the compare side is probe-bounded (k rows per "
    "probe), never corpus-scale.",
    oracle=_spann_recall_oracle(),
)
def llm_spann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = llm_similarity.llm_similarity_topk(spark, sf_dir).select(
        "probe_id", "neighbor_id"
    )
    ivf = (
        llm_similarity.llm_ann_ivf(spark, sf_dir)
        .select("probe_id", "neighbor_id")
        .withColumn("hit_ivf", F.lit(1))
    )
    sp = (
        llm_similarity.llm_ann_spann(spark, sf_dir)
        .select("probe_id", "neighbor_id")
        .withColumn("hit_spann", F.lit(1))
    )
    return (
        bf.join(ivf, ["probe_id", "neighbor_id"], "left")
        .join(sp, ["probe_id", "neighbor_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count("*").cast("bigint").alias("k"),
            F.count("hit_ivf").cast("bigint").alias("hits_ivf"),
            F.count("hit_spann").cast("bigint").alias("hits_spann"),
            F.expr(
                "CAST(count(hit_ivf) * 10000 DIV count(*) AS BIGINT)"
            ).alias("recall_ivf_1e4"),
            F.expr(
                "CAST(count(hit_spann) * 10000 DIV count(*) AS BIGINT)"
            ).alias("recall_spann_1e4"),
        )
    )


DIVERSE_CAP = 5  # selected docs per embedding cluster


@register(
    "llm_diverse_select",
    tier="T3",
    doc=f"Quality-vs-diversity capped selection — the greedy-MMR-shaped "
    "curation stage that keeps the corpus from collapsing onto its "
    f"best-scoring mode: the top {DIVERSE_CAP} documents PER EMBEDDING "
    "CLUSTER by pinned quality score (llm_kmeans' final assignment ⋈ "
    "llm_quality_score's composite, floor(q·1e4+0.5) so the ranking "
    "is exact integers in both engines; ties → lowest doc_id).  A "
    "global quality top-k would take every slot from one dominant "
    "cluster; the per-cluster cap is the bounded-diversity guarantee "
    "data-mixing recipes apply before training.  Scale shape: the "
    "graded k-means assignment (its own cost) ⋈ a pure projection, "
    "then TWO-PHASE per-cluster top-k (local rank per (cluster, "
    "doc_id%16) sub-bucket, re-rank over ≤16·cap survivors — "
    "the llm_reservoir_sample pattern, so a handful of corpus-scale "
    "clusters never serialize through single-partition sorts).",
    oracle=f"""
WITH asn AS (
{peek("llm_kmeans").oracle}
), q AS (
{peek("llm_quality_score").oracle}
), j AS (
  SELECT q.doc_id, asn.cluster_id,
         CAST(floor(q.quality * 10000 + 0.5) AS BIGINT) AS q_1e4
  FROM q JOIN asn ON q.doc_id = asn.vec_id
)
SELECT doc_id, cluster_id, q_1e4, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT doc_id, cluster_id, q_1e4,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY q_1e4 DESC, doc_id) AS rnk
  FROM j
)
WHERE rnk <= {DIVERSE_CAP}
""",
)
def llm_diverse_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scala_reactivex_spark.operators.llm_cluster import (
        _kmeans_assignment,
    )

    asn = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster_id")
    _, _, quality = llm_text.quality_col()
    q = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.floor(quality * 10000 + F.lit(0.5)).cast("bigint").alias("q_1e4"),
    )
    j = q.join(asn, q.doc_id == asn.vec_id).select(
        "doc_id", "cluster_id", "q_1e4"
    )
    # Two-phase per-cluster top-k: any cluster-wide top-cap row is its
    # (cluster, doc_id%16) sub-bucket's top-cap, so phase 1 is lossless
    # and no single cluster's members ever sort on one partition.
    local = Window.partitionBy(
        "cluster_id", F.col("doc_id") % 16
    ).orderBy(F.col("q_1e4").desc(), "doc_id")
    final = Window.partitionBy("cluster_id").orderBy(
        F.col("q_1e4").desc(), "doc_id"
    )
    return (
        j.withColumn("lrk", F.row_number().over(local))
        .where(F.col("lrk") <= DIVERSE_CAP)
        .withColumn("rnk", F.row_number().over(final))
        .where(F.col("rnk") <= DIVERSE_CAP)
        .select(
            "doc_id",
            "cluster_id",
            "q_1e4",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )
