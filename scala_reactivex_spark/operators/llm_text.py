"""Text analysis operators for LLM training-data pipelines (SURVEY.md §2.10).

- ``llm_text_tokens``: term frequency with deterministic top-k per language.
- ``llm_text_stats``: token counting (whitespace + regex word tokenizer).
- ``llm_quality_score``: document quality heuristics (length, stopword
  ratio, lexical diversity) → one composite score.
- ``llm_lang_id``: n-gram-profile language ID — profiles learned from the
  labeled corpus in one aggregate pass, then scored per document.
  Rows-only: the scoring involves log-probability sums whose argmax has no
  cross-engine determinism guarantee at ties (the fixture vocabulary is
  shared across languages by construction, so ties are common).
- ``llm_doc_fingerprint``: 64-bit Karp-Rabin rolling fingerprint over UTF-8
  bytes via an Arrow-batched pandas UDF; oracle = the same fold as a
  DuckDB ``list_reduce`` in exact int128 arithmetic.

All token work happens post-explode with hash aggregates — no driver
collection, linear in corpus size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

STOPWORDS = ("the", "a")  # ∩ fixture vocabulary
TOPK_TERMS = 10


@register(
    "llm_text_tokens",
    tier="T3",
    doc="Term frequency: top-10 tokens per language with the deterministic "
    "(count DESC, token ASC) tie-break.",
    oracle="""
WITH tf AS (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
), counts AS (
  SELECT lang, token, count(*) AS n FROM tf GROUP BY lang, token
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY n DESC, token) AS rnk
  FROM counts
)
SELECT lang, token, n, rnk FROM ranked WHERE rnk <= 10
""",
)
def llm_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        table(spark, sf_dir, "documents")
        .select(
            "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOPK_TERMS)
        .select("lang", "token", "n", "rnk")
    )


@register(
    "llm_text_stats",
    tier="T3",
    doc="Token counting: whitespace tokenizer vs regex word tokenizer "
    "([a-z0-9]+), plus distinct-token count — the unit economics of a "
    "training corpus.",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
         AS n_tokens_re,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         AS n_uniq,
       n_chars
FROM documents
""",
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens_ws"),
        F.regexp_count("text", F.lit("[a-z0-9]+"))
        .cast("bigint")
        .alias("n_tokens_re"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("bigint")
        .alias("n_uniq"),
        "n_chars",
    )


def quality_col():
    """The composite quality score as row-local Columns over ``text`` —
    shared by the batch query and the streaming soft-sampling twin (a
    pure projection, so it serves on a stream unchanged)."""
    toks = F.split("text", " ")
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(
        F.expr("filter(split(text, ' '), t -> t IN ('the', 'a'))")
    ).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    length_band = F.when(
        (n_tok >= 20) & (n_tok <= 80), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return (
        F.round(n_stop / n_tok, 4),
        F.round(n_uniq / n_tok, 4),
        F.round(
            length_band * (F.lit(1.0) - n_stop / n_tok) * (n_uniq / n_tok),
            4,
        ),
    )


@register(
    "llm_quality_score",
    tier="T3",
    doc="Quality scoring: stopword ratio, lexical diversity and length "
    "band → composite score in [0, 1], rounded. All ratios are small-int "
    "divisions in double (deterministic cross-engine).",
    oracle="""
WITH x AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
         CAST(len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a'))) AS DOUBLE) AS n_stop,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq
  FROM documents
)
SELECT doc_id,
       ROUND(n_stop / n_tok, 4) AS stopword_ratio,
       ROUND(n_uniq / n_tok, 4) AS diversity,
       ROUND((CASE WHEN n_tok >= 20 AND n_tok <= 80 THEN 1.0 ELSE 0.5 END)
             * (1.0 - n_stop / n_tok) * (n_uniq / n_tok), 4) AS quality
FROM x
""",
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    stop_ratio, diversity, quality = quality_col()
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        diversity.alias("diversity"),
        quality.alias("quality"),
    )


#: PSI bands over the [0, 1] quality score (decile cut, top-closed).
PSI_BANDS = 10


@register(
    "llm_quality_psi",
    tier="T3",
    doc="Quality-distribution drift monitor (round 15) — the "
    "population-stability-index table every production filter ships "
    "with: two "
    "corpus snapshots (deterministic doc_id-parity halves standing in "
    "for t0/t1) band their composite quality score (shared "
    f"quality_col recipe) into {PSI_BANDS} deciles, and each band "
    "reports both counts, both add-one-smoothed shares (1e6) and its "
    "PSI contribution floor((p_new − p_old)·ln(p_new/p_old)·1e6 + "
    "0.5) — non-negative by construction, summing to the headline "
    "drift number (PSI > 0.2 ⇒ the filter's threshold needs "
    "recalibration).  Smoothing keeps empty bands defined; a "
    f"{PSI_BANDS}-row spine makes both engines emit every band.  "
    "Scale shape: one corpus scan → 10-key hash rollup + two 1-row "
    "scalar attaches; ln on identical smoothed rationals is the "
    "pinned-double convention of llm_hll_portable.",
    oracle=f"""
WITH x AS (
  SELECT doc_id, doc_id % 2 AS snap,
         ROUND((CASE WHEN len(string_split(text, ' ')) BETWEEN 20
                     AND 80 THEN 1.0 ELSE 0.5 END)
               * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                          t -> t IN ('the', 'a'))) AS DOUBLE)
                      / len(string_split(text, ' ')))
               * (CAST(len(list_distinct(string_split(text, ' ')))
                       AS DOUBLE) / len(string_split(text, ' '))),
               4) AS quality
  FROM documents
), banded AS (
  SELECT least(CAST(floor(quality * {PSI_BANDS}) AS BIGINT),
               {PSI_BANDS - 1}) AS band,
         snap
  FROM x
), counts AS (
  SELECT s.band,
         CAST(coalesce(sum(CASE WHEN snap = 0 THEN 1 END), 0)
              AS BIGINT) AS n_old,
         CAST(coalesce(sum(CASE WHEN snap = 1 THEN 1 END), 0)
              AS BIGINT) AS n_new
  FROM (SELECT unnest(range(0, {PSI_BANDS})) AS band) s
  LEFT JOIN banded ON s.band = banded.band
  GROUP BY s.band
), tot AS (
  SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM counts
)
SELECT CAST(band AS BIGINT) AS band, n_old, n_new,
       CAST(floor((n_old + 1) * 1000000.0
                  / (t_old + {PSI_BANDS}) + 0.5) AS BIGINT) AS p_old_1e6,
       CAST(floor((n_new + 1) * 1000000.0
                  / (t_new + {PSI_BANDS}) + 0.5) AS BIGINT) AS p_new_1e6,
       CAST(floor((((n_new + 1.0) / (t_new + {PSI_BANDS}))
                   - ((n_old + 1.0) / (t_old + {PSI_BANDS})))
                  * ln(((n_new + 1.0) / (t_new + {PSI_BANDS}))
                       / ((n_old + 1.0) / (t_old + {PSI_BANDS})))
                  * 1000000 + 0.5) AS BIGINT) AS psi_1e6
FROM counts CROSS JOIN tot
""",
)
def llm_quality_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, quality = quality_col()
    banded = table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2).alias("snap"),
        F.least(
            F.floor(quality * PSI_BANDS).cast("bigint"),
            F.lit(PSI_BANDS - 1).cast("bigint"),
        ).alias("band"),
    )
    spine = spark.range(0, PSI_BANDS).select(F.col("id").alias("band"))
    counts = (
        spine.join(banded, "band", "left")
        .groupBy("band")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("snap") == 0, 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_old"),
            F.coalesce(
                F.sum(F.when(F.col("snap") == 1, 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_new"),
        )
    )
    tot = counts.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    po = f"((n_old + 1.0) / (t_old + {PSI_BANDS}))"
    pn = f"((n_new + 1.0) / (t_new + {PSI_BANDS}))"
    return counts.crossJoin(F.broadcast(tot)).select(
        "band",
        "n_old",
        "n_new",
        F.expr(
            f"CAST(floor((n_old + 1) * 1000000.0"
            f" / (t_old + {PSI_BANDS}) + 0.5) AS BIGINT)"
        ).alias("p_old_1e6"),
        F.expr(
            f"CAST(floor((n_new + 1) * 1000000.0"
            f" / (t_new + {PSI_BANDS}) + 0.5) AS BIGINT)"
        ).alias("p_new_1e6"),
        F.expr(
            f"CAST(floor(({pn} - {po}) * ln({pn} / {po})"
            " * 1000000 + 0.5) AS BIGINT)"
        ).alias("psi_1e6"),
    )


#: Shared DuckDB SQL fragment: per-doc composite quality + whitespace
#: token count (the llm_quality_psi x-CTE recipe, plus tokens — the
#: sweep bills RETAINED TOKENS, the unit training budgets are cut in).
_QUALITY_TOK_CTE = """
WITH x AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         ROUND((CASE WHEN len(string_split(text, ' ')) BETWEEN 20
                     AND 80 THEN 1.0 ELSE 0.5 END)
               * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                          t -> t IN ('the', 'a'))) AS DOUBLE)
                      / len(string_split(text, ' ')))
               * (CAST(len(list_distinct(string_split(text, ' ')))
                       AS DOUBLE) / len(string_split(text, ' '))),
               4) AS quality
  FROM documents
)"""


@register(
    "llm_quality_sweep",
    tier="T3",
    doc="Quality-threshold retention curve (round 16) — the decision "
    "table a filter's cutoff is CHOSEN from, the llm_dedup_threshold_"
    "sweep posture applied to the quality gate: for every candidate "
    f"threshold t = b/{PSI_BANDS} (b = 0..{PSI_BANDS - 1}), the docs "
    "and whitespace tokens surviving quality >= t, plus 1e4-pinned "
    "retention ratios of each.  ONE corpus scan: docs band once "
    "(shared quality_col recipe), a 10-key rollup counts "
    "(docs, tokens) per band, and each threshold's retention is the "
    "suffix sum over the banded table (a 10-row ordered window — "
    "bounded, not a per-threshold rescan; the naive form re-scans the "
    "corpus per candidate cutoff).  Zero-filled off the PSI band "
    "spine so every candidate threshold reports even when no doc "
    "lands in its band.",
    oracle=f"""{_QUALITY_TOK_CTE}, banded AS (
  SELECT least(CAST(floor(quality * {PSI_BANDS}) AS BIGINT),
               {PSI_BANDS - 1}) AS band,
         n_tok
  FROM x
), cnts AS (
  SELECT s.band,
         CAST(count(banded.band) AS BIGINT) AS n_docs,
         CAST(coalesce(sum(banded.n_tok), 0) AS BIGINT) AS n_toks
  FROM (SELECT unnest(range(0, {PSI_BANDS})) AS band) s
  LEFT JOIN banded ON s.band = banded.band
  GROUP BY s.band
), suff AS (
  SELECT band AS thr_1e1,
         sum(n_docs) OVER (ORDER BY band
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS n_kept,
         sum(n_toks) OVER (ORDER BY band
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS tok_kept
  FROM cnts
), tot AS (
  SELECT sum(n_docs) AS t_docs, sum(n_toks) AS t_toks FROM cnts
)
SELECT CAST(thr_1e1 AS BIGINT) AS thr_1e1,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(tok_kept AS BIGINT) AS tok_kept,
       CAST(n_kept * 10000 // t_docs AS BIGINT) AS doc_ratio_1e4,
       CAST(tok_kept * 10000 // t_toks AS BIGINT) AS tok_ratio_1e4
FROM suff CROSS JOIN tot
""",
)
def llm_quality_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, quality = quality_col()
    banded = table(spark, sf_dir, "documents").select(
        F.least(
            F.floor(quality * PSI_BANDS).cast("bigint"),
            F.lit(PSI_BANDS - 1).cast("bigint"),
        ).alias("band"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    spine = spark.range(0, PSI_BANDS).select(F.col("id").alias("band"))
    cnts = (
        spine.join(banded, "band", "left")
        .groupBy("band")
        .agg(
            F.count("n_tok").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0))
            .cast("bigint")
            .alias("n_toks"),
        )
    )
    # Suffix sums over the 10-row banded table: bounded ordered window
    # (10 rows by construction — not a corpus-scale unpartitioned sort).
    w = Window.orderBy("band").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    suff = cnts.select(
        F.col("band").alias("thr_1e1"),
        F.sum("n_docs").over(w).cast("bigint").alias("n_kept"),
        F.sum("n_toks").over(w).cast("bigint").alias("tok_kept"),
    )
    tot = cnts.agg(
        F.sum("n_docs").alias("t_docs"), F.sum("n_toks").alias("t_toks")
    )
    return suff.crossJoin(F.broadcast(tot)).select(
        "thr_1e1",
        "n_kept",
        "tok_kept",
        F.expr("n_kept * 10000 DIV t_docs").alias("doc_ratio_1e4"),
        F.expr("tok_kept * 10000 DIV t_toks").alias("tok_ratio_1e4"),
    )


def lang_id_model(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(profile, floors) — the trained language-ID model in exact
    micro-log10 integer units, shared by the batch query and the
    streaming serving twin (which packs both into broadcast MAPs).

    Round-17: both frames are session-memoized MATERIALIZED packs
    (plans/memo.materialize_scalar — the nb_serving_pack posture): the
    trained model is a bounded |V|×L artifact, and handing its LAZY
    lineage to consumers re-ran the corpus explode once per branch —
    llm_lang_id's plan alone re-derived it three times through the
    model (and llm_lang_confusion re-derived the whole thing again).
    A LocalRelation pack trains once per session and broadcasts free.
    (An earlier attempt cached the exploded INTERMEDIATE instead —
    measured slower than recomputation and reverted; materializing the
    bounded model output is the pattern that works, exactly as the NB
    family serves.)

    Round 18 (r17 verdict #3 / ADVICE medium): the PROFILE is |V|×L —
    bounded on this fixture (V=31) but corpus-vocabulary-sized in
    general, and materialize_scalar's contract is small frames only
    (an unbounded collect() is a driver-OOM shape at the 100 TB
    posture).  The materialization is therefore CAP-GATED: the profile
    is persisted and counted once (that pass is needed to train the
    model regardless), collected into the LocalRelation pack only when
    it fits under SPARK_GRAFT_PACK_CAP rows (default 100k ≈ a few MB),
    and otherwise served as the persisted DISTRIBUTED frame — the
    consumers broadcast-join it either way, so plans and values are
    identical; only where the bytes live changes.  The floors frame is
    |L| rows (bounded by the language count) and always packs."""
    from scala_reactivex_spark.plans.memo import (
        materialize_scalar,
        session_memo,
    )

    def build() -> tuple[DataFrame, DataFrame]:
        import os

        cap = int(os.environ.get("SPARK_GRAFT_PACK_CAP", "100000"))
        profile, floors = _lang_id_model_build(spark, sf_dir)
        profile = profile.persist()
        if profile.count() <= cap:
            packed = materialize_scalar(spark, profile)
            profile.unpersist()
            profile = packed
        return profile, materialize_scalar(spark, floors)

    return session_memo(spark, sf_dir, "lang_id_model_pack", build)


def _lang_id_model_build(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    docs = table(spark, sf_dir, "documents")
    tf = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    # Profile: P(token | lang) with add-one smoothing, one aggregate pass.
    # lang totals and vocabulary size REDERIVE from the (lang, token)
    # counts — same values (Σ n per lang ≡ token count; distinct tokens of
    # lang_tok ≡ corpus vocabulary), but the inputs are the tiny profile
    # aggregate instead of two more full passes over the exploded corpus.
    lang_tok = tf.groupBy("lang", "token").agg(F.count("*").alias("n"))
    lang_tot = lang_tok.groupBy("lang").agg(F.sum("n").alias("tot"))
    vocab_n = lang_tok.select("token").distinct().agg(
        F.count("*").alias("v")
    )
    # Integer pinning (the llm_unigram_lm convention): per-token log-probs
    # become micro-log10 BIGINTs, so every downstream sum is exact integer
    # math — order-independent across partitions AND engines.
    lp = F.floor(
        F.log10(
            (F.col("n") + 1).cast("double")
            / (F.col("tot") + F.col("v")).cast("double")
        )
        * 1000000
        + 0.5
    ).cast("bigint")
    profile = (
        lang_tok.join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(vocab_n))
        .select(F.col("lang").alias("model_lang"), "token", lp.alias("lp"))
    )
    # Smoothed floor per candidate language for UNSEEN (lang, token)
    # pairs: log10(1 / (tot + V)) in the same integer units. An inner join
    # would silently drop these terms and reward languages that never saw
    # the doc's tokens.
    fl = F.floor(
        F.log10(F.lit(1.0) / (F.col("tot") + F.col("v")).cast("double"))
        * 1000000
        + 0.5
    ).cast("bigint")
    floors = (
        lang_tot.crossJoin(F.broadcast(vocab_n))
        .select(F.col("lang").alias("model_lang"), fl.alias("fl"))
    )
    return profile, floors



@register(
    "llm_lang_id",
    tier="T3",
    doc="Language ID via learned token profiles: per-lang add-one-smoothed "
    "log-probabilities aggregated in one pass, scored per doc over EVERY "
    "candidate language (unseen (lang, token) pairs get the smoothed floor "
    "log(1/(tot+V)), not a free pass), argmax. Per-token log-probs are "
    "pinned to integer micro-log10 units (floor(log10(p)*1e6+0.5), the "
    "llm_unigram_lm convention) so doc scores are order-proof BIGINT sums "
    "and the (score DESC, lang) argmax is deterministic cross-engine — "
    "fully hash-graded, emitting the winning score as data.",
    oracle="""
WITH tf AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
), lt AS (
  SELECT lang, token, count(*) AS n FROM tf GROUP BY lang, token
), tot AS (
  SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM lt GROUP BY lang
), v AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM lt
), prof AS (
  SELECT lt.lang AS model_lang, lt.token,
         CAST(floor(log10(CAST(lt.n + 1 AS DOUBLE)
                          / CAST(t.tot + v.v AS DOUBLE)) * 1000000 + 0.5)
              AS BIGINT) AS lp
  FROM lt JOIN tot t ON lt.lang = t.lang CROSS JOIN v
), floors AS (
  SELECT t.lang AS model_lang,
         CAST(floor(log10(1.0 / CAST(t.tot + v.v AS DOUBLE)) * 1000000
                    + 0.5) AS BIGINT) AS fl
  FROM tot t CROSS JOIN v
), dtf AS (
  SELECT doc_id, lang, token, count(*) AS cnt
  FROM tf GROUP BY doc_id, lang, token
), seen AS (
  SELECT d.doc_id, p.model_lang,
         CAST(sum(p.lp * d.cnt) AS BIGINT) AS sum_seen,
         CAST(sum(d.cnt) AS BIGINT) AS n_seen
  FROM dtf d JOIN prof p ON d.token = p.token
  GROUP BY d.doc_id, p.model_lang
), stats AS (
  SELECT doc_id, lang, CAST(sum(cnt) AS BIGINT) AS n_tok
  FROM dtf GROUP BY doc_id, lang
), scored AS (
  SELECT s.doc_id, s.lang, f.model_lang,
         COALESCE(se.sum_seen, 0)
           + f.fl * (s.n_tok - COALESCE(se.n_seen, 0)) AS score
  FROM stats s CROSS JOIN floors f
  LEFT JOIN seen se
    ON se.doc_id = s.doc_id AND se.model_lang = f.model_lang
), best AS (
  SELECT doc_id, lang, model_lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, model_lang) AS rn
  FROM scored
)
SELECT doc_id, lang AS lang_true, model_lang AS lang_pred,
       CAST(score AS BIGINT) AS best_score_1e6,
       (lang = model_lang) AS correct
FROM best WHERE rn = 1
""",
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tf = docs.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    profile, floors = lang_id_model(spark, sf_dir)
    # Sparse scoring: Σ_tokens logp_eff decomposes as
    #   Σ_seen logp  +  floor × (n_tok − n_seen)
    # so only (token occurrence × languages-that-SAW-the-token) rows flow
    # through the join — doc×language granularity everywhere else. On a
    # real corpus profiles are sparse in languages, so this is far smaller
    # than the dense token×L fan-out (which is quadratic in practice when
    # L tracks corpus breadth); the unseen mass is pure column math.
    # One full pass over the exploded corpus: (doc, token) occurrence
    # counts feed BOTH the seen-mass join (logp × cnt) and the per-doc
    # token totals — and shrink the profile-join input to distinct
    # (doc, token) pairs.
    dtf = tf.groupBy("doc_id", "lang", "token").agg(
        F.count("*").alias("cnt")
    )
    seen = (
        dtf.join(F.broadcast(profile), "token")
        .groupBy("doc_id", "model_lang")
        .agg(
            F.sum(F.col("lp") * F.col("cnt")).cast("bigint").alias(
                "sum_seen"
            ),
            F.sum("cnt").cast("bigint").alias("n_seen"),
        )
    )
    doc_stats = dtf.groupBy("doc_id", "lang").agg(
        F.sum("cnt").cast("bigint").alias("n_tok")
    )
    scored = (
        doc_stats.crossJoin(F.broadcast(floors))
        .join(seen, ["doc_id", "model_lang"], "left")
        .select(
            "doc_id",
            "lang",
            "model_lang",
            (
                F.coalesce("sum_seen", F.lit(0).cast("bigint"))
                + F.col("fl")
                * (F.col("n_tok") - F.coalesce("n_seen", F.lit(0)))
            ).alias("score"),
        )
    )
    # Argmax as min_by over (-score, model_lang): identical ordering to
    # row_number(score DESC, model_lang ASC)=1, but it runs as a hash
    # aggregate with map-side combine instead of a per-doc window sort.
    # The winning score is emitted as data so the oracle grades the
    # scoring math itself, not just the argmax label.
    return scored.groupBy("doc_id", "lang").agg(
        F.expr("min_by(model_lang, struct(-score, model_lang))").alias(
            "_pred"
        ),
        F.max("score").cast("bigint").alias("best_score_1e6"),
    ).select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        F.col("_pred").alias("lang_pred"),
        "best_score_1e6",
        (F.col("lang") == F.col("_pred")).alias("correct"),
    )


@register(
    "llm_doc_fingerprint",
    tier="T3",
    doc="64-bit Karp-Rabin rolling fingerprint over UTF-8 bytes "
    "(base 257 mod 2^61-1) — Arrow-batched pandas UDF, the sanctioned "
    "Python path for byte-level work. Oracle: the same polynomial fold "
    "as a DuckDB list_reduce in HUGEINT (exact int128 arithmetic; "
    "ord(char) ≡ UTF-8 byte on the ASCII-only fixture corpus, asserted "
    "in tests/test_multimodal.py). Integer math — no float hazard.",
    oracle="""
SELECT doc_id,
       CAST(list_reduce(
         list_prepend(CAST(0 AS HUGEINT),
           list_transform(range(1, length(text) + 1),
                          i -> CAST(ord(substring(text, i, 1)) AS HUGEINT))),
         (acc, b) -> (acc * 257 + b) % CAST(2305843009213693951 AS HUGEINT)
       ) AS BIGINT) AS fingerprint
FROM documents
""",
)
def llm_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    MOD = (1 << 61) - 1
    BASE = 257

    @F.pandas_udf("long")
    def fingerprint(texts: pd.Series) -> pd.Series:
        import numpy as np

        # Horner evaluation vectorized ACROSS the Arrow batch: one numpy
        # step per byte POSITION (≤ max doc length), not one interpreter
        # step per byte per doc.  Semantics identical to the scalar
        # h = (h*BASE + b) mod M loop (M = 2^61-1, Mersenne).
        enc = [t.encode("utf-8") for t in texts]
        n = len(enc)
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
        maxlen = int(lens.max()) if n else 0
        buf = np.zeros((n, maxlen), dtype=np.uint8)
        for i, e in enumerate(enc):
            buf[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)

        M = np.uint64(MOD)
        MASK32 = np.uint64(0xFFFFFFFF)
        MASK29 = np.uint64((1 << 29) - 1)
        h = np.zeros(n, dtype=np.uint64)
        for pos in range(maxlen):
            b = buf[:, pos].astype(np.uint64)
            # h*BASE splits as h_hi*2^32*BASE + h_lo*BASE to stay in u64;
            # (x * 2^32) mod M for x < 2^38 is ((x & MASK29) << 32) + (x >> 29)
            # because 2^61 ≡ 1 (mod M).
            h_lo = h & MASK32
            h_hi = h >> np.uint64(32)
            t2 = h_hi * np.uint64(BASE)
            red = ((t2 & MASK29) << np.uint64(32)) + (t2 >> np.uint64(29))
            hn = red + h_lo * np.uint64(BASE) + b  # < 2^62, no overflow
            hn = (hn & M) + (hn >> np.uint64(61))  # Mersenne fold
            hn = np.where(hn >= M, hn - M, hn)
            h = np.where(pos < lens, hn, h)

        return pd.Series(h.astype("int64"))

    return table(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fingerprint")
    )


@register(
    "llm_text_clean",
    tier="T3",
    doc="Text normalization stage: lowercase, drop stopwords, re-join — "
    "the cleaning step ahead of tokenize/dedup in a training pipeline. "
    "Pure projection (no shuffle), emits the cleaned text + removal count.",
    oracle="""
SELECT doc_id,
       array_to_string(list_filter(string_split(lower(text), ' '),
           t -> t NOT IN ('the', 'a')), ' ') AS clean_text,
       CAST(len(string_split(text, ' '))
         - len(list_filter(string_split(lower(text), ' '),
               t -> t NOT IN ('the', 'a'))) AS BIGINT) AS n_removed
FROM documents
""",
)
def llm_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = F.expr(
        "filter(split(lower(text), ' '), t -> t NOT IN ('the', 'a'))"
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        (F.size(F.split("text", " ")) - F.size(kept))
        .cast("bigint")
        .alias("n_removed"),
    )


@register(
    "llm_doc_sample",
    tier="T3",
    doc="Deterministic content-hash sampling: keep docs whose md5 starts "
    "in [0-3] (expected 25%) — reproducible across engines, runs and "
    "cluster sizes, unlike rand()-based sampling; the standard way to cut "
    "stable training subsets.",
    oracle="""
SELECT doc_id, lang, substr(md5(text), 1, 1) AS hash1
FROM documents
WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')
""",
)
def llm_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    h1 = F.substring(F.md5(F.col("text").cast("binary")), 1, 1)
    return (
        table(spark, sf_dir, "documents")
        .withColumn("hash1", h1)
        .where(F.col("hash1").isin("0", "1", "2", "3"))
        .select("doc_id", "lang", "hash1")
    )


VOCAB_TOPK = 25


def _freq_rank_offsets(vocab: DataFrame, f_col: str) -> DataFrame:
    """Distributed rank offsets for a term-frequency table — the two-phase
    frequency-histogram rank (r6 verdict "Next round" #2).

    Returns ONE ROW PER DISTINCT FREQUENCY with::

        f_col — the frequency value
        cnt   — number of tokens at this frequency
        off   — number of tokens with a strictly HIGHER frequency
                (global rank of the group's first token, minus 1,
                under any (freq DESC, ...) ordering)
        mass  — total token occurrences at strictly higher frequencies

    computed with NO unpartitioned window, so no ``WindowExec: No
    Partition Defined`` single-partition sort anywhere:

    1. hash-aggregate the |V|-row vocab to its frequency-of-frequencies
       histogram (D rows; D ≤ distinct frequency values, empirically
       O(sqrt(corpus tokens)) ≪ |V|);
    2. running sums WITHIN log2-buckets of the frequency
       (``Window.partitionBy(bucket)`` — ≤ 64 real partitions);
    3. cross-bucket prefixes via a triangular self-join over the ≤ 64-row
       bucket-total frame (broadcast nested loop over 64×64 — bounded by
       construction, declared here per the PLANS.md allow-list policy).

    At 10^8-token web-scale vocabularies this keeps every sort inside a
    partitioned window; the old single ``Window.orderBy`` over |V| rows
    funneled the whole vocabulary through one partition.
    """
    f = F.col(f_col)
    ff = vocab.groupBy(f_col).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(f_col).cast("bigint").alias("grp_mass"),
    )
    ff = ff.withColumn("bucket", F.floor(F.log2(f)).cast("int"))
    wb = Window.partitionBy("bucket").orderBy(f.desc())
    within = ff.select(
        f_col,
        "cnt",
        "bucket",
        "grp_mass",
        (F.sum("cnt").over(wb) - F.col("cnt")).alias("off_in_b"),
        (F.sum("grp_mass").over(wb) - F.col("grp_mass")).alias("mass_in_b"),
    )
    totals = ff.groupBy("bucket").agg(
        F.sum("cnt").alias("bcnt"), F.sum("grp_mass").alias("bmass")
    )
    a, b = totals.alias("a"), totals.alias("b")
    prefix = (
        a.join(F.broadcast(b), F.col("b.bucket") > F.col("a.bucket"), "left")
        .groupBy(F.col("a.bucket").alias("bucket"))
        .agg(
            F.coalesce(F.sum("b.bcnt"), F.lit(0)).alias("pcnt"),
            F.coalesce(F.sum("b.bmass"), F.lit(0)).alias("pmass"),
        )
    )
    return within.join(F.broadcast(prefix), "bucket").select(
        f_col,
        "cnt",
        (F.col("off_in_b") + F.col("pcnt")).cast("bigint").alias("off"),
        (F.col("mass_in_b") + F.col("pmass")).cast("bigint").alias("mass"),
    )


@register(
    "llm_vocab_coverage",
    tier="T3",
    doc="Tokenizer-vocabulary induction: global token frequencies, ranked "
    "(count DESC, token ASC), with the cumulative corpus-coverage fraction "
    "a vocabulary truncated at each rank would achieve — the standard "
    "'how big must the vocab be' curve before training a tokenizer.  "
    "Scale shape (r7, two-phase rank): the corpus reduces to the |V|-row "
    "vocab table by one hash aggregate (map-side combined); a "
    "frequency-of-frequencies histogram (_freq_rank_offsets) identifies "
    "the frequency groups containing a top-K rank WITHOUT any |V|-row "
    "global sort, and only those ≤ K+ties tokens are ranked (the ranking "
    "window's frame is bounded by K, declared via a literal partition "
    "key).  The "
    "grand total joins back as a broadcast of one row.  Coverage is "
    "integer-floored at 1e-4 (bigint cumsums — no float drift).",
    oracle=f"""
WITH tf AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
), vocab AS (
  SELECT token, count(*) AS n FROM tf WHERE token <> '' GROUP BY token
), ranked AS (
  SELECT token, CAST(n AS BIGINT) AS n,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
         CAST(SUM(n) OVER (ORDER BY n DESC, token
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
  FROM vocab
)
SELECT rank, token, n,
       CAST(cum_n * 10000 // (SELECT CAST(SUM(n) AS BIGINT) FROM vocab)
            AS BIGINT) AS coverage_1e4
FROM ranked
WHERE rank <= {VOCAB_TOPK}
""",
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .where(F.col("token") != "")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("n"))
    # Two-phase rank: the histogram (D ≪ |V| rows, partitioned windows
    # only) says which frequency groups hold a rank ≤ K; only those
    # tokens survive, and their GLOBAL rank/cumsum come arithmetically
    # from the group offsets: rank = off + row_number-within-group,
    # cum_n = mass + rn·n (every token in a frequency group adds the
    # same n).  The only window is partitioned by frequency — no
    # unpartitioned (single-partition) sort anywhere in the plan.
    head_fs = _freq_rank_offsets(vocab, "n").where(
        F.col("off") < VOCAB_TOPK
    )
    head = vocab.join(
        F.broadcast(head_fs.select("n", "off", "mass")), "n"
    )
    wg = Window.partitionBy("n").orderBy(F.asc("token"))
    rn = F.row_number().over(wg)
    ranked = head.select(
        (F.col("off") + rn).cast("bigint").alias("rank"),
        "token",
        "n",
        (F.col("mass") + rn * F.col("n")).cast("bigint").alias("cum_n"),
    ).where(F.col("rank") <= VOCAB_TOPK)
    total = vocab.agg(F.sum("n").alias("total_n"))
    # Integer DIV end-to-end (matches DuckDB `//`) — a double quotient
    # could land on the wrong side of an integer boundary at scale.
    return ranked.join(F.broadcast(total)).select(
        "rank",
        "token",
        "n",
        F.expr("CAST(cum_n * 10000 DIV total_n AS BIGINT)").alias(
            "coverage_1e4"
        ),
    )


#: Denylist-redaction pattern (word-boundary alternation). The fixture
#: corpus has no literal emails/SSNs, so the scrub demonstrates the
#: mechanism on a term denylist — the identical regexp_replace pipeline
#: stage handles PII patterns on a real corpus (swap the pattern).
SCRUB_PATTERN = r"\b(customer|key|value)\b"
SCRUB_MASK = "[REDACTED]"


@register(
    "llm_pii_scrub",
    tier="T3",
    doc="Sensitive-term scrubbing (the PII-redaction stage of a training "
    "pipeline): word-boundary denylist matches are counted and replaced "
    "with a mask token, emitting the redaction count and the md5 of the "
    "scrubbed text. Pure projection — regexp runs JVM-side per row, no "
    "shuffle, embarrassingly parallel at any corpus size. The pattern "
    "subset used (\\b, alternation) behaves identically in Java regex "
    "and DuckDB's RE2, so the oracle replays the scrub verbatim.",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{SCRUB_PATTERN}'))
            AS BIGINT) AS n_redacted,
       md5(regexp_replace(text, '{SCRUB_PATTERN}',
                          '{SCRUB_MASK}', 'g')) AS scrubbed_md5
FROM documents
""",
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, r'{SCRUB_PATTERN}', 0)"))
        .cast("bigint")
        .alias("n_redacted"),
        F.md5(
            F.regexp_replace("text", SCRUB_PATTERN, SCRUB_MASK).cast(
                "binary"
            )
        ).alias("scrubbed_md5"),
    )


@register(
    "llm_seq_len_hist",
    tier="T3",
    doc="Sequence-length histogram in power-of-two buckets — the packing "
    "planner's input (choose max_seq_len / packing budget from the tail "
    "mass). Bucket = floor(log2(n_tok)) computed INTEGER-side as "
    "length(bin(n_tok))-1 (bit length), never float log2, so the "
    "2^k boundaries are exact in both engines. One tiny aggregate.",
    oracle="""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
)
SELECT CAST(length(bin(n_tok)) - 1 AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(min(n_tok) AS BIGINT) AS min_tok,
       CAST(max(n_tok) AS BIGINT) AS max_tok
FROM t GROUP BY 1
""",
)
def llm_seq_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    return (
        t.groupBy(
            (F.length(F.bin("n_tok")) - 1).cast("bigint").alias(
                "log2_bucket"
            )
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.min("n_tok").cast("bigint").alias("min_tok"),
            F.max("n_tok").cast("bigint").alias("max_tok"),
        )
    )


#: Gopher-style rule bounds (integer units; mean word length is 1e4).
QR_MIN_TOK, QR_MAX_TOK = 20, 200
QR_MIN_MWL, QR_MAX_MWL = 3_0000, 10_0000  # mean word length x 1e4
QR_TOP_MASS_MAX = 3000  # top-token mass <= 30% (1e4)
QR_DISTINCT_MIN = 2000  # distinct-token ratio >= 20% (1e4)


@register(
    "llm_quality_rules",
    tier="T3",
    doc="Gopher-style rule battery — the per-rule diagnosis table that "
    "complements the composite llm_quality_score: five independent "
    "boolean rules per doc (token-count band, mean-word-length band, "
    "top-token mass cap, distinct-ratio floor, stopword presence), the "
    "pass count, and keep = all rules pass.  Per-rule columns tell a "
    "corpus owner WHICH filter is biting — the first question when a "
    "filter drops too much.  All ratios are integer 1e4 with DIV on "
    "non-negative operands.  Scale shape: one explode → two-level hash "
    "aggregate (token stats) joined to a per-doc projection — "
    "map-side combine throughout, no windows.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), st AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_tok,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_cnt,
         CAST(sum(CASE WHEN tok IN ('the', 'a') THEN c ELSE 0 END)
              AS BIGINT) AS n_stop,
         CAST(sum(len(tok) * c) AS BIGINT) AS n_chars_tok
  FROM c GROUP BY doc_id
), r AS (
  SELECT doc_id, n_tok,
         CAST(n_tok BETWEEN {QR_MIN_TOK} AND {QR_MAX_TOK} AS INT)
           AS r_len,
         CAST(n_chars_tok * 10000 // n_tok
              BETWEEN {QR_MIN_MWL} AND {QR_MAX_MWL} AS INT) AS r_mwl,
         CAST(top_cnt * 10000 // n_tok <= {QR_TOP_MASS_MAX} AS INT)
           AS r_rep,
         CAST(n_distinct * 10000 // n_tok >= {QR_DISTINCT_MIN} AS INT)
           AS r_div,
         CAST(n_stop >= 1 AS INT) AS r_stop
  FROM st
)
SELECT doc_id, n_tok, r_len, r_mwl, r_rep, r_div, r_stop,
       CAST(r_len + r_mwl + r_rep + r_div + r_stop AS BIGINT)
         AS n_passed,
       CAST(r_len * r_mwl * r_rep * r_div * r_stop AS INT) AS keep
FROM r
""",
)
def llm_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    st = c.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tok"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_cnt"),
        F.sum(
            F.when(F.col("tok").isin(*STOPWORDS), F.col("c")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_stop"),
        F.sum(F.length("tok") * F.col("c")).cast("bigint").alias(
            "n_chars_tok"
        ),
    )
    r_len = (
        F.col("n_tok").between(QR_MIN_TOK, QR_MAX_TOK)
    ).cast("int")
    r_mwl = F.expr(
        f"CAST(n_chars_tok * 10000 DIV n_tok"
        f" BETWEEN {QR_MIN_MWL} AND {QR_MAX_MWL} AS INT)"
    )
    r_rep = F.expr(
        f"CAST(top_cnt * 10000 DIV n_tok <= {QR_TOP_MASS_MAX} AS INT)"
    )
    r_div = F.expr(
        f"CAST(n_distinct * 10000 DIV n_tok >= {QR_DISTINCT_MIN} AS INT)"
    )
    r_stop = (F.col("n_stop") >= 1).cast("int")
    r = st.select(
        "doc_id",
        "n_tok",
        r_len.alias("r_len"),
        r_mwl.alias("r_mwl"),
        r_rep.alias("r_rep"),
        r_div.alias("r_div"),
        r_stop.alias("r_stop"),
    )
    return r.select(
        "*",
        (
            F.col("r_len")
            + F.col("r_mwl")
            + F.col("r_rep")
            + F.col("r_div")
            + F.col("r_stop")
        )
        .cast("bigint")
        .alias("n_passed"),
        (
            F.col("r_len")
            * F.col("r_mwl")
            * F.col("r_rep")
            * F.col("r_div")
            * F.col("r_stop")
        )
        .cast("int")
        .alias("keep"),
    )


ZIPF_LOG_PIN = 100_000  # micro-log10 pin for the rank/frequency fit


@register(
    "llm_zipf",
    tier="T3",
    doc="Zipf's-law corpus diagnostic: least-squares slope of "
    "log10(freq) against log10(rank) over the term-frequency table, "
    "plus vocabulary size, token volume and top-term mass share — the "
    "one-row health check that catches a template-flooded or "
    "truncated crawl (a natural-language corpus fits slope ~ -1).  "
    "Determinism: rank/freq logs pin to integer 1e5 units, the "
    "closed-form slope is a ratio of exact integer sums, emitted as "
    "floor((1e4*num)/den) with both sides non-negative (slope is "
    "emitted negated; a pytest law asserts the sign), so no "
    "float-division drift can split the engines.  Scale shape (r7, "
    "two-phase rank): one explode + hash aggregate to |V| rows, then a "
    "frequency-of-frequencies histogram (_freq_rank_offsets — "
    "partitioned windows only, no |V|-row global sort) yields each "
    "frequency group's starting rank offset; the per-rank log pins are "
    "enumerated by a chunked sequence-explode over each group's "
    "contiguous rank range (64Ki-rank chunks, reshuffled across "
    "executors, so even the hapax-legomena group — half the vocabulary "
    "— parallelises), exploiting that within a frequency group the "
    "RANK SET, not the token order, determines the fit sums.  The fit "
    "sums route through DECIMAL(38,0) (HUGEINT in the oracle): sx·sy "
    "clears 2⁶³ at a ~1e6 vocabulary — measured, not hypothetical (the "
    "round-9 sf10 probe overflowed the earlier BIGINT form at a 3M "
    "vocabulary; headroom is now ~1e38).",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT token, count(*) AS f FROM tok GROUP BY token
), rk AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r FROM tf
), pins AS (
  SELECT CAST(floor(log10(CAST(r AS DOUBLE)) * {ZIPF_LOG_PIN} + 0.5)
              AS BIGINT) AS x,
         CAST(floor(log10(CAST(f AS DOUBLE)) * {ZIPF_LOG_PIN} + 0.5)
              AS BIGINT) AS y
  FROM rk
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM pins
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms,
         CAST(sum(f) AS BIGINT) AS n_tokens,
         CAST(max(f) * 10000 // sum(f) AS BIGINT) AS top_share_1e4
  FROM tf
)
SELECT m.n_terms, m.n_tokens, m.top_share_1e4,
       CAST((10000 * (s.sx * s.sy - s.n * s.sxy))
            // (s.n * s.sxx - s.sx * s.sx) AS BIGINT)
         AS neg_slope_1e4
FROM m CROSS JOIN s
""",
)
def llm_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("f"))
    )
    # Two-phase rank: within a frequency group every token shares y and
    # the group owns the contiguous rank range (off, off+cnt]; the x-pin
    # sums depend only on that RANGE, so ranks are enumerated directly
    # from the histogram offsets — no |V|-row global sort.  Chunking +
    # repartition spreads the huge f=1 (hapax) group across executors;
    # each sequence() array is ≤ 64Ki elements.
    chunk = 1 << 16
    offs = _freq_rank_offsets(tf, "f")
    chunks = offs.select(
        "f",
        "off",
        "cnt",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr(f"CAST((cnt - 1) DIV {chunk} AS BIGINT)"),
            )
        ).alias("ci"),
    ).repartition(F.col("f"), F.col("ci"))
    rk = chunks.select(
        "f",
        F.explode(
            F.sequence(
                F.col("off") + F.col("ci") * chunk + 1,
                F.least(
                    F.col("off") + F.col("cnt"),
                    F.col("off") + (F.col("ci") + 1) * chunk,
                ),
            )
        ).alias("r"),
    )
    pins = rk.select(
        F.floor(F.log10(F.col("r").cast("double")) * ZIPF_LOG_PIN + 0.5)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log10(F.col("f").cast("double")) * ZIPF_LOG_PIN + 0.5)
        .cast("bigint")
        .alias("y"),
    )
    # DECIMAL(38,0) fit sums (HUGEINT in the oracle): the closed-form
    # slope multiplies corpus-sized sums (sx·sy ≈ |V|²·pin² clears 2⁶³
    # at a ~10⁶ vocabulary — the sf10 probe measured the overflow, the
    # r7 semdedup precedent supplies the fix).  num and den are both
    # non-negative by construction (slope emitted negated; variance
    # denominator), so decimal DIV ≡ HUGEINT // exactly.
    dec = "decimal(38,0)"
    s = pins.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
    )
    m = tf.agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.expr("CAST(max(f) * 10000 DIV sum(f) AS BIGINT)").alias(
            "top_share_1e4"
        ),
    )
    return m.crossJoin(F.broadcast(s)).select(
        "n_terms",
        "n_tokens",
        "top_share_1e4",
        F.expr(
            "CAST((10000 * (sx * sy - n * sxy))"
            " DIV (n * sxx - sx * sx) AS BIGINT)"
        ).alias("neg_slope_1e4"),
    )


@register(
    "llm_lang_confusion",
    tier="T3",
    doc="Language-ID confusion matrix — the classifier-eval rollup "
    "every lang-filter deployment reads before trusting its gates: "
    "true × predicted language cell counts with per-cell share of the "
    "true language's row (1e4).  The oracle embeds llm_lang_id's green "
    "oracle, so the matrix grades as a composition of graded parts.  "
    "Scale shape: one hash aggregate over the (already bounded-key) "
    "prediction table to a langs² matrix; the row totals reuse the "
    "same aggregate via a bounded window.",
    oracle=None,  # assigned below (embeds llm_lang_id's oracle)
)
def llm_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = llm_lang_id(spark, sf_dir).select("lang_true", "lang_pred")
    cells = pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang_true")
    return cells.select(
        "lang_true",
        "lang_pred",
        "n",
        F.expr(
            "CAST(n * 10000 DIV (sum(n) OVER"
            " (PARTITION BY lang_true)) AS BIGINT)"
        ).alias("row_share_1e4"),
    )


from scala_reactivex_spark.plans.registry import peek as _peek_lc  # noqa: E402

_peek_lc("llm_lang_confusion").oracle = f"""
WITH pred AS (
{_peek_lc("llm_lang_id").oracle}
), cells AS (
  SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY lang_true, lang_pred
)
SELECT lang_true, lang_pred, n,
       CAST(n * 10000 // (sum(n) OVER (PARTITION BY lang_true))
            AS BIGINT) AS row_share_1e4
FROM cells
"""


NEG_SAMPLE_POW_1E2 = 75  # word2vec's 3/4 damping exponent


@register(
    "llm_neg_sampling",
    tier="T3",
    doc="Negative-sampling table (word2vec/GloVe prep): per token the "
    "damped sampling weight f^0.75 (pinned to 1e6 integers on "
    "identical pow doubles), the normalized probability (1e6, integer "
    "floor over the exact integer weight sum) and the cumulative "
    "bucket boundary a sampler would binary-search.  Scale shape: one "
    "corpus aggregate to |V| rows; the cumulative window runs over "
    "the VOCABULARY in deterministic (token) order.",
    oracle="""
WITH tf AS (
  SELECT token, count(*) AS f FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY token
), w AS (
  SELECT token, CAST(f AS BIGINT) AS f,
         CAST(floor(pow(CAST(f AS DOUBLE), 0.75) * 1000000 + 0.5)
              AS BIGINT) AS w1e6
  FROM tf
), s AS (
  SELECT CAST(sum(w1e6) AS BIGINT) AS tot FROM w
)
SELECT w.token, w.f, w.w1e6,
       CAST(w.w1e6 * 1000000 // s.tot AS BIGINT) AS p_1e6,
       CAST(sum(w.w1e6) OVER (ORDER BY w.token
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_w1e6
FROM w CROSS JOIN s
""",
)
def llm_neg_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    w = tf.withColumn(
        "w1e6",
        F.floor(
            F.pow(F.col("f").cast("double"), F.lit(0.75)) * 1_000_000
            + F.lit(0.5)
        ).cast("bigint"),
    )
    s = w.agg(F.sum("w1e6").cast("bigint").alias("tot"))
    cum = Window.orderBy("token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return w.crossJoin(F.broadcast(s)).select(
        "token",
        "f",
        "w1e6",
        F.expr("CAST(w1e6 * 1000000 DIV tot AS BIGINT)").alias("p_1e6"),
        F.sum("w1e6").over(cum).cast("bigint").alias("cum_w1e6"),
    )


@register(
    "llm_quality_length_corr",
    tier="T3",
    doc="Length-bias diagnostic: Pearson correlation between document "
    "token count and quality score — the check that a quality filter "
    "is not just a length filter in disguise.  Both variables are "
    "exact integers (token counts; 4-dp quality × 1e4), so every "
    "moment is an exact integer sum and the correlation is ONE "
    "division of exact integers per side, emitted in 1e4 units with "
    "the sign carried separately (numerator sign × |r|, avoiding "
    "negative floor-division divergence).  Scale shape: one corpus "
    "pass to five scalar sums — the zipf-fit pattern.",
    oracle="""
WITH x AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         CAST(floor(ROUND(
           (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 80
                 THEN 1.0 ELSE 0.5 END)
           * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                          t -> t IN ('the', 'a'))) AS DOUBLE)
              / len(string_split(text, ' ')))
           * (CAST(len(list_distinct(string_split(text, ' ')))
                   AS DOUBLE) / len(string_split(text, ' '))), 4)
           * 10000 + 0.5) AS BIGINT) AS q
  FROM documents
), s AS (
  SELECT CAST(count(*) AS HUGEINT) AS c,
         CAST(sum(n) AS HUGEINT) AS sn, CAST(sum(q) AS HUGEINT) AS sq,
         CAST(sum(n * q) AS HUGEINT) AS snq,
         CAST(sum(n * n) AS HUGEINT) AS snn,
         CAST(sum(q * q) AS HUGEINT) AS sqq
  FROM x
)
SELECT CAST(c AS BIGINT) AS n_docs,
       CAST(sign(c * snq - sn * sq) AS BIGINT) AS corr_sign,
       CAST(floor(abs(CAST(c * snq - sn * sq AS DOUBLE))
            / sqrt(CAST(c * snn - sn * sn AS DOUBLE))
            / sqrt(CAST(c * sqq - sq * sq AS DOUBLE))
            * 10000 + 0.5) AS BIGINT) AS abs_corr_1e4
FROM s
""",
)
def llm_quality_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, quality = quality_col()
    x = table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
        F.floor(quality * 10000 + F.lit(0.5)).cast("bigint").alias("q"),
    )
    # DECIMAL(38,0) moments (HUGEINT in the oracle), the zipf-fit rule:
    # sn·sq ≈ (100N)·(5000N) clears 2⁶³ at ~4M documents — fine on the
    # fixtures, not on a real corpus.  The products stay exact in
    # decimal and only then round through DOUBLE for the sqrt, so the
    # emitted value is bit-identical at every scale both engines reach.
    dec = "decimal(38,0)"
    s = x.agg(
        F.count("*").cast(dec).alias("c"),
        F.sum(F.col("n").cast(dec)).alias("sn"),
        F.sum(F.col("q").cast(dec)).alias("sq"),
        F.sum((F.col("n") * F.col("q")).cast(dec)).alias("snq"),
        F.sum((F.col("n") * F.col("n")).cast(dec)).alias("snn"),
        F.sum((F.col("q") * F.col("q")).cast(dec)).alias("sqq"),
    )
    return s.select(
        F.col("c").cast("bigint").alias("n_docs"),
        F.expr("CAST(sign(c * snq - sn * sq) AS BIGINT)").alias(
            "corr_sign"
        ),
        F.expr(
            "CAST(floor(abs(CAST(c * snq - sn * sq AS DOUBLE))"
            " / sqrt(CAST(c * snn - sn * sn AS DOUBLE))"
            " / sqrt(CAST(c * sqq - sq * sq AS DOUBLE))"
            " * 10000 + 0.5) AS BIGINT)"
        ).alias("abs_corr_1e4"),
    )


#: CTE chain shared by the NB-classifier oracles: split -> model
#: (token counts, vocab, priors, unseen penalty) -> eval scoring grid.
#: llm_nb_lang and llm_nb_margin_calibration compose from this constant
#: (same no-string-splitting rule as _IVF_ASSIGNMENT_CTES).
_NB_GRID_CTES = """
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tok,
         doc_id % 5 = 0 AS is_eval
  FROM documents
), ttok AS (
  SELECT lang, unnest(toks) AS tok FROM d WHERE NOT is_eval
), tokc AS (
  SELECT lang, tok, count(*) AS c FROM ttok GROUP BY lang, tok
), vocab AS (
  SELECT count(DISTINCT tok) AS v FROM ttok
), nd AS (
  SELECT lang, count(*) AS nd FROM d WHERE NOT is_eval GROUP BY lang
), ndt AS (
  SELECT sum(nd) AS ndt FROM nd
), cls AS (
  SELECT t.lang, t.tot, n.nd, v.v,
         CAST(floor(log10(1.0 / CAST(t.tot + v.v AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS miss_l,
         CAST(floor(log10(CAST(n.nd AS DOUBLE) / CAST(s.ndt AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS prior_l
  FROM (SELECT lang, sum(c) AS tot FROM tokc GROUP BY lang) t
  JOIN nd n USING (lang) CROSS JOIN vocab v CROSS JOIN ndt s
), llh AS (
  SELECT t.lang, t.tok,
         CAST(floor(log10(CAST(t.c + 1 AS DOUBLE)
                          / CAST(c.tot + c.v AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS l
  FROM tokc t JOIN cls c USING (lang)
), etok AS (
  SELECT doc_id, unnest(toks) AS tok FROM d WHERE is_eval
), matched AS (
  SELECT e.doc_id, l.lang, sum(l.l) AS msum, count(*) AS nm
  FROM etok e JOIN llh l USING (tok) GROUP BY e.doc_id, l.lang
), grid AS (
  SELECT d.doc_id, d.lang AS lang_true, c.lang AS cand,
         CAST(d.n_tok AS BIGINT) AS n_tok,
         CAST(coalesce(m.msum, 0) AS BIGINT)
         + (CAST(d.n_tok AS BIGINT) - coalesce(m.nm, 0)) * c.miss_l
         + c.prior_l AS score
  FROM d CROSS JOIN cls c
  LEFT JOIN matched m ON m.doc_id = d.doc_id AND m.lang = c.lang
  WHERE d.is_eval
), scored2 AS (
  SELECT doc_id, lang_true, cand, n_tok, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand) AS rn
  FROM grid
)"""


@register(
    "llm_nb_lang",
    tier="T3",
    doc="Trained multinomial Naive-Bayes language classifier — the "
    "model-based stage (the fastText-classifier analog) that "
    "complements the heuristic llm_lang_id: train on the 80% split "
    "(doc_id % 5 != 0) with +1-smoothed per-class token likelihoods "
    "and doc-count priors, score every held-out doc under every class, "
    "emit the eval confusion matrix.  Scores are SUMS OF PINNED "
    "INTEGERS (micro-log10 per token), so the argmax is exact and "
    "engine-independent — ties break on class name, no float argmax "
    "ambiguity.  Scale shape: two map-side-combined freq aggregates "
    "(the model), one hash join of eval tokens to the likelihood "
    "table, a per-(doc, class) aggregate, and a class-dim fanout "
    "(bounded crossJoin: n_classes rows, broadcast) — the classic "
    "train-once/score-everything plan with nothing quadratic; the "
    "unseen-token term folds into (n_tok − n_matched)·miss so eval "
    "docs never join on the full vocabulary.",
    oracle=_NB_GRID_CTES + """
SELECT lang_true AS lang, cand AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM scored2 WHERE rn = 1 GROUP BY lang_true, cand
""",
)
def llm_nb_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _nb_grid(spark, sf_dir)
    pred = grid.groupBy("doc_id", "lang_true").agg(
        F.expr("min_by(cand, struct(-score, cand))").alias("pred_lang")
    )
    return pred.groupBy(
        F.col("lang_true").alias("lang"), "pred_lang"
    ).agg(F.count("*").cast("bigint").alias("n_docs"))


def nb_model_frames(spark: SparkSession, sf_dir: str):
    """(cls, llh) — the trained NB model: per-class constants (token
    mass, vocab size, unseen-token penalty, doc prior) and the
    per-(lang, tok) pinned log-likelihood table, trained on the 80%
    split.  THE single definition of the training recipe: _nb_grid
    (batch scoring) and streaming.twins.nb_model_params (the serving
    pack) both build from it, so smoothing / split-rule / pinning
    changes cannot fork between batch and serving."""
    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 != 0)
        .select("lang", F.split("text", " ").alias("toks"))
    )
    tokc = (
        d.select("lang", F.explode("toks").alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    vocab = tokc.select("tok").distinct().agg(F.count("*").alias("v"))
    nd = d.groupBy("lang").agg(F.count("*").alias("nd"))
    ndt = nd.agg(F.sum("nd").alias("ndt"))
    pin = lambda col: (  # noqa: E731
        F.floor(F.log10(col) * 1_000_000 + F.lit(0.5)).cast("bigint")
    )
    # Per-class constants: token mass, doc prior, unseen-token penalty.
    # vocab/ndt are 1-row scalar attaches; cls itself is n_classes rows.
    cls = (
        tokc.groupBy("lang")
        .agg(F.sum("c").alias("tot"))
        .join(nd, "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndt))
        .select(
            "lang",
            "tot",
            "v",
            pin(
                F.lit(1.0) / (F.col("tot") + F.col("v")).cast("double")
            ).alias("miss_l"),
            pin(
                F.col("nd").cast("double") / F.col("ndt").cast("double")
            ).alias("prior_l"),
        )
    )
    llh = tokc.join(cls.select("lang", "tot", "v"), "lang").select(
        "lang",
        "tok",
        pin(
            (F.col("c") + 1).cast("double")
            / (F.col("tot") + F.col("v")).cast("double")
        ).alias("l"),
    )
    return cls, llh


def _nb_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NB scoring grid (doc_id, lang_true, cand, n_tok, score) over
    the eval split — one row per held-out doc x trained class, scores
    as sums of pinned micro-log10 integers; mirrors the oracle-side
    _NB_GRID_CTES exactly.  Disk-memoized (round 15, r14 verdict #5
    follow-through): llm_nb_lang, llm_nb_margin_calibration,
    llm_nb_filter and the calibration law test all consume it, the
    output is bounded (|eval| x n_classes rows), and the build is
    deterministic (pinned integers) — so later sessions read the
    finished grid back instead of re-running the training explode +
    join chain, the stored-model posture the serving pack already has."""
    from scala_reactivex_spark.plans.memo import disk_memo

    return disk_memo(
        spark,
        sf_dir,
        "nb_grid",
        lambda: _nb_grid_build(spark, sf_dir).persist(),
    )


def _nb_grid_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    cls, llh = nb_model_frames(spark, sf_dir)
    d = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.split("text", " ").alias("toks"),
        )
        .withColumn("n_tok", F.size("toks").cast("bigint"))
        .where(F.col("doc_id") % 5 == 0)
    )
    etok = d.select("doc_id", F.explode("toks").alias("tok"))
    matched = etok.join(llh, "tok").groupBy("doc_id", "lang").agg(
        F.sum("l").alias("msum"), F.count("*").alias("nm")
    )
    # Class-dim fanout: eval docs x n_classes — bounded broadcast
    # crossJoin (the scoring grid every argmax classifier materializes).
    grid = (
        d.select("doc_id", F.col("lang").alias("lang_true"), "n_tok")
        .crossJoin(
            F.broadcast(
                cls.select(
                    F.col("lang").alias("cand"), "miss_l", "prior_l"
                )
            )
        )
        .join(
            matched.withColumnRenamed("lang", "cand"),
            ["doc_id", "cand"],
            "left",
        )
        .select(
            "doc_id",
            "lang_true",
            "cand",
            "n_tok",
            (
                F.coalesce(F.col("msum"), F.lit(0).cast("bigint"))
                + (F.col("n_tok") - F.coalesce(F.col("nm"), F.lit(0)))
                * F.col("miss_l")
                + F.col("prior_l")
            ).alias("score"),
        )
    )
    return grid


NB_CAL_BAND_U = 25_000  # margin band width: 0.025 log10 per token
NB_CAL_BANDS = 10  # bands 0..9, top band open-ended


@register(
    "llm_nb_margin_calibration",
    tier="T3",
    doc="Classifier calibration table — the reliability artifact any "
    "model-based filter ships with before its threshold is trusted at "
    "100 TB: held-out docs bucket by PER-TOKEN decision margin (top "
    "NB score minus runner-up, DIV n_tok, banded at 0.025 log10/token, "
    f"top band open) and each band reports doc count and accuracy "
    "(1e4).  A well-behaved classifier is monotone here — accuracy "
    "rises with margin — and the band a target precision first clears "
    "IS the production threshold.  Margins are differences of pinned "
    "integer scores, so banding is exact in both engines.  Scale "
    "shape: the llm_nb_lang grid (bounded class fanout) + a per-doc "
    "5-row sorted-array aggregate + one 10-key hash rollup — no new "
    "corpus-scale stage.",
    oracle=_NB_GRID_CTES + f"""
SELECT band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE correct) AS BIGINT) AS n_correct,
       CAST(count(*) FILTER (WHERE correct) * 10000 // count(*)
            AS BIGINT) AS acc_1e4
FROM (
  SELECT CASE WHEN b.doc_id IS NULL THEN {NB_CAL_BANDS - 1}
              ELSE least((a.score - b.score) // a.n_tok
                         // {NB_CAL_BAND_U}, {NB_CAL_BANDS - 1})
         END AS band,
         a.lang_true = a.cand AS correct
  FROM scored2 a
  LEFT JOIN scored2 b ON a.doc_id = b.doc_id AND b.rn = 2
  WHERE a.rn = 1
)
GROUP BY band
""",
)
def llm_nb_margin_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = _nb_doc_margins(spark, sf_dir).select(
        "band", (F.col("pred_lang") == F.col("lang_true")).alias("correct")
    )
    return scored.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count(F.when(F.col("correct"), 1))
        .cast("bigint")
        .alias("n_correct"),
        F.expr(
            "CAST(count(CASE WHEN correct THEN 1 END) * 10000"
            " DIV count(*) AS BIGINT)"
        ).alias("acc_1e4"),
    )


def _nb_doc_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-held-out-doc NB decision frame (doc_id, lang_true, n_tok,
    pred_lang, band): argmax class and per-token margin band from the
    shared scoring grid — THE single definition of the decision rule,
    consumed by llm_nb_margin_calibration (banded accuracy), the
    llm_nb_filter keep/drop stage, and the serving twin's law test, so
    threshold semantics cannot fork between the calibration artifact
    and the filter that applies it.  Session-memoized + persisted
    (r14 verdict #5): llm_nb_margin_calibration, llm_nb_filter AND
    nb_filter_threshold all re-aggregated it on top of the memoized
    grid — three copies of the same |eval|-row sorted-array pass."""
    from scala_reactivex_spark.plans.memo import session_memo

    return session_memo(
        spark,
        sf_dir,
        "nb_doc_margins",
        lambda: _nb_doc_margins_build(spark, sf_dir).persist(),
    )


def _nb_doc_margins_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _nb_grid(spark, sf_dir)
    per = grid.groupBy("doc_id", "lang_true", "n_tok").agg(
        F.array_sort(
            F.collect_list(
                F.struct((-F.col("score")).alias("ns"), "cand")
            )
        ).alias("arr")
    )
    band = F.when(
        F.size("arr") < 2, F.lit(NB_CAL_BANDS - 1).cast("bigint")
    ).otherwise(
        F.least(
            F.expr(
                f"(arr[1].ns - arr[0].ns) DIV n_tok DIV {NB_CAL_BAND_U}"
            ),
            F.lit(NB_CAL_BANDS - 1).cast("bigint"),
        )
    )
    return per.select(
        "doc_id",
        "lang_true",
        "n_tok",
        F.col("arr")[0].getField("cand").alias("pred_lang"),
        band.alias("band"),
    )


#: Production precision target for the NB language filter: keep a doc
#: only if its margin band's HELD-OUT accuracy clears this (1e4 units).
NB_FILTER_TARGET_1E4 = 7000

#: Shared docband CTE (the SQL twin of _nb_doc_margins): per-eval-doc
#: argmax class + per-token margin band over the _NB_GRID_CTES grid.
_NB_DOCBAND_CTE = f""", docband AS (
  SELECT a.doc_id, a.lang_true, a.cand AS pred_lang,
         CASE WHEN b.doc_id IS NULL THEN {NB_CAL_BANDS - 1}
              ELSE least((a.score - b.score) // a.n_tok
                         // {NB_CAL_BAND_U}, {NB_CAL_BANDS - 1})
         END AS band
  FROM scored2 a
  LEFT JOIN scored2 b ON a.doc_id = b.doc_id AND b.rn = 2
  WHERE a.rn = 1
)"""


def nb_filter_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (thr_band) frame: the lowest margin band whose held-out
    accuracy clears NB_FILTER_TARGET_1E4 (no band qualifying ⇒ past the
    top band, drop everything).  THE single definition of the
    threshold derivation — llm_nb_filter applies it in batch and
    streaming.twins.twin_nb_filter broadcasts it to the serving path,
    so the production gate cannot fork from the calibration artifact."""
    cal = _nb_doc_margins(spark, sf_dir).groupBy("band").agg(
        F.expr(
            "CAST(count(CASE WHEN pred_lang = lang_true THEN 1 END)"
            " * 10000 DIV count(*) AS BIGINT)"
        ).alias("acc_1e4")
    )
    # 1-row threshold scalar (bounded: <= NB_CAL_BANDS input rows),
    # broadcast-attached by every consumer.
    return cal.agg(
        F.coalesce(
            F.min(
                F.when(
                    F.col("acc_1e4") >= NB_FILTER_TARGET_1E4,
                    F.col("band"),
                )
            ),
            F.lit(NB_CAL_BANDS).cast("bigint"),
        ).alias("thr_band")
    )


@register(
    "llm_nb_filter",
    tier="T3",
    doc="Calibration-thresholded NB language filter — the composed "
    "keep/drop stage that CONSUMES llm_nb_margin_calibration's "
    "artifact (r13 verdict #7, the llm_corpus_filter-consumes-"
    "quality-rules analog): the per-band held-out accuracy table is "
    "computed from the shared _nb_doc_margins decision frame, the "
    "production threshold is the LOWEST band whose accuracy clears "
    f"{NB_FILTER_TARGET_1E4} (1e4 units; no band qualifying ⇒ "
    "threshold past the top band, drop everything), and each doc is "
    "kept iff its own margin band is at or above it.  lang_true "
    "enters only the calibration aggregate — the per-doc decision "
    "path (pred_lang, band >= thr) is exactly what runs over an "
    "UNLABELED corpus in production.  The keep rate is therefore a "
    "pure function of the calibration table (law-tested in "
    "tests/test_nb_filter.py).  Scale shape: the shared bounded "
    "scoring grid + one 10-row calibration aggregate broadcast back "
    "over the docs — no new corpus-scale stage.",
    oracle=_NB_GRID_CTES + _NB_DOCBAND_CTE + f""", cal AS (
  SELECT band,
         count(*) FILTER (WHERE lang_true = pred_lang) * 10000
           // count(*) AS acc_1e4
  FROM docband GROUP BY band
), thr AS (
  SELECT coalesce(
           min(CASE WHEN acc_1e4 >= {NB_FILTER_TARGET_1E4}
                    THEN band END),
           {NB_CAL_BANDS}) AS thr_band
  FROM cal
)
SELECT d.doc_id, d.pred_lang,
       CAST(d.band AS BIGINT) AS band,
       CAST(t.thr_band AS BIGINT) AS thr_band,
       CAST(d.band >= t.thr_band AS INT) AS kept
FROM docband d CROSS JOIN thr t
""",
)
def llm_nb_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    margins = _nb_doc_margins(spark, sf_dir)
    thr = nb_filter_threshold(spark, sf_dir)
    return margins.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "pred_lang",
        F.col("band").cast("bigint").alias("band"),
        F.col("thr_band").cast("bigint").alias("thr_band"),
        (F.col("band") >= F.col("thr_band")).cast("int").alias("kept"),
    )
