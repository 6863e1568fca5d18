"""Per-document corpus quality signals (SURVEY.md §2.10 family, round 3).

The filtering stage of a pretraining-data pipeline scores every document
with cheap statistical signals before any model-based scoring:

- ``llm_repetition_score``: Gopher-style repetition — top-token and
  top-bigram mass plus the distinct-token ratio.  Highly repetitive
  documents (boilerplate, generated spam, scraped menus) light up here.
- ``llm_token_entropy``: unigram Shannon entropy per document — the
  information-density cousin of the repetition score (low entropy ⇒
  few tokens dominate).
- ``llm_unigram_lm``: corpus-level unigram language-model score — the
  summed log10 probability of each document's tokens under the corpus
  unigram distribution, the classic cheap perplexity proxy for outlier
  detection.
- ``llm_cdc_chunks``: content-defined chunking — boundaries where the
  hash of a sliding token shingle lands in a fixed residue class, so
  chunk edges move WITH the content (insert a word and only the local
  chunk changes — the property dedup-friendly chunking needs; fixed-size
  chunking reshuffles every downstream boundary).
- ``llm_embed_norm_stats``: per-label embedding L2-norm health stats —
  the standard sanity sweep before ANN indexing (norm collapse or
  explosion per class is the first thing to check).

Determinism (§2.11): every ratio/score that crosses the engine boundary
is integer (scaled by 1e4/1e6 with an explicit half-up floor on identical
doubles) or ROUND(x,4); integer division is Spark ``DIV`` ≡ DuckDB ``//``
on non-negative operands only (negative semantics differ — never divide
negatives); DuckDB integer SUM/``count`` widenings are pinned to BIGINT.

Scale shape: every operator is explode → map-side-combined aggregate (or
a pure projection), no driver collection, no all-pairs join.  The one
scalar (corpus token total) rides a 1-row broadcast cross join, the same
declared pattern as llm_vocab_coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.portable_hash import (
    kr31_duck_expr,
)
from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

CDC_W = 4  # chunking shingle width (tokens)


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok) — whitespace tokens, the shared corpus convention."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )


@register(
    "llm_repetition_score",
    tier="T3",
    doc="Gopher-style repetition signals per document: total/distinct "
    "token counts, the mass of the single most frequent token and of the "
    "most frequent bigram (scaled 1e4, integer DIV).  Scale shape: two "
    "explode→two-level hash aggregates joined on doc_id — map-side "
    "partials throughout, no windows over the corpus, no driver state.",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), per_doc AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_cnt
  FROM c GROUP BY doc_id
), w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(words) - 1),
                i -> array_to_string(words[i:i+1], ' '))) AS b
  FROM w WHERE len(words) >= 2
), bc AS (
  SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
), bper AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigram,
         CAST(max(c) AS BIGINT) AS top_bg
  FROM bc GROUP BY doc_id
)
SELECT p.doc_id, p.n_tok, p.n_distinct,
       CAST(p.top_cnt * 10000 // p.n_tok AS BIGINT) AS top_tok_1e4,
       CAST(p.n_distinct * 10000 // p.n_tok AS BIGINT) AS distinct_1e4,
       CAST(b.top_bg * 10000 // b.n_bigram AS BIGINT) AS top_bigram_1e4
FROM per_doc p JOIN bper b USING (doc_id)
""",
)
def llm_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = (
        _doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    per_doc = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tok"),
        F.count("*").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_cnt"),
    )
    words = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    bg = words.where(F.size("words") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("words"), i, 2)),
            )
        ).alias("b"),
    )
    bper = (
        bg.groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigram"),
            F.max("c").cast("bigint").alias("top_bg"),
        )
    )
    return per_doc.join(bper, "doc_id").select(
        "doc_id",
        "n_tok",
        "n_distinct",
        F.expr("CAST(top_cnt * 10000 DIV n_tok AS BIGINT)").alias(
            "top_tok_1e4"
        ),
        F.expr("CAST(n_distinct * 10000 DIV n_tok AS BIGINT)").alias(
            "distinct_1e4"
        ),
        F.expr("CAST(top_bg * 10000 DIV n_bigram AS BIGINT)").alias(
            "top_bigram_1e4"
        ),
    )


@register(
    "llm_token_entropy",
    tier="T3",
    doc="Unigram Shannon entropy per document (bits): H = -Σ p·log2(p) "
    "over the doc's token distribution, ROUND(,4) both engines.  The "
    "per-token terms are IEEE ops on identical doubles; the per-doc sum "
    "spans ≤|vocab| terms so cross-engine accumulation drift is far below "
    "the 1e-4 grid.  Scale shape: one explode→(doc,tok) aggregate, a "
    "doc-partitioned window for the total, one final aggregate.",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), c AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), e AS (
  SELECT doc_id, c,
         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
  FROM c
)
SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tok, count(*) AS n_distinct,
       ROUND(-sum((CAST(c AS DOUBLE) / n)
                  * log2(CAST(c AS DOUBLE) / n)), 4) AS entropy
FROM e GROUP BY doc_id
""",
)
def llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    cnt = (
        _doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy("doc_id")).cast("bigint")
    e = cnt.withColumn("n", n)
    p = F.col("c").cast("double") / F.col("n")
    return e.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("n_tok"),
        F.count("*").alias("n_distinct"),
        F.round(-F.sum(p * F.log2(p)), 4).alias("entropy"),
    )


@register(
    "llm_unigram_lm",
    tier="T3",
    doc="Corpus-unigram LM score — the cheap perplexity proxy: each "
    "token contributes log10(count(tok)/total_tokens); the per-doc sum "
    "is emitted as an INTEGER (per-token half-up floor at 1e6 on "
    "identical doubles, then exact integer summation) so cross-engine "
    "accumulation order cannot drift the hash.  Scale shape: the "
    "frequency table is one map-side-combined aggregate joined back on "
    "the token key (AQE picks broadcast vs shuffle by vocab size); the "
    "corpus total is a 1-row broadcast cross join (declared, allow-"
    "listed); per-doc score is one final aggregate.",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), t AS (
  SELECT CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS t FROM freq
)
SELECT toks.doc_id, count(*) AS n_tok,
       CAST(sum(CAST(floor(log10(CAST(f.c AS DOUBLE) / t.t) * 1000000
                           + 0.5) AS BIGINT)) AS BIGINT) AS logp_sum_1e6
FROM toks JOIN freq f USING (tok) CROSS JOIN t
GROUP BY toks.doc_id
""",
)
def llm_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _doc_tokens(spark, sf_dir)
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = freq.agg(
        F.sum("c").cast("bigint").cast("double").alias("t")
    )
    lp = F.floor(
        F.log10(F.col("c").cast("double") / F.col("t")) * 1000000 + 0.5
    ).cast("bigint")
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(lp).cast("bigint").alias("logp_sum_1e6"),
        )
    )


@register(
    "llm_cdc_chunks",
    tier="T3",
    doc=f"Content-defined chunking: a boundary falls after every "
    f"{CDC_W}-token shingle whose md5 starts with nibble 0 or 1 "
    "(expected boundary rate 1/8 ⇒ ~8-token chunks) — edges are a pure "
    "function of local content, so an edit only re-chunks its own "
    "neighborhood (the invariant CDC exists for; fixed-width chunking "
    "shifts every later boundary).  Emits per-doc shingle/boundary/chunk "
    "counts.  Scale shape: explode → one aggregate, embarrassingly "
    "parallel; md5 is JVM-side codegen, no Python.",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(words) - {CDC_W - 1}),
                i -> array_to_string(words[i:i+{CDC_W - 1}], ' '))) AS s
  FROM w WHERE len(words) >= {CDC_W}
)
SELECT doc_id, count(*) AS n_shingles,
       CAST(count(*) FILTER (WHERE substr(md5(s), 1, 1) IN ('0', '1'))
            AS BIGINT) AS n_bounds,
       CAST(count(*) FILTER (WHERE substr(md5(s), 1, 1) IN ('0', '1'))
            + 1 AS BIGINT) AS n_chunks
FROM sh GROUP BY doc_id
""",
)
def llm_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    sh = words.where(F.size("words") >= CDC_W).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - (CDC_W - 1)),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("words"), i, CDC_W)
                ),
            )
        ).alias("s"),
    )
    is_bound = F.substring(F.md5(F.col("s").cast("binary")), 1, 1).isin(
        "0", "1"
    )
    return sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.count(F.when(is_bound, 1)).cast("bigint").alias("n_bounds"),
        (F.count(F.when(is_bound, 1)) + 1).cast("bigint").alias("n_chunks"),
    )


@register(
    "llm_embed_norm_stats",
    tier="T3",
    doc="Embedding L2-norm health per label — the pre-ANN sanity sweep "
    "(norm collapse/explosion per class breaks cosine indexes).  The "
    "in-vector square sum folds in array order (identical fold order "
    "both engines ⇒ identical double), then the per-row norm is pinned "
    "to an integer (half-up floor at 1e6) so the cross-row aggregation "
    "order cannot drift: sum/min/max are exact integer ops.  Scale "
    "shape: one projection + one map-side-combined aggregate on a "
    "low-cardinality key.",
    oracle="""
WITH n AS (
  SELECT label,
         CAST(floor(sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * 1000000 + 0.5) AS BIGINT) AS norm_1e6
  FROM embeddings
)
SELECT label, count(*) AS n_vecs,
       CAST(sum(norm_1e6) AS BIGINT) AS sum_norm_1e6,
       CAST(min(norm_1e6) AS BIGINT) AS min_norm_1e6,
       CAST(max(norm_1e6) AS BIGINT) AS max_norm_1e6
FROM n GROUP BY label
""",
)
def llm_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(
            "embedding", lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    norm_1e6 = F.floor(F.sqrt(sq_sum) * 1000000 + 0.5).cast("bigint")
    return (
        e.select("label", norm_1e6.alias("norm_1e6"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("norm_1e6").cast("bigint").alias("sum_norm_1e6"),
            F.min("norm_1e6").cast("bigint").alias("min_norm_1e6"),
            F.max("norm_1e6").cast("bigint").alias("max_norm_1e6"),
        )
    )


TFIDF_TOPK = 3  # top terms kept per document


@register(
    "llm_tfidf",
    tier="T3",
    doc=f"TF-IDF top-{TFIDF_TOPK} terms per document: tf·ln(N/df) pinned "
    "to integer 1e4 (tf and N/df are identical bigints/doubles both "
    "engines, so the product and ln are identical IEEE ops), ranked per "
    "doc by (score DESC, term) — a total order, so the top-k frontier "
    "cannot drift.  Scale shape: tf and df are two map-side-combined "
    "aggregates; the df join is on the token key (AQE broadcasts if the "
    "vocab collapses); N rides a declared 1-row broadcast cross join; the "
    "per-doc rank window partitions by doc_id — no corpus-wide sort.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), n AS (
  SELECT count(*) AS n FROM documents
), s AS (
  SELECT tf.doc_id, tf.tok, CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         CAST(floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 10000 + 0.5)
              AS BIGINT) AS tfidf_1e4
  FROM tf JOIN df USING (tok) CROSS JOIN n
), r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_1e4 DESC, tok) AS rnk
  FROM s
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok, tf, df, tfidf_1e4
FROM r WHERE rnk <= {TFIDF_TOPK}
""",
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        _doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    n = table(spark, sf_dir, "documents").agg(F.count("*").alias("n"))
    score = F.floor(
        F.col("tf")
        * F.log(F.col("n").cast("double") / F.col("df"))
        * 10000
        + 0.5
    ).cast("bigint")
    s = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "tok", "tf", "df", score.alias("tfidf_1e4"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_1e4").desc(), F.col("tok")
    )
    return (
        s.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= TFIDF_TOPK)
        .select("doc_id", "rnk", "tok", "tf", "df", "tfidf_1e4")
    )


@register(
    "llm_embed_centroid",
    tier="T3",
    doc="Per-label embedding centroid by vector position — the class-"
    "prototype build that seeds IVF/k-NN classifiers.  Each component is "
    "pinned to integer 1e6 BEFORE aggregation (identical float→double "
    "casts both engines), so sums are exact integers in any order; the "
    "centroid itself is floor(sum/n) on identical doubles (floor is "
    "toward −∞ in both engines — safe for negative components, unlike "
    "integer DIV).  Scale shape: posexplode → one map-side-combined "
    "aggregate on the bounded (label, pos) key — |labels|·dim cells of "
    "state regardless of corpus size.",
    oracle="""
WITH x AS (
  SELECT label, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS v
  FROM (SELECT label, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
)
SELECT label, CAST(i - 1 AS BIGINT) AS pos, count(*) AS n_vecs,
       CAST(sum(v) AS BIGINT) AS sum_1e6,
       CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)
           AS centroid_1e6,
       CAST(min(v) AS BIGINT) AS min_1e6,
       CAST(max(v) AS BIGINT) AS max_1e6
FROM x GROUP BY label, i
""",
)
def llm_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    v = F.floor(F.col("val").cast("double") * 1000000 + 0.5).cast("bigint")
    return (
        e.select("label", F.col("pos").cast("bigint").alias("pos"), v.alias("v"))
        .groupBy("label", "pos")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("v").cast("bigint").alias("sum_1e6"),
            F.floor(F.sum("v").cast("double") / F.count("*"))
            .cast("bigint")
            .alias("centroid_1e6"),
            F.min("v").cast("bigint").alias("min_1e6"),
            F.max("v").cast("bigint").alias("max_1e6"),
        )
    )


@register(
    "llm_domain_mix",
    tier="T3",
    doc="Training-mix matrix: per (source, lang) document and token counts "
    "with integer 1e4 corpus shares — the table a data-mixing plan is "
    "negotiated over.  Token counts come from size(split(…)) per doc (no "
    "explode — one projection), aggregated on a low-cardinality key; the "
    "corpus totals ride a declared 1-row broadcast cross join; shares are "
    "non-negative integer DIV.",
    oracle="""
WITH per AS (
  SELECT source, lang, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_sum
  FROM documents GROUP BY source, lang
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs,
         CAST(sum(tok_sum) AS BIGINT) AS tot_toks
  FROM per
)
SELECT source, lang, n_docs, tok_sum,
       CAST(n_docs * 10000 // tot_docs AS BIGINT) AS doc_share_1e4,
       CAST(tok_sum * 10000 // tot_toks AS BIGINT) AS tok_share_1e4
FROM per CROSS JOIN tot
""",
)
def llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tok_sum"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("tot_docs"),
        F.sum("tok_sum").cast("bigint").alias("tot_toks"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "tok_sum",
        F.expr("CAST(n_docs * 10000 DIV tot_docs AS BIGINT)").alias(
            "doc_share_1e4"
        ),
        F.expr("CAST(tok_sum * 10000 DIV tot_toks AS BIGINT)").alias(
            "tok_share_1e4"
        ),
    )


WINNOW_K = 4  # shingle width (tokens)
WINNOW_W = 5  # winnowing window (shingles)


def _winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized shingle-fingerprint frame (doc_id, fps) shared by
    llm_winnowing and llm_winnowing_match.  PERSISTED: a bare column
    alias is NOT enough — CollapseProject re-inlines the md5 chain into
    the per-window lambda (O(windows x shingles) md5 evaluations per
    doc, measured 20x slower), and the frame feeds four consumers (fp
    counts, both self-join sides, sizes).  One build per session
    (plans/memo.py) instead of one persisted copy per call."""
    from scala_reactivex_spark.plans.memo import session_memo

    def build() -> DataFrame:
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", F.split("text", " ").alias("words")
        )
        fps = F.transform(
            F.sequence(F.lit(1), F.size("words") - (WINNOW_K - 1)),
            lambda i: F.substring(
                F.md5(
                    F.concat_ws(
                        " ", F.slice(F.col("words"), i, WINNOW_K)
                    ).cast("binary")
                ),
                1,
                16,
            ),
        )
        return (
            docs.where(F.size("words") >= WINNOW_K + WINNOW_W - 1)
            .select("doc_id", fps.alias("fps"))
            .persist()
        )

    return session_memo(spark, sf_dir, "winnow_fps", build)


@register(
    "llm_winnowing",
    tier="T3",
    doc=f"Winnowing document fingerprints (the MOSS scheme): hash every "
    f"{WINNOW_K}-token shingle, slide a {WINNOW_W}-shingle window, keep "
    "each window's MINIMUM hash — guarantees any match of ≥ w+k-1 tokens "
    "shares a fingerprint, at ~2/(w+1) selection density.  Hashes are "
    "16-hex-char md5 prefixes compared as STRINGS (fixed-width lowercase "
    "hex ⇒ lexicographic = numeric — no cross-engine hex→int conversion). "
    "Scale shape: entirely per-row array math (one projection, no "
    "shuffle, no UDF — all codegen'd higher-order functions).",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), f AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(words) - {WINNOW_K - 1}),
             i -> substr(md5(array_to_string(words[i:i+{WINNOW_K - 1}], ' ')),
                         1, 16)) AS fps
  FROM w WHERE len(words) >= {WINNOW_K + WINNOW_W - 1}
), s AS (
  SELECT doc_id, len(fps) AS n_shingles,
         list_transform(generate_series(1, len(fps) - {WINNOW_W - 1}),
             j -> list_min(fps[j:j+{WINNOW_W - 1}])) AS wins
  FROM f
)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(len(wins) AS BIGINT) AS n_windows,
       CAST(len(list_distinct(wins)) AS BIGINT) AS n_fp,
       list_min(wins) AS min_fp, list_max(wins) AS max_fp
FROM s
""",
)
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _winnow_fps(spark, sf_dir)
    wins = F.transform(
        F.sequence(F.lit(1), F.size("fps") - (WINNOW_W - 1)),
        lambda j: F.array_min(F.slice(F.col("fps"), j, WINNOW_W)),
    )
    return d.select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_shingles"),
        wins.alias("wins"),
    ).select(
        "doc_id",
        "n_shingles",
        F.size("wins").cast("bigint").alias("n_windows"),
        F.size(F.array_distinct("wins")).cast("bigint").alias("n_fp"),
        F.array_min("wins").alias("min_fp"),
        F.array_max("wins").alias("max_fp"),
    )


#: Adjacent-token pairs as a struct array — the conditional-LM analogue of
#: SHINGLE_EXPR (order-sensitive, shared by Spark side only; the oracle
#: uses DuckDB's lockstep double-unnest).
BIGRAM_PAIR_EXPR = (
    "transform(sequence(0, size(words) - 2), "
    "i -> struct(words[i] AS b1, words[i+1] AS b2))"
)


@register(
    "llm_bigram_lm",
    tier="T3",
    doc="Corpus-bigram conditional LM score — the next-step perplexity "
    "proxy after llm_unigram_lm: each adjacent pair contributes "
    "log10(count(w1,w2) / count(w1 as prefix)), i.e. log P(w2|w1) under "
    "the corpus bigram model (no smoothing needed: every scored bigram "
    "exists in the model by construction). Per-doc sums are emitted as "
    "INTEGERS (per-pair half-up floor at 1e6 on identical doubles, exact "
    "integer summation) so accumulation order cannot drift the hash. "
    "Scale shape: two map-side-combined frequency aggregates joined back "
    "on the pair/prefix keys (AQE picks broadcast vs shuffle by vocab "
    "size), one final per-doc aggregate — no windows over the corpus, no "
    "driver state.",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i])) AS b1,
         unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i + 1])) AS b2
  FROM w
), bgfreq AS (
  SELECT b1, b2, count(*) AS c2 FROM bg GROUP BY b1, b2
), prefix AS (
  SELECT b1, count(*) AS c1 FROM bg GROUP BY b1
)
SELECT bg.doc_id, count(*) AS n_bigram,
       CAST(sum(CAST(floor(log10(CAST(f.c2 AS DOUBLE)
                                 / CAST(p.c1 AS DOUBLE)) * 1000000
                           + 0.5) AS BIGINT)) AS BIGINT) AS logp_sum_1e6
FROM bg
JOIN bgfreq f USING (b1, b2)
JOIN prefix p USING (b1)
GROUP BY bg.doc_id
""",
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 18 (guide §1.2-order-2 per-task work, after a measured
    # false start): the occurrence stream was NEVER shuffled here (the
    # frequency aggregates partial-combine to vocab²-bounded keys and
    # the scoring joins broadcast), so a (doc, b1, b2) pre-aggregate —
    # the first attempt — ADDED a corpus-scale exchange and measured
    # SLOWER (1.01 → 1.5 s warm isolated), and deriving prefix FROM
    # bgfreq serialized two aggregate stages that previously ran
    # concurrently (+0.3 s — both negatives measured via interleaved
    # same-session A/B and discarded).  What does win: lp is computed
    # once per DISTINCT pair in the bounded pairlp dimension and the
    # occurrence stream does ONE broadcast join (a hash lookup per
    # row) instead of two joins plus log10/divisions per occurrence;
    # the frequency aggregates stay independent parallel branches.
    # Interleaved A/B: 1.178 → 1.051 s warm.  Values exactly as
    # before; oracle unchanged.
    w = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .where(F.size("words") >= 2)
    )
    bg = w.select(
        "doc_id", F.explode(F.expr(BIGRAM_PAIR_EXPR)).alias("bb")
    ).select("doc_id", "bb.b1", "bb.b2")
    bgfreq = bg.groupBy("b1", "b2").agg(F.count("*").alias("c2"))
    prefix = bg.groupBy("b1").agg(F.count("*").alias("c1"))
    lp = F.floor(
        F.log10(F.col("c2").cast("double") / F.col("c1").cast("double"))
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    pairlp = bgfreq.join(prefix, ["b1"]).select("b1", "b2", lp.alias("lp"))
    return (
        bg.join(pairlp, ["b1", "b2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigram"),
            F.sum("lp").cast("bigint").alias("logp_sum_1e6"),
        )
    )


#: Count thresholds the LM-pruning audit sweeps (min bigram count kept).
LM_PRUNE_THRESHOLDS = (1, 2, 4, 8)


@register(
    "llm_ngram_lm_prune",
    tier="T3",
    doc="Count-threshold LM pruning audit (round 15) — the table-size "
    "vs coverage trade every n-gram LM ships with (the classic "
    "count-cutoff pruning of SRILM/KenLM): for each threshold in "
    f"{LM_PRUNE_THRESHOLDS}, keep only bigram TYPES seen >= t times "
    "and report types kept, type retention (1e4) and OCCURRENCE "
    "coverage retained (1e4) — the number that says how much of the "
    "corpus the pruned model still scores without backoff.  Composes "
    "the SAME bigram frequency table as llm_bigram_lm (one gram-key "
    "shuffle); the threshold sweep is a bounded conditional rollup "
    "over gram types — types ≪ occurrences, and no per-threshold "
    "corpus re-scan.  Scale shape: identical to llm_bigram_lm's "
    "frequency pass; the sweep adds one broadcast-size aggregate.",
    oracle=f"""
WITH w AS (
  SELECT string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), bg AS (
  SELECT unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i])) AS b1,
         unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i + 1])) AS b2
  FROM w
), bgfreq AS (
  SELECT b1, b2, count(*) AS c2 FROM bg GROUP BY b1, b2
), thr(t) AS (
  VALUES {', '.join(f'({t})' for t in LM_PRUNE_THRESHOLDS)}
)
SELECT thr.t AS min_count,
       CAST(count(*) FILTER (WHERE c2 >= thr.t) AS BIGINT)
         AS kept_grams,
       CAST(count(*) AS BIGINT) AS total_grams,
       CAST(count(*) FILTER (WHERE c2 >= thr.t) * 10000 // count(*)
            AS BIGINT) AS kept_1e4,
       CAST(sum(c2) FILTER (WHERE c2 >= thr.t) * 10000 // sum(c2)
            AS BIGINT) AS covered_1e4
FROM bgfreq CROSS JOIN thr GROUP BY thr.t
""",
)
def llm_ngram_lm_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        table(spark, sf_dir, "documents")
        .select(F.split("text", " ").alias("words"))
        .where(F.size("words") >= 2)
    )
    bg = w.select(F.explode(F.expr(BIGRAM_PAIR_EXPR)).alias("bb")).select(
        "bb.b1", "bb.b2"
    )
    bgfreq = bg.groupBy("b1", "b2").agg(F.count("*").alias("c2"))
    thr = F.explode(
        F.array(*[F.lit(t) for t in LM_PRUNE_THRESHOLDS])
    ).alias("min_count")
    return (
        bgfreq.select("c2", thr)
        .groupBy("min_count")
        .agg(
            F.count(F.when(F.col("c2") >= F.col("min_count"), 1))
            .cast("bigint")
            .alias("kept_grams"),
            F.count("*").cast("bigint").alias("total_grams"),
            F.expr(
                "CAST(count(CASE WHEN c2 >= min_count THEN 1 END)"
                " * 10000 DIV count(*) AS BIGINT)"
            ).alias("kept_1e4"),
            F.expr(
                "CAST(sum(CASE WHEN c2 >= min_count THEN c2 END)"
                " * 10000 DIV sum(c2) AS BIGINT)"
            ).alias("covered_1e4"),
        )
    )


WINNOW_FP_CAP = 64  # skip fingerprints shared by more than this many docs
WINNOW_MATCH_MIN = 2  # report pairs sharing at least this many fingerprints

#: Shared winnowing-selection CTE — identical to llm_winnowing's chain
#: through the per-doc selected-fingerprint set.
_WINNOW_SEL_CTE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), f AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(words) - {WINNOW_K - 1}),
             i -> substr(md5(array_to_string(words[i:i+{WINNOW_K - 1}], ' ')),
                         1, 16)) AS fps
  FROM w WHERE len(words) >= {WINNOW_K + WINNOW_W - 1}
), s AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, len(fps) - {WINNOW_W - 1}),
             j -> list_min(fps[j:j+{WINNOW_W - 1}]))) AS sel
  FROM f
), inv AS (
  SELECT doc_id, unnest(sel) AS fp FROM s
), fpc AS (
  SELECT fp, count(*) AS nd FROM inv GROUP BY fp
), kept AS (
  SELECT inv.doc_id, inv.fp
  FROM inv JOIN fpc USING (fp) WHERE fpc.nd <= {WINNOW_FP_CAP}
), sizes AS (
  SELECT doc_id, count(*) AS n_fp FROM inv GROUP BY doc_id
)"""


def _winnow_inv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized inverted index (doc_id, fp) of each document's
    DISTINCT selected winnowing fingerprints.  PERSISTED: inside
    llm_winnowing_match it feeds four consumers (the fp-frequency
    aggregate, per-doc sizes, and both sides of the pair self-join) —
    un-memoized, the O(windows x W) array_min selection chain re-runs
    for every consumer."""
    from scala_reactivex_spark.plans.memo import session_memo

    def build() -> DataFrame:
        d = _winnow_fps(spark, sf_dir)
        sel = d.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("fps") - (WINNOW_W - 1)),
                    lambda j: F.array_min(
                        F.slice(F.col("fps"), j, WINNOW_W)
                    ),
                )
            ).alias("sel"),
        )
        return sel.select(
            "doc_id", F.explode("sel").alias("fp")
        ).persist()

    return session_memo(spark, sf_dir, "winnow_inv", build)


@register(
    "llm_winnowing_match",
    tier="T3",
    doc="Fingerprint match detection (the MOSS report stage): documents "
    "sharing winnowing fingerprints pair up via an inverted index on the "
    f"fingerprint key; pairs sharing >= {WINNOW_MATCH_MIN} fingerprints "
    "are reported with the shared count and the overlap ratio against "
    "the smaller selected set (1e4).  Fingerprints shared by more than "
    f"{WINNOW_FP_CAP} docs are skipped before the self-join — the same "
    "hot-key guard as the MinHash bucket cap (boilerplate fingerprints "
    "pair everything with everything and carry no match signal).  Scale "
    "shape: per-row selection (zero shuffle) → inverted-index self-join "
    "on the fingerprint key → pair aggregate; the winnowing guarantee "
    "(any >= w+k-1-token match shares a fingerprint) bounds recall "
    "analytically, not empirically.",
    oracle=f"""{_WINNOW_SEL_CTE}, pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM kept a JOIN kept b
    ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(n_shared * 10000 // least(sa.n_fp, sb.n_fp) AS BIGINT)
         AS overlap_1e4
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_shared >= {WINNOW_MATCH_MIN}
""",
)
def llm_winnowing_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    inv = _winnow_inv(spark, sf_dir)
    fpc = inv.groupBy("fp").agg(F.count("*").alias("nd"))
    kept = inv.join(fpc, "fp").where(
        F.col("nd") <= WINNOW_FP_CAP
    ).select("doc_id", "fp")
    sizes = inv.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= WINNOW_MATCH_MIN)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.expr(
                "CAST(n_shared * 10000 DIV least(sa.n_fp, sb.n_fp)"
                " AS BIGINT)"
            ).alias("overlap_1e4"),
        )
    )


PCA_ROUNDS = 2  # unrolled power-iteration rounds


def _pca_oracle() -> str:
    """Unrolled power-iteration CTE chain (same style as llm_kmeans):
    pin → center → 2 × (project, reduce, renormalize), all in exact
    integer / HUGEINT arithmetic with double ops only on identical
    integers."""
    rounds = []
    prev_w = None
    for r in range(1, PCA_ROUNDS + 1):
        proj = (
            f"sum(cv * 1000000)" if prev_w is None
            else f"sum(c.cv * {prev_w}.w)"
        )
        join = "" if prev_w is None else f" JOIN {prev_w} ON c.i = {prev_w}.i"
        rounds.append(f"""s{r} AS (
  SELECT vec_id, {proj} AS s FROM c{join} GROUP BY vec_id
), r{r} AS (
  SELECT vec_id,
         CAST(floor(CAST(s AS DOUBLE) / 1000000 + 0.5) AS BIGINT) AS sr
  FROM s{r}
), raw{r} AS (
  SELECT c.i, sum(r{r}.sr * c.cv) AS raw
  FROM c JOIN r{r} USING (vec_id) GROUP BY c.i
), mx{r} AS (
  SELECT max(abs(raw)) AS mx FROM raw{r}
), w{r} AS (
  SELECT i, CAST(floor(CAST(raw AS DOUBLE) / CAST(mx AS DOUBLE)
                       * 1000000 + 0.5) AS BIGINT) AS w
  FROM raw{r} CROSS JOIN mx{r}
)""")
        prev_w = f"w{r}"
    chain = ",\n".join(rounds)
    return f"""
WITH v AS (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS v
  FROM (SELECT vec_id, embedding,
               unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
), m AS (
  SELECT i, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5)
                 AS BIGINT) AS m
  FROM v GROUP BY i
), c AS (
  SELECT vec_id, v.i, v.v - m.m AS cv FROM v JOIN m ON v.i = m.i
),
{chain}
SELECT CAST(i - 1 AS BIGINT) AS pos, w AS comp_1e6 FROM {prev_w}
"""


@register(
    "llm_embed_pca",
    tier="T3",
    doc=f"Top principal direction of the (centered) embedding cloud by "
    f"{PCA_ROUNDS} unrolled power-iteration rounds — the spectral "
    "health check (and whitening/compression seed) run before ANN "
    "indexing.  Every step is exact integer math: components pin to "
    "1e6, the mean centers in pinned space, per-vector projections sum "
    "as exact BIGINTs, the dimension reduction sums as DECIMAL/HUGEINT "
    "(order-independent), and each round renormalizes by the max "
    "component so magnitudes stay bounded at ANY corpus size; doubles "
    "touch only identical integers (floor(x+0.5) is engine-identical, "
    "including negatives).  Scale shape: one posexplode + persisted "
    "centered frame; each round is a vec_id aggregate + a dim aggregate "
    "(64 cells) + a 1-row max broadcast — the driver holds nothing.",
    oracle=_pca_oracle(),
)
def llm_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).select(
        "vec_id",
        (F.col("j") + 1).alias("pos"),
        F.expr(
            "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
        ).alias("v"),
    )
    m = v.groupBy("pos").agg(
        F.expr(
            "CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5)"
            " AS BIGINT)"
        ).alias("m")
    )
    # The centered component frame feeds every power-iteration round —
    # session-memoized + persisted once (plans/memo.py) instead of one
    # pinned copy per call.
    from scala_reactivex_spark.plans.memo import session_memo

    c = session_memo(
        spark,
        sf_dir,
        "pca_centered",
        lambda: v.join(F.broadcast(m), "pos")
        .select("vec_id", "pos", (F.col("v") - F.col("m")).alias("cv"))
        .persist(),
    )
    w = None  # round 1 uses the implicit all-1e6 seed
    for _ in range(PCA_ROUNDS):
        if w is None:
            s = c.groupBy("vec_id").agg(
                F.sum(F.col("cv") * 1_000_000).alias("s")
            )
        else:
            s = (
                c.join(F.broadcast(w), "pos")
                .groupBy("vec_id")
                .agg(F.sum(F.col("cv") * F.col("w")).alias("s"))
            )
        sr = s.select(
            "vec_id",
            F.expr(
                "CAST(floor(CAST(s AS DOUBLE) / 1000000 + 0.5) AS BIGINT)"
            ).alias("sr"),
        )
        raw = (
            c.join(sr, "vec_id")
            .groupBy("pos")
            .agg(
                F.sum(
                    (F.col("sr") * F.col("cv")).cast("decimal(38,0)")
                ).alias("raw")
            )
        )
        mx = raw.agg(F.max(F.abs(F.col("raw"))).alias("mx"))
        w = raw.crossJoin(F.broadcast(mx)).select(
            "pos",
            F.expr(
                "CAST(floor(CAST(raw AS DOUBLE) / CAST(mx AS DOUBLE)"
                " * 1000000 + 0.5) AS BIGINT)"
            ).alias("w"),
        )
    return w.select(
        (F.col("pos") - 1).cast("bigint").alias("pos"),
        F.col("w").alias("comp_1e6"),
    )


@register(
    "llm_backoff_lm",
    tier="T3",
    doc="Interpolated (Jelinek-Mercer, λ=1/2) bigram+unigram LM score — "
    "the smoothing step that turns llm_bigram_lm into a usable "
    "perplexity proxy on held-out text: each adjacent pair contributes "
    "log10((P_bi(w2|w1) + P_uni(w2)) / 2).  Per-pair values pin to "
    "integer 1e6 micro-log10 units on identical double arithmetic "
    "(operand order matches the oracle text exactly), so per-doc sums "
    "are exact integer accumulation — order-proof.  Scale shape: three "
    "map-side-combined frequency aggregates (bigram, prefix, unigram) "
    "joined back on their keys, the corpus-total scalar rides a 1-row "
    "broadcast, one final per-doc aggregate — no corpus windows, no "
    "driver state.",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i])) AS b1,
         unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i + 1])) AS b2
  FROM w
), bgfreq AS (
  SELECT b1, b2, count(*) AS c2 FROM bg GROUP BY b1, b2
), prefix AS (
  SELECT b1, count(*) AS c1 FROM bg GROUP BY b1
), tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
), uni AS (
  SELECT t, count(*) AS cu FROM tok GROUP BY t
), tot AS (
  SELECT count(*) AS tt FROM tok
)
SELECT bg.doc_id, count(*) AS n_bigram,
       CAST(sum(CAST(floor(log10(
           (CAST(f.c2 AS DOUBLE) / CAST(p.c1 AS DOUBLE)
            + CAST(u.cu AS DOUBLE) / CAST(tot.tt AS DOUBLE)) / 2.0)
           * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS logp_sum_1e6
FROM bg
JOIN bgfreq f USING (b1, b2)
JOIN prefix p USING (b1)
JOIN uni u ON bg.b2 = u.t
CROSS JOIN tot
GROUP BY bg.doc_id
""",
)
def llm_backoff_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 18 (guide §1.2-order-2 — the llm_bigram_lm rewrite, plus
    # the unigram side; see that function for the measured false
    # starts that ruled out both a corpus-scale pre-aggregate and
    # serializing the frequency branches): the interpolated lp is
    # computed once per DISTINCT pair in the bounded pairlp dimension
    # (it depends only on (b1, b2)) and the occurrence stream does ONE
    # broadcast join — a hash lookup per row — instead of three joins
    # plus log10/divisions per occurrence; the corpus total tt
    # re-derives from the unigram aggregate (Σ cu ≡ token count,
    # exact), cutting the token explode from two derivations to one
    # (uni is on pairlp's path anyway, so no stage is serialized that
    # wasn't).  Interleaved A/B: old 1.24 / serialized-branch variant
    # 1.15 / this shape 1.05 s warm.  Values exactly as before; oracle
    # unchanged.
    docs = table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("words")).where(
        F.size("words") >= 2
    )
    bg = w.select(
        "doc_id", F.explode(F.expr(BIGRAM_PAIR_EXPR)).alias("bb")
    ).select("doc_id", "bb.b1", "bb.b2")
    bgfreq = bg.groupBy("b1", "b2").agg(F.count("*").alias("c2"))
    prefix = bg.groupBy("b1").agg(F.count("*").alias("c1"))
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    uni = tok.groupBy("t").agg(F.count("*").alias("cu"))
    tot = uni.agg(F.sum("cu").alias("tt"))
    lp = F.floor(
        F.log10(
            (
                F.col("c2").cast("double") / F.col("c1").cast("double")
                + F.col("cu").cast("double") / F.col("tt").cast("double")
            )
            / F.lit(2.0)
        )
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    pairlp = (
        bgfreq.join(prefix, ["b1"])
        .join(uni, bgfreq.b2 == uni.t)
        .crossJoin(F.broadcast(tot))
        .select("b1", "b2", lp.alias("lp"))
    )
    return (
        bg.join(pairlp, ["b1", "b2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigram"),
            F.sum("lp").cast("bigint").alias("logp_sum_1e6"),
        )
    )


PMI_MIN_COUNT = 5  # collocation support floor
PMI_TOPK = 40


@register(
    "llm_pmi",
    tier="T3",
    doc="Collocation mining via pointwise mutual information: for every "
    f"adjacent token pair with support >= {PMI_MIN_COUNT}, "
    "pmi = log10(P(w1,w2) / (P(w1)·P(w2))) pinned to integer 1e6 units "
    "on operand-order-identical doubles; the top "
    f"{PMI_TOPK} pairs by (pmi DESC, pair) — the phrase-detection / "
    "tokenizer-merge-candidate signal (word2vec's phrase pass).  Scale "
    "shape: two frequency aggregates over one corpus pass; the scored "
    "pair table is vocabulary²-bounded; ORDER BY + LIMIT compiles to "
    "TakeOrderedAndProject (no global sort); corpus totals ride a "
    "1-row broadcast.",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), bg AS (
  SELECT unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i])) AS b1,
         unnest(list_transform(generate_series(1, len(words) - 1),
                               i -> words[i + 1])) AS b2
  FROM w
), bgfreq AS (
  SELECT b1, b2, count(*) AS c2 FROM bg GROUP BY b1, b2
), tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
), uni AS (
  SELECT t, count(*) AS cu FROM tok GROUP BY t
), tots AS (
  SELECT (SELECT count(*) FROM bg) AS nb,
         (SELECT count(*) FROM tok) AS nt
)
SELECT f.b1, f.b2, CAST(f.c2 AS BIGINT) AS c2,
       CAST(floor(log10((CAST(f.c2 AS DOUBLE) / nb)
                        / ((CAST(u1.cu AS DOUBLE) / nt)
                           * (CAST(u2.cu AS DOUBLE) / nt)))
                  * 1000000 + 0.5) AS BIGINT) AS pmi_1e6
FROM bgfreq f
JOIN uni u1 ON f.b1 = u1.t
JOIN uni u2 ON f.b2 = u2.t
CROSS JOIN tots
WHERE f.c2 >= {PMI_MIN_COUNT}
ORDER BY pmi_1e6 DESC, f.b1, f.b2
LIMIT {PMI_TOPK}
""",
)
def llm_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("words")).where(
        F.size("words") >= 2
    )
    bg = w.select(F.explode(F.expr(BIGRAM_PAIR_EXPR)).alias("bb")).select(
        "bb.b1", "bb.b2"
    )
    bgfreq = bg.groupBy("b1", "b2").agg(F.count("*").alias("c2"))
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    uni = tok.groupBy("t").agg(F.count("*").alias("cu"))
    tots = bg.agg(F.count("*").alias("nb")).crossJoin(
        tok.agg(F.count("*").alias("nt"))
    )
    u1 = uni.select(F.col("t").alias("b1"), F.col("cu").alias("cu1"))
    u2 = uni.select(F.col("t").alias("b2"), F.col("cu").alias("cu2"))
    pmi = F.floor(
        F.log10(
            (F.col("c2").cast("double") / F.col("nb"))
            / (
                (F.col("cu1").cast("double") / F.col("nt"))
                * (F.col("cu2").cast("double") / F.col("nt"))
            )
        )
        * 1000000
        + F.lit(0.5)
    ).cast("bigint")
    return (
        bgfreq.where(F.col("c2") >= PMI_MIN_COUNT)
        .join(u1, "b1")
        .join(u2, "b2")
        .crossJoin(F.broadcast(tots))
        .select(
            "b1",
            "b2",
            F.col("c2").cast("bigint").alias("c2"),
            pmi.alias("pmi_1e6"),
        )
        .orderBy(F.col("pmi_1e6").desc(), "b1", "b2")
        .limit(PMI_TOPK)
    )


CM_WIDTH = 64  # count-min buckets per row
CM_DEPTH = 4  # hash rows
CM_TOPK = 20  # audited head terms


def _cm_seeds():
    from scala_reactivex_spark.functions.portable_hash import affine_seeds

    return affine_seeds(CM_DEPTH, seed=20260814)


def cm_bucket_structs() -> str:
    """SQL array of (d, bucket) probes for a hashed token column ``h``
    — THE single definition of the CM bucket family, shared by the
    batch audit (build + probe sides) and the streaming sketch twin so
    the served sketch cannot fork from the graded one."""
    from scala_reactivex_spark.functions.portable_hash import P31

    return ", ".join(
        f"struct({d} AS d, (({a}L * h + {b}L) % {P31}) % {CM_WIDTH}"
        " AS bucket)"
        for d, (a, b) in enumerate(_cm_seeds())
    )


def cm_cells(tok: DataFrame) -> DataFrame:
    """(d, bucket, c) Count-Min cells of a token frame — one hash
    aggregate to CM_DEPTH × CM_WIDTH cells.  CM is additive/mergeable,
    so the SAME expression is a batch build over a static corpus and a
    running streaming aggregate over an arriving one (twins.
    twin_count_min drains to identical cells — law-tested)."""
    from scala_reactivex_spark.functions.portable_hash import (
        kr31_spark_expr,
    )

    th = tok.select(F.expr(kr31_spark_expr("token")).alias("h"))
    return (
        th.select(
            F.explode(F.expr(f"array({cm_bucket_structs()})")).alias("s")
        )
        .groupBy("s.d", "s.bucket")
        .agg(F.count("*").alias("c"))
    )


@register(
    "llm_count_min",
    tier="T3",
    doc="Count-Min sketch audit (Cormode & Muthukrishnan 2005): term "
    f"frequencies compress into a {CM_DEPTH}×{CM_WIDTH} integer sketch "
    "via the portable affine hash family, estimates read back as the "
    "min over rows, and the head terms (top "
    f"{CM_TOPK} by exact count) emit exact vs estimate, the "
    "always-non-negative overcount, and a 2N/W error-bound flag — the "
    "sketch-accuracy contract pattern of rel_agg_approx, but with a "
    "sketch BOTH engines replay bit-for-bit (no rows-only waiver "
    "needed).  Scale shape: the sketch build is one hash aggregate to "
    f"{CM_DEPTH * CM_WIDTH} cells (mergeable across partitions — the "
    "whole point of CM at 100 TB); the audit joins the bounded "
    "vocabulary against the bounded sketch.",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), th AS (
  SELECT token, {kr31_duck_expr('token')} AS h FROM tok
), seeds(d, a, b) AS (
  VALUES {{seed_rows}}
), cells AS (
  SELECT s.d, ((s.a * th.h + s.b) % {{p31}}) % {CM_WIDTH} AS bucket,
         count(*) AS c
  FROM th CROSS JOIN seeds s GROUP BY 1, 2
), exact AS (
  SELECT token, max(h) AS h, count(*) AS n FROM th GROUP BY token
), est AS (
  SELECT e.token, e.n,
         min(c.c) AS est
  FROM exact e
  JOIN seeds s ON true
  JOIN cells c ON c.d = s.d
    AND c.bucket = ((s.a * e.h + s.b) % {{p31}}) % {CM_WIDTH}
  GROUP BY e.token, e.n
), tot AS (
  SELECT count(*) AS n FROM tok
)
SELECT est.token,
       CAST(est.n AS BIGINT) AS exact_n,
       CAST(est.est AS BIGINT) AS est_n,
       CAST(est.est - est.n AS BIGINT) AS overcount,
       CAST(est.est - est.n <= 2 * tot.n // {CM_WIDTH} AS INT) AS bound_ok
FROM est CROSS JOIN tot
ORDER BY est.n DESC, est.token
LIMIT {CM_TOPK}
""",
)
def llm_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scala_reactivex_spark.functions.portable_hash import (
        kr31_spark_expr,
    )

    tok = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    th = tok.select("token", F.expr(kr31_spark_expr("token")).alias("h"))
    cells = cm_cells(tok)
    exact = th.groupBy("token").agg(
        F.max("h").alias("h"), F.count("*").alias("n")
    )
    probes = exact.select(
        "token",
        "n",
        F.explode(F.expr(f"array({cm_bucket_structs()})")).alias("s"),
    ).select("token", "n", "s.d", "s.bucket")
    est = (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("token", "n")
        .agg(F.min("c").alias("est"))
    )
    tot = tok.agg(F.count("*").alias("nt"))
    return (
        est.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.col("n").cast("bigint").alias("exact_n"),
            F.col("est").cast("bigint").alias("est_n"),
            (F.col("est") - F.col("n")).cast("bigint").alias("overcount"),
            F.expr(
                f"CAST(est - n <= 2 * nt DIV {CM_WIDTH} AS INT)"
            ).alias("bound_ok"),
        )
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(CM_TOPK)
    )


# Interpolate the CM seed literals into the oracle (registered above with
# placeholders — the registry stores the final string).
from scala_reactivex_spark.functions.portable_hash import P31 as _P31  # noqa: E402
from scala_reactivex_spark.plans.registry import peek as _peek_cm  # noqa: E402

_peek_cm("llm_count_min").oracle = _peek_cm("llm_count_min").oracle.format(
    seed_rows=", ".join(
        f"({d}, {a}, {b})" for d, (a, b) in enumerate(_cm_seeds())
    ),
    p31=_P31,
)


WM_Z_FLAG_1E4 = 40_000  # flag docs with z > 4


@register(
    "llm_watermark_detect",
    tier="T3",
    doc="Greenlist watermark detection (Kirchenbauer et al. 2023, "
    "arXiv:2301.10226 — public paper): a seeded hash partitions the "
    "vocabulary into green/red halves (portable Karp-Rabin parity), "
    "and each doc reports its green-token count and the one-proportion "
    "z-statistic (2g - n)/sqrt(n) in 1e4 integer units — the screen "
    "that catches watermarked model-generated text leaking into a "
    "training crawl.  z pins on identical doubles of identical "
    "integers; the flag threshold (z > 4) is an integer compare.  "
    "Scale shape: one explode + per-doc hash aggregate, zero joins, "
    "zero state — embarrassingly parallel.",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), g AS (
  SELECT doc_id, count(*) AS n,
         count(*) FILTER (WHERE ({kr31_duck_expr('token')}) % 2 = 0)
           AS n_green
  FROM tok GROUP BY doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
       CAST(n_green AS BIGINT) AS n_green,
       CAST(floor(CAST(2 * n_green - n AS DOUBLE)
                  / sqrt(CAST(n AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
         AS z_1e4,
       CAST(floor(CAST(2 * n_green - n AS DOUBLE)
                  / sqrt(CAST(n AS DOUBLE)) * 10000 + 0.5)
            > {WM_Z_FLAG_1E4} AS INT) AS flagged
FROM g
""",
)
def llm_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scala_reactivex_spark.functions.portable_hash import (
        kr31_spark_expr,
    )

    tok = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    g = tok.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.count(
            F.when(F.expr(f"({kr31_spark_expr('token')}) % 2 = 0"), 1)
        ).alias("n_green"),
    )
    z = F.floor(
        (2 * F.col("n_green") - F.col("n")).cast("double")
        / F.sqrt(F.col("n").cast("double"))
        * 10000
        + F.lit(0.5)
    ).cast("bigint")
    return g.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tok"),
        F.col("n_green").cast("bigint").alias("n_green"),
        z.alias("z_1e4"),
        (z > WM_Z_FLAG_1E4).cast("int").alias("flagged"),
    )


@register(
    "llm_bpb",
    tier="T3",
    doc="Bits-per-byte LM evaluation — the compression-is-prediction "
    "number model papers report: per language, the corpus unigram-LM "
    "cross entropy converted to bits (micro-log10 sums × log2(10)) "
    "over the byte volume, in 1e4 integer units.  The oracle embeds "
    "llm_unigram_lm's green oracle, so the metric grades as a "
    "composition of graded parts; the only floating step is ONE "
    "division of two exact integers per language times one literal "
    "constant — identical IEEE in both engines.  Scale shape: per-doc "
    "scores reduce to a bounded per-lang rollup.",
    oracle=None,  # assigned below (embeds llm_unigram_lm's oracle)
)
def llm_bpb(spark: SparkSession, sf_dir: str) -> DataFrame:
    scores = llm_unigram_lm(spark, sf_dir).select(
        "doc_id", "logp_sum_1e6"
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    j = docs.join(scores, "doc_id")
    return j.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_bytes"),
        F.expr(
            "CAST(floor(CAST(-sum(logp_sum_1e6) AS DOUBLE)"
            " * 3.321928094887362 / 1000000.0"
            " / CAST(sum(n_chars) AS DOUBLE) * 10000 + 0.5) AS BIGINT)"
        ).alias("bpb_1e4"),
    )


from scala_reactivex_spark.plans.registry import peek as _peek_bpb  # noqa: E402

_peek_bpb("llm_bpb").oracle = f"""
WITH scores AS (
{_peek_bpb("llm_unigram_lm").oracle}
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS n_bytes,
       CAST(floor(CAST(-sum(s.logp_sum_1e6) AS DOUBLE)
            * 3.321928094887362 / 1000000.0
            / CAST(sum(d.n_chars) AS DOUBLE) * 10000 + 0.5) AS BIGINT)
         AS bpb_1e4
FROM documents d JOIN scores s ON d.doc_id = s.doc_id
GROUP BY d.lang
"""


HLL_M = 64  # registers
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007 constant)


@register(
    "llm_hll_portable",
    tier="T3",
    doc="Portable HyperLogLog (Flajolet et al. 2007): distinct-document "
    f"cardinality estimated from {HLL_M} registers of the Karp-Rabin "
    "content hash — register = h mod m, rank = 26 - bitlength(h div m) "
    "(leading-zero form; bin() has no leading zeros in either engine), "
    "register maxima folded IN REGISTER ORDER so the harmonic-mean "
    "double sum is bit-identical cross-engine.  Unlike rel_agg_approx "
    "(engine HLL behind an error-band contract), every register and "
    "the estimate itself are hash-graded.  Emits m, exact count, the "
    "estimate, zero-register count and a ±25%% check.  Scale shape: "
    "one hash aggregate to m registers (mergeable by max — the "
    "distributed-sketch property) carrying per-register counts whose "
    "sum is the exact cardinality, then one bounded m-row rollup "
    "(the register sum is order-exact — dyadic rationals).",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT {kr31_duck_expr('text')} AS hv FROM documents
), r AS (
  SELECT hv % {HLL_M} AS reg,
         CASE WHEN hv // {HLL_M} = 0 THEN 26
              ELSE 26 - length(bin(hv // {HLL_M})) END AS rho
  FROM h
), regs AS (
  SELECT s.reg, coalesce(max(r.rho), 0) AS mr
  FROM (SELECT unnest(range(0, {HLL_M})) AS reg) s
  LEFT JOIN r ON s.reg = r.reg GROUP BY s.reg
), folded AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(list(mr ORDER BY reg),
                            v -> pow(2.0, -v))),
           (acc, x) -> acc + x) AS z,
         CAST(count(*) FILTER (WHERE mr = 0) AS BIGINT) AS zeros
  FROM regs
), est AS (
  SELECT CAST(floor({HLL_ALPHA} * {HLL_M} * {HLL_M} / z) AS BIGINT)
           AS raw_est,
         zeros
  FROM folded
), ex AS (
  SELECT CAST(count(*) AS BIGINT) AS n_exact FROM h
)
SELECT CAST({HLL_M} AS BIGINT) AS m, ex.n_exact,
       CASE WHEN est.raw_est <= {int(2.5 * HLL_M)} AND est.zeros > 0
            THEN CAST(floor({HLL_M} * ln(CAST({HLL_M} AS DOUBLE)
                                         / est.zeros)) AS BIGINT)
            ELSE est.raw_est END AS est,
       est.zeros,
       CAST(abs(CASE WHEN est.raw_est <= {int(2.5 * HLL_M)}
                          AND est.zeros > 0
                     THEN CAST(floor({HLL_M} * ln(CAST({HLL_M} AS DOUBLE)
                                    / est.zeros)) AS BIGINT)
                     ELSE est.raw_est END - ex.n_exact) * 4
            <= ex.n_exact AS INT) AS band_ok
FROM est CROSS JOIN ex
""",
)
def llm_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Whole-document fold → the vectorized Arrow twin of the pinned
    # Karp-Rabin hash (~5× over the interpreted aggregate() here; the
    # token/gram sharers stay on the JVM fold — see kr31_pandas_udf).
    from scala_reactivex_spark.functions.portable_hash import (
        kr31_pandas_udf,
    )

    h = (
        table(spark, sf_dir, "documents")
        .select(kr31_pandas_udf()("text").alias("hv"))
        .distinct()
    )
    # Round-17 (guide §4.1 / §2.4): `h` (scan → Arrow UDF → distinct)
    # was consumed TWICE — once for the register pipeline and once for
    # the exact count — so the whole hash pass ran two times (the plan
    # showed the ArrowEvalPython subtree duplicated).  The register
    # rollup now carries a per-register distinct-hash count whose sum
    # IS n_exact, collapsing the query to ONE pass.  Also from the
    # src_table_stats_approx round-17 lesson: rho via an integer-
    # compare ladder (no per-row bin() string), and the ordered
    # register fold replaced by a plain aggregate — every term
    # pow(2,-mr) with mr ∈ [0,26] is a dyadic rational and the sum
    # stays < 2^7, so each partial needs ≤ 33 mantissa bits and the
    # double additions are exact in ANY order; the (m − observed)
    # unseen registers contribute 1.0 each as a single term, which
    # also removes the m-row spine join outright.  Values are
    # bit-identical; oracle unchanged.
    _ladder = " ".join(
        f"WHEN w >= {1 << (bl - 1)} THEN {26 - bl}"
        for bl in range(25, 0, -1)
    )
    r = h.select(
        (F.col("hv") % HLL_M).alias("reg"),
        F.expr(f"hv DIV {HLL_M}").alias("w"),
    ).select(
        "reg",
        F.expr(f"CASE {_ladder} ELSE 26 END").alias("rho"),
    )
    # Aggregate FIRST (unchanged): the observed register maxima (and
    # now counts) collapse map-side to ≤ m rows per partition before
    # any exchange — the shape that survived the 600M-row probe.
    regs_obs = r.groupBy("reg").agg(
        F.max("rho").alias("mr_obs"),
        F.count("*").cast("bigint").alias("cnt"),
    )
    nonnull = F.col("reg").isNotNull()
    observed = F.count(F.when(nonnull, 1))
    folded = regs_obs.agg(
        (
            (F.lit(HLL_M) - observed).cast("double")
            + F.coalesce(
                F.sum(F.when(nonnull, F.expr("pow(2.0D, -mr_obs)"))),
                F.lit(0.0),
            )
        ).alias("z"),
        (F.lit(HLL_M) - observed).cast("bigint").alias("zeros"),
        F.sum("cnt").cast("bigint").alias("n_exact"),
    )
    est_raw = F.expr(
        f"CAST(floor({HLL_ALPHA} * {HLL_M} * {HLL_M} / z) AS BIGINT)"
    )
    lin = F.expr(
        f"CAST(floor({HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / zeros))"
        " AS BIGINT)"
    )
    corrected = F.when(
        (est_raw <= int(2.5 * HLL_M)) & (F.col("zeros") > 0), lin
    ).otherwise(est_raw)
    return folded.select(
        F.lit(HLL_M).cast("bigint").alias("m"),
        "n_exact",
        corrected.alias("est"),
        "zeros",
        (
            F.abs(corrected - F.col("n_exact")) * 4
            <= F.col("n_exact")
        )
        .cast("int")
        .alias("band_ok"),
    )


AFFINITY_ANCHOR = 0  # eval-anchor label (the held-out target class)
AFFINITY_K = 50  # selected training vectors


@register(
    "llm_eval_affinity",
    tier="T3",
    doc="Target-anchored data selection: the corpus-wide top-"
    f"{AFFINITY_K} embeddings by dot-product affinity to the label-"
    f"{AFFINITY_ANCHOR} anchor centroid — 'pick the training data most "
    "like the eval distribution', the embedding-space complement of "
    "llm_dsir's n-gram importance weights.  Exact integer math end to "
    "end: components pin to 1e6 (llm_embed_centroid's scheme), the "
    "centroid is floor(sum/n) per position, and the dot product is a "
    "sum of 64 bigint products (≤1e14 — exact in both engines).  Scale "
    "shape: the centroid is one bounded aggregate collapsed to a 1-row "
    "broadcast array; affinity is a pure zip_with/aggregate projection "
    "inside codegen (no explode, no Python); selection is a global "
    "TakeOrderedAndProject — no full sort, no shuffle of the corpus.",
    oracle=f"""
WITH pin AS (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                       AS BIGINT)) AS e
  FROM embeddings
), anchor AS (
  SELECT i, CAST(floor(CAST(sum(e[i]) AS DOUBLE) / count(*)) AS BIGINT)
           AS c
  FROM pin, generate_series(1, 64) AS t(i)
  WHERE label = {AFFINITY_ANCHOR}
  GROUP BY i
), cvec AS (
  SELECT list(c ORDER BY i) AS cv FROM anchor
), dots AS (
  SELECT vec_id, label,
         CAST(list_sum(list_transform(generate_series(1, 64),
                                      i -> e[i] * cv[i])) AS BIGINT)
           AS dot_1e12
  FROM pin CROSS JOIN cvec
)
SELECT vec_id, CAST(label AS BIGINT) AS label, dot_1e12
FROM dots
ORDER BY dot_1e12 DESC, vec_id
LIMIT {AFFINITY_K}
""",
)
def llm_eval_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    pin = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000000 + 0.5).cast(
                "bigint"
            ),
        ).alias("e"),
    )
    anchor = (
        pin.where(F.col("label") == AFFINITY_ANCHOR)
        .select(F.posexplode("e").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.floor(F.sum("v").cast("double") / F.count("*"))
            .cast("bigint")
            .alias("c")
        )
    )
    cvec = anchor.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s.getField("c"),
        ).alias("cv")
    )
    dot = F.aggregate(
        F.zip_with("e", "cv", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        pin.crossJoin(F.broadcast(cvec))
        .select(
            "vec_id",
            F.col("label").cast("bigint").alias("label"),
            dot.alias("dot_1e12"),
        )
        .orderBy(F.col("dot_1e12").desc(), "vec_id")
        .limit(AFFINITY_K)
    )


NOV_N = 3  # n-gram width for the novelty signal


@register(
    "llm_ngram_novelty",
    tier="T3",
    doc=f"Per-document {NOV_N}-gram novelty — the composition-level "
    "complement of the dedup ladder: the share of a document's "
    f"DISTINCT word {NOV_N}-grams that appear in NO other document "
    "(corpus document frequency 1).  Low novelty flags boilerplate- "
    "and template-heavy docs that exact/near dedup keeps (they are "
    "not duplicates, their PHRASES are), the signal CC-corpus "
    "pipelines threshold before training.  Docs under "
    f"{NOV_N} tokens have no {NOV_N}-gram and are excluded rather "
    "than divided by zero.  Scale shape: explode distinct per-doc "
    "grams (linear), one map-side-combined gram→df aggregate, one "
    "hash join back on the gram key, one per-doc aggregate — the "
    "llm_tfidf plan with df=1 as the scored predicate; nothing "
    "quadratic, hot grams are read-side skew a salted agg absorbs.",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
), g AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i, i + {NOV_N - 1}), ' ')
           AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, n - {NOV_N - 2})) AS i
        FROM d WHERE n >= {NOV_N})
), cnt AS (
  SELECT gram, count(*) AS df FROM g GROUP BY gram
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE df = 1) AS BIGINT) AS n_novel,
       CAST(count(*) FILTER (WHERE df = 1) * 10000 // count(*)
            AS BIGINT) AS novelty_1e4
FROM g JOIN cnt USING (gram)
GROUP BY doc_id
""",
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Round 18 (r17 verdict #6): the batch key used novelty_over(g, cnt)
    # — a corpus-scale (doc, gram) ⋈ (gram, df) join just to mark which
    # of a doc's grams have df=1.  But a df=1 gram has exactly ONE
    # (doc, gram) row, so min(doc_id) inside the SAME gram aggregate
    # that computes df IS the doc the novel gram belongs to: n_novel
    # attributes straight from the bounded (gram, df, min_doc) rollup
    # (only df=1 rows survive the filter) and the corpus-scale join
    # disappears.  n_grams is a plain per-doc count of the same shared
    # doc_grams frame, and the final attach is a doc-cardinality LEFT
    # join (docs with no novel gram keep n_novel=0, as the old
    # df<=1-filter count produced).  The gram DERIVATION stays the one
    # shared doc_grams builder — the streaming ingest gate
    # (twins.twin_novelty_gate) keeps novelty_over against the standing
    # corpus table, where arriving docs are absent from cnt and the
    # probe join is the only possible shape; the batch/gate law test
    # pins the two plans to identical values.
    g = doc_grams(table(spark, sf_dir, "documents"))
    per_gram = g.groupBy("gram").agg(
        F.count("*").alias("df"), F.min("doc_id").alias("d0")
    )
    novel = (
        per_gram.where(F.col("df") == 1)
        .groupBy(F.col("d0").alias("doc_id"))
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    n_grams = g.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    return (
        n_grams.join(novel, "doc_id", "left")
        .withColumn(
            "n_novel",
            F.coalesce(F.col("n_novel"), F.lit(0).cast("bigint")),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("CAST(n_novel * 10000 DIV n_grams AS BIGINT)").alias(
                "novelty_1e4"
            ),
        )
    )


def doc_grams(df: DataFrame) -> DataFrame:
    """(doc_id, gram): each doc's DISTINCT word NOV_N-grams from a
    (doc_id, text) frame — THE single gram derivation: the batch
    novelty key, the static corpus gram-frequency table, and the
    streaming ingest gate (streaming.twins.twin_novelty_gate) all
    compose it, so the gram definition cannot fork between the signal
    and its serving path.  Docs under NOV_N tokens have no gram and
    drop here (the caller's divide-by-zero guard)."""
    d = (
        df.select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .where(F.col("n") >= NOV_N)
    )
    return d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, n - {NOV_N - 1}),"
                    f" i -> concat_ws(' ', slice(toks, i, {NOV_N})))"
                )
            )
        ).alias("gram"),
    )


def novelty_over(g: DataFrame, cnt: DataFrame) -> DataFrame:
    """Per-doc novelty report from a (doc_id, gram) frame joined to a
    (gram, df) document-frequency table — shared by the batch key
    (cnt derived from the same corpus) and the streaming gate (cnt is
    the standing corpus table the stream probes).

    LEFT join + df←0 default (round-14 review finding): a gram the
    standing table has NEVER seen is the most novel case of all — an
    inner join silently dropped exactly those grams, so a fully-new
    streamed document produced no output instead of novelty 10000.
    For the batch key the change is a no-op (cnt derives from the same
    gram frame, so df ≥ 1 for every joined row and the oracle text is
    unchanged); df ≤ 1 covers both 'unique in corpus' and 'absent from
    corpus'."""
    return (
        g.join(cnt, "gram", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.count(F.when(F.col("df") <= 1, 1))
            .cast("bigint")
            .alias("n_novel"),
            F.expr(
                "CAST(count(CASE WHEN df <= 1 THEN 1 END) * 10000"
                " DIV count(*) AS BIGINT)"
            ).alias("novelty_1e4"),
        )
    )
