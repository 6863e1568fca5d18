"""Sub-document curation operators (round 6, §2.10 family).

Document-level dedup (``llm_dedup_*``) misses duplication BELOW the
document boundary — boilerplate paragraphs shared across pages, long
copied passages inside otherwise-distinct documents, and the
byte/character statistics a tokenizer is trained on.  Three operators:

- ``llm_line_dedup``: RefinedWeb/CCNet-style duplicated-paragraph
  profile.  The fixture corpus has no newlines, so the documented
  paragraph stand-in is consecutive non-overlapping ``SEG_W``-word
  segments (tail included); a segment is duplicated when its exact text
  occurs in ≥ 2 distinct documents.  Output: per-doc segment counts and
  duplicated-segment density.
- ``llm_dedup_substring``: exact repeated-passage detection in the shape
  of Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  Better") — every overlapping ``SUB_W``-word gram, a position is
  duplicated when its gram occurs in ≥ 2 distinct docs, and consecutive
  duplicated positions merge into runs (gaps-and-islands) so the longest
  copied passage per document is reported, not just a count.
- ``llm_bpe_pairs``: the first step of BPE tokenizer training — corpus
  frequencies of adjacent character pairs WITHIN words (word-boundary
  merges excluded, as in classic BPE), ranked; the top pair is the first
  merge rule a tokenizer trained on this corpus would learn.
- ``llm_bpe_merge``: the iterative continuation — three unrolled merge
  rounds where each round's top pair rewrites the corpus (merged pair →
  sentinel symbol) before the next round counts, so later merges can
  contain earlier ones: real BPE training dynamics with zero driver
  state (the argmax rides a 1-row broadcast).

Determinism (§2.11): everything here is integer (counts, positions,
``DIV``-scaled densities on non-negative operands); ranking ties pin on
the pair string — a total order.

Scale shape: all three are explode → hash-aggregate → equi-join-back
pipelines (the inverted-index shape of llm_boilerplate/llm_decontaminate
— heavy-hitter segment/gram keys are exactly what AQE skew-join splits).
The only windows partition by doc_id (run detection is doc-bounded) or
run over the pair alphabet (bounded, not corpus-scale).  No driver
collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

SEG_W = 8  # words per pseudo-paragraph segment (non-overlapping)
SUB_W = 8  # words per overlapping substring gram
BPE_TOPK = 40  # merge candidates reported


@register(
    "llm_line_dedup",
    tier="T3",
    doc=f"Duplicated-paragraph profile: non-overlapping {SEG_W}-word "
    "segments (tail kept), a segment is duplicated when its exact text "
    "appears in ≥ 2 distinct docs; per doc emits segment count, "
    "duplicated-segment count and density (1e4, integer DIV).  Scale "
    "shape: explode → distinct-doc count per segment key → join back on "
    "the segment key → per-doc aggregate; inverted-index shape, AQE "
    "splits heavy-hitter segments.",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), seg AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, (len(words) + {SEG_W - 1}) // {SEG_W} - 1),
           i -> array_to_string(words[i * {SEG_W} + 1 : i * {SEG_W} + {SEG_W}], ' ')
         )) AS s
  FROM w
), segdocs AS (
  SELECT s, count(DISTINCT doc_id) AS nd FROM seg GROUP BY s
)
SELECT seg.doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(count(*) FILTER (WHERE sd.nd >= 2) AS BIGINT) AS n_dup_segs,
       CAST(count(*) FILTER (WHERE sd.nd >= 2) * 10000 // count(*)
            AS BIGINT) AS dup_1e4
FROM seg JOIN segdocs sd USING (s)
GROUP BY seg.doc_id
""",
)
def llm_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    seg = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.expr(
                        f"(size(words) + {SEG_W - 1}) DIV {SEG_W} - 1"
                    ),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("words"), i * SEG_W + 1, SEG_W)
                ),
            )
        ).alias("s"),
    )
    # Round-17 (guide §2.3 — aggregate before you shuffle): the graded
    # surface only needs the FLAG "occurs in ≥ 2 distinct docs", and
    # count(DISTINCT doc_id) >= 2  ⟺  min(doc_id) != max(doc_id) — so
    # the per-segment aggregate keeps two longs instead of a distinct
    # set (the count's Expand/dedup state grows with docs-per-segment;
    # min/max partial-aggregate map-side and stay O(1) per key at any
    # corpus size).  Same rewrite applied to the substring/purge/
    # dup-ngram siblings below; oracles unchanged (the flag is
    # equivalent), all four re-verified hash-identical.  Round 18 (r17
    # ADVICE): wrapped in coalesce(.., false) so a hypothetical all-NULL
    # doc_id group yields false, not NULL — the old count(DISTINCT)>=2
    # was never null, and downstream consumers of a persisted dup
    # column must keep that non-null contract.  Zero cost; values
    # unchanged on this schema (doc_id is non-null).
    segdocs = seg.groupBy("s").agg(
        F.coalesce(
            F.min("doc_id") != F.max("doc_id"), F.lit(False)
        ).alias("dup")
    )
    return (
        seg.join(segdocs, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_segs"),
            F.count(F.when(F.col("dup"), 1))
            .cast("bigint")
            .alias("n_dup_segs"),
            F.expr(
                "CAST(count(CASE WHEN dup THEN 1 END) * 10000"
                " DIV count(*) AS BIGINT)"
            ).alias("dup_1e4"),
        )
    )


@register(
    "llm_dedup_substring",
    tier="T3",
    doc=f"Repeated-passage detection (Lee et al. shape): overlapping "
    f"{SUB_W}-word grams with positions; a position is duplicated when "
    "its gram occurs in ≥ 2 distinct docs; consecutive duplicated "
    "positions merge into runs (gaps-and-islands per doc).  Emits per-doc "
    "gram count, duplicated-position count, density (1e4) and the longest "
    "run — the copied-passage length that drives span-removal decisions.  "
    "Scale shape: inverted-index join on the gram key; the run window "
    "partitions BY DOC (never corpus-wide).",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), g AS (
  SELECT doc_id, i AS pos,
         array_to_string(words[i : i + {SUB_W - 1}], ' ') AS s
  FROM w, unnest(generate_series(1, len(words) - {SUB_W - 1})) AS t(i)
  WHERE len(words) >= {SUB_W}
), gd AS (
  SELECT s, count(DISTINCT doc_id) AS nd FROM g GROUP BY s
), marked AS (
  SELECT g.doc_id, g.pos, gd.nd >= 2 AS dup FROM g JOIN gd USING (s)
), runs AS (
  SELECT doc_id,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM marked WHERE dup
), run_len AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS max_run
  FROM (SELECT doc_id, island, count(*) AS c
        FROM runs GROUP BY doc_id, island)
  GROUP BY doc_id
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_dup
  FROM marked GROUP BY doc_id
)
SELECT p.doc_id, p.n_grams, p.n_dup,
       CAST(p.n_dup * 10000 // p.n_grams AS BIGINT) AS dup_1e4,
       CAST(coalesce(r.max_run, 0) AS BIGINT) AS max_run
FROM per_doc p LEFT JOIN run_len r USING (doc_id)
""",
)
def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    g = (
        w.where(F.size("words") >= SUB_W)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("words") - (SUB_W - 1)),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("words"), i, SUB_W)
                    ),
                )
            ).alias("pos0", "s"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "s")
    )
    # min != max ⟺ the distinct-doc count is ≥ 2 (see llm_line_dedup):
    # O(1) aggregate state per gram, full map-side combine.
    gd = g.groupBy("s").agg(
        F.coalesce(
            F.min("doc_id") != F.max("doc_id"), F.lit(False)
        ).alias("dup")
    )
    # The dup-marked gram table (doc_id, pos, dup — the gram STRINGS are
    # dropped) feeds both the per-doc rollup and the island runs below;
    # session-memoized + persisted so the corpus-sized explode + gram
    # self-join runs once per session (plans/memo.py).
    from scala_reactivex_spark.plans.memo import session_memo

    marked = session_memo(
        spark,
        sf_dir,
        "substring_marked",
        lambda: g.join(gd, "s")
        .select("doc_id", "pos", "dup")
        .persist(),
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.count(F.when(F.col("dup"), 1)).cast("bigint").alias("n_dup"),
    )
    dup_rows = marked.where("dup")
    island = (
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("pos")
        )
    ).alias("island")
    run_len = (
        dup_rows.select("doc_id", island)
        .groupBy("doc_id", "island")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("max_run"))
    )
    return (
        per_doc.join(run_len, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            "n_dup",
            F.expr("CAST(n_dup * 10000 DIV n_grams AS BIGINT)").alias(
                "dup_1e4"
            ),
            F.coalesce("max_run", F.lit(0)).cast("bigint").alias("max_run"),
        )
    )


@register(
    "llm_bpe_pairs",
    tier="T3",
    doc="BPE tokenizer-training step 1: corpus frequencies of adjacent "
    "character pairs within words (word boundaries never merge, as in "
    f"classic BPE); top {BPE_TOPK} merge candidates ranked by count with "
    "the pair string as the deterministic tie-break.  Scale shape: "
    "explode words → explode in-word positions → one hash aggregate over "
    "a key space bounded by the alphabet squared; the final rank window "
    "runs over that bounded pair table, never over the corpus.",
    oracle=f"""
WITH wrd AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), pairs AS (
  SELECT substr(w, i, 2) AS pair
  FROM wrd, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
), cnt AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT CAST(rnk AS BIGINT) AS rank, pair, cnt
FROM (
  SELECT pair, cnt,
         row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
  FROM cnt
)
WHERE rnk <= {BPE_TOPK}
""",
)
def llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    wrd = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    pairs = wrd.where(F.length("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    cnt = pairs.groupBy("pair").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    rnk = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), F.col("pair"))
    )
    return (
        cnt.withColumn("rank", rnk.cast("bigint"))
        .where(F.col("rank") <= BPE_TOPK)
        .select("rank", "pair", "cnt")
    )


BPE_ROUNDS = 3  # unrolled merge iterations
#: Sentinel symbols for merged pairs — outside the corpus alphabet.
BPE_SENTINELS = ("①", "②", "③")


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, c) adjacent-symbol counts of a (w: string) symbol stream."""
    return (
        words.where(F.length("w") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


@register(
    "llm_bpe_merge",
    tier="T3",
    doc=f"Iterative BPE training, {BPE_ROUNDS} unrolled merge rounds: "
    "each round counts adjacent symbol pairs, takes the top pair "
    "(count desc, pair asc — a total order), and rewrites every word "
    "with the merged pair as a single sentinel symbol (left-to-right "
    "non-overlapping `replace`, verified identical in both engines); "
    "the next round counts over the REWRITTEN corpus, so merge 2 can "
    "contain merge 1 — real tokenizer-training dynamics, not three "
    "independent top-pair picks.  Emits (round, merge rule with "
    "sentinels resolved to readable text, count).  Scale shape: each "
    "round is one explode→hash aggregate; the argmax is an ordered "
    "LIMIT 1 (TakeOrderedAndProject) riding back as a 1-row broadcast — "
    "the driver never holds the merge table, so the same plan runs on "
    "any cluster size.",
    oracle=f"""
WITH w0 AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), p1 AS (
  SELECT substr(w, i, 2) AS pair, CAST(count(*) AS BIGINT) AS c
  FROM w0, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2 GROUP BY 1
), t1 AS (SELECT pair, c FROM p1 ORDER BY c DESC, pair LIMIT 1),
w1 AS (
  SELECT replace(w, (SELECT pair FROM t1), chr(9312)) AS w FROM w0
), p2 AS (
  SELECT substr(w, i, 2) AS pair, CAST(count(*) AS BIGINT) AS c
  FROM w1, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2 GROUP BY 1
), t2 AS (SELECT pair, c FROM p2 ORDER BY c DESC, pair LIMIT 1),
w2 AS (
  SELECT replace(w, (SELECT pair FROM t2), chr(9313)) AS w FROM w1
), p3 AS (
  SELECT substr(w, i, 2) AS pair, CAST(count(*) AS BIGINT) AS c
  FROM w2, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2 GROUP BY 1
), t3 AS (SELECT pair, c FROM p3 ORDER BY c DESC, pair LIMIT 1)
SELECT CAST(1 AS BIGINT) AS round, pair AS merge, c AS cnt FROM t1
UNION ALL
SELECT CAST(2 AS BIGINT), replace(pair, chr(9312), (SELECT pair FROM t1)), c
FROM t2
UNION ALL
SELECT CAST(3 AS BIGINT),
       replace(replace(pair, chr(9313),
                       (SELECT replace(pair, chr(9312),
                                       (SELECT pair FROM t1)) FROM t2)),
               chr(9312), (SELECT pair FROM t1)),
       c
FROM t3
""",
)
def llm_bpe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1, s2, s3 = BPE_SENTINELS
    w0 = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("w")
    )
    # The 1-row top frames are referenced up to 4 times (rewrite + output
    # + sentinel resolution) — persist so each round's corpus-wide pair
    # aggregate executes exactly once, not once per reference.
    t1 = (
        _pair_counts(w0)
        .orderBy(F.col("c").desc(), "pair")
        .limit(1)
        .persist()
    )
    w1 = w0.crossJoin(F.broadcast(t1.select(F.col("pair").alias("p1")))).select(
        F.expr(f"replace(w, p1, '{s1}')").alias("w")
    )
    t2 = (
        _pair_counts(w1)
        .orderBy(F.col("c").desc(), "pair")
        .limit(1)
        .persist()
    )
    w2 = w1.crossJoin(F.broadcast(t2.select(F.col("pair").alias("p2")))).select(
        F.expr(f"replace(w, p2, '{s2}')").alias("w")
    )
    t3 = _pair_counts(w2).orderBy(F.col("c").desc(), "pair").limit(1)

    r1 = t1.select(
        F.lit(1).cast("bigint").alias("round"),
        F.col("pair").alias("merge"),
        F.col("c").alias("cnt"),
    )
    # Resolve sentinels back to readable merge rules: round 2's pair may
    # embed sentinel 1; round 3's may embed sentinels 1 and 2.
    p1row = F.broadcast(t1.select(F.col("pair").alias("p1")))
    r2 = (
        t2.crossJoin(p1row)
        .select(
            F.lit(2).cast("bigint").alias("round"),
            F.expr(f"replace(pair, '{s1}', p1)").alias("merge"),
            F.col("c").alias("cnt"),
        )
    )
    p2res = F.broadcast(
        t2.crossJoin(p1row).select(
            F.expr(f"replace(pair, '{s1}', p1)").alias("p2r")
        )
    )
    r3 = (
        t3.crossJoin(p2res)
        .crossJoin(p1row)
        .select(
            F.lit(3).cast("bigint").alias("round"),
            F.expr(
                f"replace(replace(pair, '{s2}', p2r), '{s1}', p1)"
            ).alias("merge"),
            F.col("c").alias("cnt"),
        )
    )
    return r1.unionByName(r2).unionByName(r3)


@register(
    "llm_bpe_apply",
    tier="T3",
    doc="Tokenizer-effect report: apply the three learned BPE merges "
    "(llm_bpe_merge's rules, re-derived in-plan via the same 1-row "
    "broadcasts) to every document and emit per-doc symbol counts before "
    "and after plus the compression ratio (1e4) — the 'how much does "
    "this tokenizer actually shrink my corpus' table a tokenizer "
    "training run ends with.  Scale shape: the merge rules re-derive "
    "exactly as in llm_bpe_merge (three linear aggregates + ordered "
    "LIMIT-1 broadcasts); application is a stateless per-doc projection.",
    oracle=f"""
WITH d0 AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), w0 AS (
  SELECT unnest(ws) AS w FROM d0
), p1 AS (
  SELECT substr(w, i, 2) AS pair, count(*) AS c
  FROM w0, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2 GROUP BY 1
), t1 AS (SELECT pair FROM p1 ORDER BY c DESC, pair LIMIT 1),
w1 AS (
  SELECT replace(w, (SELECT pair FROM t1), chr(9312)) AS w FROM w0
), p2 AS (
  SELECT substr(w, i, 2) AS pair, count(*) AS c
  FROM w1, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2 GROUP BY 1
), t2 AS (SELECT pair FROM p2 ORDER BY c DESC, pair LIMIT 1),
w2 AS (
  SELECT replace(w, (SELECT pair FROM t2), chr(9313)) AS w FROM w1
), p3 AS (
  SELECT substr(w, i, 2) AS pair, count(*) AS c
  FROM w2, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2 GROUP BY 1
), t3 AS (SELECT pair FROM p3 ORDER BY c DESC, pair LIMIT 1),
docsym AS (
  SELECT doc_id,
         CAST(sum(len(w)) AS BIGINT) AS syms_before,
         CAST(sum(len(
           replace(replace(replace(w,
             (SELECT pair FROM t1), chr(9312)),
             (SELECT pair FROM t2), chr(9313)),
             (SELECT pair FROM t3), chr(9314))
         )) AS BIGINT) AS syms_after
  FROM (SELECT doc_id, unnest(ws) AS w FROM d0) dw
  GROUP BY doc_id
)
SELECT doc_id, syms_before, syms_after,
       CAST(syms_after * 10000 // syms_before AS BIGINT) AS ratio_1e4
FROM docsym
""",
)
def llm_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session-memoized: the three greedy merge tables (t1/t2/t3, each a
    # full pair-count scan) persist once and are shared with
    # llm_bpe_fertility, which composes this chain — un-memoized it
    # re-ran the three scans and stacked three more persisted frames.
    from scala_reactivex_spark.plans.memo import disk_memo

    # Two-tier (round 11): the greedy merges are deterministic (exact
    # integer pair counts, lexicographic tie-breaks), so the tokenized
    # table persists as parquet across sessions.
    return disk_memo(
        spark, sf_dir, "bpe_apply", lambda: _bpe_apply_build(spark, sf_dir)
    )


def _bpe_apply_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1, s2, s3 = BPE_SENTINELS
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    w0 = docs.select("w")
    t1 = (
        _pair_counts(w0)
        .orderBy(F.col("c").desc(), "pair")
        .limit(1)
        .select(F.col("pair").alias("p1"))
        .persist()
    )
    w1 = w0.crossJoin(F.broadcast(t1)).select(
        F.expr(f"replace(w, p1, '{s1}')").alias("w")
    )
    t2 = (
        _pair_counts(w1)
        .orderBy(F.col("c").desc(), "pair")
        .limit(1)
        .select(F.col("pair").alias("p2"))
        .persist()
    )
    w2 = w1.crossJoin(F.broadcast(t2)).select(
        F.expr(f"replace(w, p2, '{s2}')").alias("w")
    )
    t3 = (
        _pair_counts(w2)
        .orderBy(F.col("c").desc(), "pair")
        .limit(1)
        .select(F.col("pair").alias("p3"))
        .persist()
    )
    merged = F.expr(
        f"replace(replace(replace(w, p1, '{s1}'), p2, '{s2}'), p3, '{s3}')"
    )
    return (
        docs.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .crossJoin(F.broadcast(t3))
        .groupBy("doc_id")
        .agg(
            F.sum(F.length("w")).cast("bigint").alias("syms_before"),
            F.sum(F.length(merged)).cast("bigint").alias("syms_after"),
        )
        .select(
            "doc_id",
            "syms_before",
            "syms_after",
            F.expr(
                "CAST(syms_after * 10000 DIV syms_before AS BIGINT)"
            ).alias("ratio_1e4"),
        )
    )


@register(
    "llm_line_dedup_purge",
    tier="T3",
    doc="Duplicated-paragraph REMOVAL effect (what RefinedWeb/CCNet "
    "actually do — cut the repeated lines, keep the document): per doc, "
    "token counts before and after dropping every segment whose exact "
    "text occurs in ≥ 2 distinct docs, with the removed share (1e4).  "
    "Pairs with llm_line_dedup the way llm_dedup_impact pairs with the "
    "cluster pipeline: the profile says WHERE duplication lives, the "
    "purge says what the corpus looks like after acting on it.  Scale "
    "shape: the same segment inverted-index join, then one per-doc "
    "aggregate over exact segment word-counts — no second corpus scan "
    "beyond the shared explode.",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), seg AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(0, (len(words) + {SEG_W - 1}) // {SEG_W} - 1),
           i -> array_to_string(words[i * {SEG_W} + 1 : i * {SEG_W} + {SEG_W}], ' ')
         )) AS s
  FROM w
), segdocs AS (
  SELECT s, count(DISTINCT doc_id) AS nd FROM seg GROUP BY s
), sized AS (
  SELECT seg.doc_id,
         len(string_split(seg.s, ' ')) AS n_w,
         sd.nd >= 2 AS dup
  FROM seg JOIN segdocs sd USING (s)
)
SELECT doc_id,
       CAST(sum(n_w) AS BIGINT) AS n_tok_before,
       CAST(sum(CASE WHEN dup THEN 0 ELSE n_w END) AS BIGINT)
         AS n_tok_after,
       CAST(sum(CASE WHEN dup THEN n_w ELSE 0 END) * 10000 // sum(n_w)
            AS BIGINT) AS removed_1e4
FROM sized GROUP BY doc_id
""",
)
def llm_line_dedup_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    seg = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.expr(
                        f"(size(words) + {SEG_W - 1}) DIV {SEG_W} - 1"
                    ),
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("words"), i * SEG_W + 1, SEG_W)
                ),
            )
        ).alias("s"),
    )
    # min != max ⟺ the distinct-doc count is ≥ 2 (see llm_line_dedup):
    # O(1) aggregate state per segment, full map-side combine.
    segdocs = seg.groupBy("s").agg(
        F.coalesce(
            F.min("doc_id") != F.max("doc_id"), F.lit(False)
        ).alias("dup")
    )
    sized = seg.join(segdocs, "s").select(
        "doc_id",
        F.size(F.split("s", " ")).alias("n_w"),
        "dup",
    )
    return sized.groupBy("doc_id").agg(
        F.sum("n_w").cast("bigint").alias("n_tok_before"),
        F.sum(F.when(F.col("dup"), 0).otherwise(F.col("n_w")))
        .cast("bigint")
        .alias("n_tok_after"),
        F.expr(
            "CAST(sum(CASE WHEN dup THEN n_w ELSE 0 END) * 10000"
            " DIV sum(n_w) AS BIGINT)"
        ).alias("removed_1e4"),
    )


TPL_W = 8  # leading tokens forming the template key
TPL_MIN = 3  # report templates with at least this many member docs


@register(
    "llm_template_detect",
    tier="T3",
    doc="Scraped-template detection: documents sharing their first "
    f"{TPL_W} tokens cluster under one template key; keys with >= "
    f"{TPL_MIN} members are reported with member count, distinct "
    "sources and corpus share (1e4) — the position-anchored complement "
    "of llm_line_dedup (which finds repeated segments ANYWHERE) that "
    "catches boilerplate page headers/navigation chrome.  Scale "
    "shape: the key is a per-row array slice (no explode), one hash "
    "aggregate on the key, a bounded output; the corpus total rides a "
    "1-row broadcast.",
    oracle=f"""
WITH k AS (
  SELECT doc_id, source,
         array_to_string(string_split(text, ' ')[1:{TPL_W}], ' ')
           AS tpl
  FROM documents
  WHERE len(string_split(text, ' ')) >= {TPL_W}
), tot AS (
  SELECT count(*) AS n FROM documents
), g AS (
  SELECT tpl, count(*) AS n_docs,
         count(DISTINCT source) AS n_sources
  FROM k GROUP BY tpl HAVING count(*) >= {TPL_MIN}
)
SELECT g.tpl, CAST(g.n_docs AS BIGINT) AS n_docs,
       CAST(g.n_sources AS BIGINT) AS n_sources,
       CAST(g.n_docs * 10000 // tot.n AS BIGINT) AS share_1e4
FROM g CROSS JOIN tot
""",
)
def llm_template_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    k = docs.where(F.size(F.split("text", " ")) >= TPL_W).select(
        "doc_id",
        "source",
        F.array_join(F.slice(F.split("text", " "), 1, TPL_W), " ").alias(
            "tpl"
        ),
    )
    tot = docs.agg(F.count("*").alias("n"))
    g = (
        k.groupBy("tpl")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .where(F.col("n_docs") >= TPL_MIN)
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "tpl",
        "n_docs",
        "n_sources",
        F.expr("CAST(n_docs * 10000 DIV n AS BIGINT)").alias("share_1e4"),
    )
