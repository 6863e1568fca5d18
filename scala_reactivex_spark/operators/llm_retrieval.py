"""Lexical retrieval over the document corpus (round 6, §2.10 family).

A pretraining-data pipeline needs lexical retrieval twice: as the
recall-oriented complement to embedding ANN (``llm_ann_ivf``) and as the
workhorse of overlap tooling (find the corpus documents most similar to an
eval item before a manual contamination review).  Two operators:

- ``llm_bm25``: Okapi BM25 top-k retrieval.  The held-out 'test' split
  (the same content-hash routing as ``llm_doc_split`` /
  ``llm_decontaminate``) supplies the probe queries — each test doc's
  leading ``QUERY_W`` distinct words form one query — and every 'train'
  doc is scored with the standard k1/b-damped term-frequency × idf sum.
- ``llm_index_stats``: the inverted-index health sweep that precedes any
  retrieval deployment — per-term document frequency, collection
  frequency, and max within-doc tf (the posting-list length / skew
  profile that decides compression and stop-listing).

Determinism (§2.11): BM25 is floating-point by construction, so each
per-term contribution is pinned to integer micro units with the repo's
``floor(x * 1e6 + 0.5)`` rule before the per-(query, doc) sum — both
engines evaluate the IDENTICAL arithmetic expression text (same literal
constants, same operation order) on identical integer inputs, so the
doubles agree bitwise, exactly as llm_unigram_lm / llm_lang_id established
across rounds.  Ranking ties break on doc_id — a total order.

Scale shape: document frequencies and lengths are map-side-combined
aggregates; the query set is an eval corpus (bounded — broadcasts; AQE
falls back to a hash join on the term key if it ever doesn't); scoring is
one equi-join on the term key followed by a per-(query, doc) hash
aggregate; the only window partitions by q_id (per-query top-k, never
corpus-wide).  No driver collection anywhere.

Fixture-pathology note (same class as llm_dedup_minhash, BASELINE.md):
the 31-token fixture vocabulary makes every query term match nearly
every document, so the term join produces |queries|×|corpus| candidate
rows (~5.5 s warm at sf0.1, WARM_r06.json).  On a realistic vocabulary
document frequency is Zipf-distributed and the candidate set per term is
a small corpus fraction; production deployments additionally stop-list
near-universal terms (their BM25+ idf ≈ 0), which this fixture cannot
demonstrate without zeroing every score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

QUERY_W = 4  # leading words per probe query
BM25_TOPK = 5  # results returned per query

#: The BM25 damping expression, written ONCE and reused verbatim by both
#: engines (identical literal constants and operation order ⇒ identical
#: IEEE doubles).  {n}/{df}/{tf}/{dl}/{tot} are integer columns.
_BM25_CONTRIB = (
    "CAST(floor("
    "log10(1 + (CAST({n} - {df} AS DOUBLE) + 0.5) / (CAST({df} AS DOUBLE) + 0.5))"
    " * ((CAST({tf} AS DOUBLE) * 2.2) / (CAST({tf} AS DOUBLE)"
    "     + 1.2 * (0.25 + 0.75 * (CAST({dl} AS DOUBLE)"
    "                             / (CAST({tot} AS DOUBLE) / CAST({n} AS DOUBLE))))))"
    " * 1000000 + 0.5) AS BIGINT)"
)


def _split_expr(engine: str) -> str:
    """The doc_split content-hash routing nibble (train/val/test)."""
    if engine == "spark":
        return "substring(md5(cast(text as binary)), 1, 1)"
    return "substr(md5(text), 1, 1)"


def _split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, words) with the content-hash split routing."""
    nib = F.expr(_split_expr("spark"))
    split = (
        F.when(nib.between("0", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id", split.alias("split"), F.split("text", " ").alias("words")
    )


def bm25_contrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static BM25 index: per (tok, doc_id) the pinned micro-unit
    score contribution a query term adds when it matches.  The query
    never enters the damping math (query term frequency = 1), so the
    whole index precomputes once — this is the frame the streaming
    serving twin joins arriving queries against.  Session-memoized
    (plans/memo.py): every consumer — batch scoring, the serving twin,
    the latency bench — shares ONE build, and the internal tf persist
    is created once per session instead of leaking one copy per call."""
    from scala_reactivex_spark.plans.memo import disk_memo

    # Two-tier (round 11): the contribution index is exact integer
    # micro-units, so it persists as parquet — a standing retrieval
    # index that batch scoring, the serving twin and the latency bench
    # read back across sessions.
    #
    # Round 18: the index is HASH-PARTITIONED BY doc_id, build path and
    # read-back alike (disk_memo load_layout).  Every (q_id, doc_id)
    # scoring group is then partition-local — the broadcast term join
    # preserves the streamed index partitioning, so the (q_id, doc_id)
    # sum aggregates WITHOUT an exchange and the full candidate grid
    # (|Q|x|D| on this wash-vocabulary fixture; query-matched postings
    # at scale) never crosses the network.  It also restores scan
    # parallelism on read-back, where the small finished index packs
    # into 1-2 input splits and previously serialized the whole
    # scoring join (the widen_scan pathology, r17).
    return disk_memo(
        spark,
        sf_dir,
        "bm25_contrib",
        lambda: _bm25_contrib(spark, sf_dir),
        load_layout=lambda _i, df: df.repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        ),
    )


def _bm25_contrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _split_docs(spark, sf_dir)
    train_tok = w.where(F.col("split") == "train").select(
        "doc_id", F.explode("words").alias("tok")
    )
    tf = (
        train_tok.groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
        # Three consumers (df, dl, the contrib join) — persist so the
        # split + explode + (doc, tok) aggregate runs one corpus pass.
        .persist()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    df = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    corpus = dl.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("tot"),
    )
    contrib = _BM25_CONTRIB.format(
        n="n", df="df", tf="tf", dl="dl", tot="tot"
    )
    out = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("tok", "doc_id", F.expr(contrib).alias("contrib"))
        # Lay the index out hash-partitioned by doc_id (matching the
        # read-back load_layout in bm25_contrib): scoring groups by
        # (q_id, doc_id), and doc_id-clustered input lets that
        # aggregate run exchange-free.  Explicit partition count so
        # AQE cannot coalesce the small fixture index to one split
        # and serialize every consumer.
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        # PRE-PACKED index: materialize the finished contribution
        # relation once per session so every serving micro-batch (and
        # every batch consumer) joins against in-memory blocks instead
        # of re-running the df/dl/corpus joins per trigger — the
        # re-pack was the bulk of twin_bm25's 1.3 s p50 (round-9
        # verdict #3).  Production stores this table; the persisted
        # frame IS that table within a session.
        .persist()
    )
    out.count()
    # The intermediate tf pass is only needed to BUILD the packed index.
    tf.unpersist()
    return out


def bm25_queries(w: DataFrame) -> DataFrame:
    """(q_id, tok) probe terms: each test doc's leading QUERY_W distinct
    words.  ``array_distinct`` dedups WITHIN the row, so this is a pure
    projection — usable unchanged on a stream (no stateful distinct)."""
    return w.where(F.col("split") == "test").select(
        F.col("doc_id").alias("q_id"),
        F.explode(
            F.array_distinct(F.slice("words", 1, QUERY_W))
        ).alias("tok"),
    )


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (q_id, doc_id, score_micro) scoring table (pre-top-k)."""
    queries = bm25_queries(_split_docs(spark, sf_dir))
    return (
        F.broadcast(queries)
        .join(bm25_contrib(spark, sf_dir), "tok")
        .groupBy("q_id", "doc_id")
        .agg(F.sum("contrib").cast("bigint").alias("score_micro"))
    )


@register(
    "llm_bm25",
    tier="T3",
    doc="Okapi BM25 top-5 retrieval: each 'test'-split doc's leading "
    f"{QUERY_W} distinct words form a query; every 'train'-split doc is "
    "scored sum_t idf(t)*tfnorm(t) (k1=1.2, b=0.75, BM25+ style "
    "log10(1+...) idf so scores stay positive), pinned per-term to integer "
    "micro units.  Scale shape: df/dl are map-side aggregates; queries "
    "are a bounded eval set (broadcast); one equi-join on the term key, "
    "one (q_id, doc_id) hash aggregate, and a per-query top-k window — "
    "nothing corpus-global.",
    oracle=f"""
WITH split AS (
  SELECT doc_id,
         CASE WHEN {_split_expr('duck')} BETWEEN '0' AND 'b' THEN 'train'
              WHEN {_split_expr('duck')} IN ('c', 'd') THEN 'val'
              ELSE 'test' END AS split,
         string_split(text, ' ') AS words
  FROM documents
), train_tok AS (
  SELECT doc_id, unnest(words) AS tok FROM split WHERE split = 'train'
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM train_tok GROUP BY doc_id, tok
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
), df AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
), corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tot
  FROM dl
), queries AS (
  SELECT DISTINCT doc_id AS q_id, unnest(words[1:{QUERY_W}]) AS tok
  FROM split WHERE split = 'test'
), scored AS (
  SELECT q.q_id, tf.doc_id,
         CAST(sum({_BM25_CONTRIB.format(n='c.n', df='df.df', tf='tf.tf',
                                        dl='dl.dl', tot='c.tot')})
              AS BIGINT) AS score_micro
  FROM queries q
  JOIN tf ON tf.tok = q.tok
  JOIN df ON df.tok = q.tok
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corpus c
  GROUP BY q.q_id, tf.doc_id
)
SELECT q_id, CAST(rnk AS BIGINT) AS rank, doc_id, score_micro
FROM (
  SELECT q_id, doc_id, score_micro,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY score_micro DESC, doc_id) AS rnk
  FROM scored
)
WHERE rnk <= {BM25_TOPK}
""",
)
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    rnk = F.row_number().over(
        Window.partitionBy("q_id").orderBy(
            F.col("score_micro").desc(), F.col("doc_id")
        )
    )
    return (
        bm25_scored(spark, sf_dir)
        .withColumn("rank", rnk.cast("bigint"))
        .where(F.col("rank") <= BM25_TOPK)
        .select("q_id", "rank", "doc_id", "score_micro")
    )


@register(
    "llm_index_stats",
    tier="T3",
    doc="Inverted-index posting-list profile over the full corpus: per "
    "term, the document frequency, collection frequency, and max "
    "within-doc tf — the length/skew sweep that sizes posting compression "
    "and stop-lists before retrieval goes live.  Scale shape: one "
    "explode → (doc, tok) hash aggregate → per-tok hash aggregate, all "
    "map-side-combined; output is |V| rows (Heaps-sublinear), never "
    "corpus-scale.",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       CAST(max(tf) AS BIGINT) AS max_tf
FROM tf GROUP BY tok
""",
)
def llm_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    return tf.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.max("tf").cast("bigint").alias("max_tf"),
    )


@register(
    "llm_index_gaps",
    tier="T3",
    doc="Posting-list delta-gap profile — the number that sizes an "
    "inverted index on disk: per term, the document-id gaps of its "
    "sorted posting list (first delta from -1, then successive "
    "differences), the max gap, mean gap (1e4) and the total bits a "
    "plain binary delta encoding needs (bit length via "
    "length(bin(gap)) — integer-side, never float log2, the "
    "llm_seq_len_hist idiom).  Scale shape: one (doc, term) aggregate, "
    "then a lag window PARTITIONED BY TERM — each partition is one "
    "posting list, the exact parallelism unit of index construction; "
    "output is |V| rows.",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
), g AS (
  SELECT tok,
         doc_id - coalesce(lag(doc_id) OVER (PARTITION BY tok
                                             ORDER BY doc_id), -1)
           AS gap
  FROM tok
)
SELECT tok,
       CAST(count(*) AS BIGINT) AS df,
       CAST(max(gap) AS BIGINT) AS max_gap,
       CAST(sum(gap) * 10000 // count(*) AS BIGINT) AS avg_gap_1e4,
       CAST(sum(length(bin(gap))) AS BIGINT) AS delta_bits
FROM g GROUP BY tok
""",
)
def llm_index_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    gap = F.col("doc_id") - F.coalesce(
        F.lag("doc_id").over(
            Window.partitionBy("tok").orderBy("doc_id")
        ),
        F.lit(-1),
    )
    g = tok.select("tok", gap.alias("gap"))
    return g.groupBy("tok").agg(
        F.count("*").cast("bigint").alias("df"),
        F.max("gap").cast("bigint").alias("max_gap"),
        F.expr("CAST(sum(gap) * 10000 DIV count(*) AS BIGINT)").alias(
            "avg_gap_1e4"
        ),
        F.sum(F.length(F.bin("gap"))).cast("bigint").alias("delta_bits"),
    )


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_PROBES = 5  # probe docs (doc_id ≡ vec_id, the multimodal 1:1 key)
RRF_TOPK = 10


@register(
    "llm_hybrid_rrf",
    tier="T3",
    doc="Hybrid retrieval via reciprocal rank fusion (Cormack et al. "
    "2009 — the standard way production search merges lexical and "
    "semantic rankings): for each probe document, every other doc gets "
    "a LEXICAL rank (token-set Jaccard vs the probe, ties to smaller "
    "id) and a SEMANTIC rank (embedding cosine via the doc_id ≡ vec_id "
    f"key), fused as Σ floor(1e6/({RRF_K}+rank)) — pure integer, no "
    "score calibration across modalities needed (RRF's whole point); "
    "top-10 fused per probe.  Scale shape: both rankings are "
    f"{RRF_PROBES} broadcast probe rows × one streamed corpus pass "
    "(per-row array_intersect / dot product, no token explode); the "
    "rank windows partition per probe.",
    oracle=f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
), pr AS (
  SELECT d.doc_id AS probe_id, d.toks AS ptoks, e.embedding AS pe
  FROM d JOIN embeddings e ON d.doc_id = e.vec_id
  WHERE d.doc_id < {RRF_PROBES}
), cand AS (
  SELECT p.probe_id, d.doc_id, p.ptoks, d.toks, p.pe, e.embedding AS ce
  FROM pr p
  JOIN d ON d.doc_id <> p.probe_id
  JOIN embeddings e ON d.doc_id = e.vec_id
), lex AS (
  SELECT probe_id, doc_id,
         ROUND(CAST(len(list_intersect(ptoks, toks)) AS DOUBLE)
               / (len(ptoks) + len(toks)
                  - len(list_intersect(ptoks, toks))), 4) AS jac
  FROM cand
), sem AS (
  SELECT probe_id, doc_id,
         ROUND(SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
               / (sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                  * sqrt(SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))), 4)
           AS cos_sim
  FROM (SELECT probe_id, doc_id, unnest(pe) AS x, unnest(ce) AS y
        FROM cand)
  GROUP BY probe_id, doc_id
), ranks AS (
  SELECT l.probe_id, l.doc_id,
         row_number() OVER (PARTITION BY l.probe_id
                            ORDER BY l.jac DESC, l.doc_id) AS r_lex,
         row_number() OVER (PARTITION BY l.probe_id
                            ORDER BY s.cos_sim DESC, l.doc_id) AS r_sem
  FROM lex l JOIN sem s
    ON l.probe_id = s.probe_id AND l.doc_id = s.doc_id
), fused AS (
  SELECT probe_id, doc_id,
         CAST(r_lex AS BIGINT) AS r_lex, CAST(r_sem AS BIGINT) AS r_sem,
         CAST(1000000 // ({RRF_K} + r_lex)
              + 1000000 // ({RRF_K} + r_sem) AS BIGINT) AS rrf_1e6
  FROM ranks
), final AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY rrf_1e6 DESC, doc_id) AS rnk
  FROM fused
)
SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, doc_id, r_lex, r_sem,
       rrf_1e6
FROM final WHERE rnk <= {RRF_TOPK}
""",
)
def llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hybrid_corpus(spark, sf_dir)
    probes = docs.where(F.col("doc_id") < RRF_PROBES).select(
        F.col("doc_id").alias("probe_id"),
        F.col("toks").alias("ptoks"),
        F.col("embedding").alias("pe"),
        F.col("nrm").alias("pn"),
    )
    return rrf_fuse(probes, docs)


def hybrid_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static hybrid-retrieval index: every doc's distinct token set
    (lexical side) + embedding with its precomputed norm (semantic
    side).  Shared by the batch operator and the streaming serving twin
    (streaming/twins.py twin_hybrid_rrf).

    PRE-PACKED like bm25_contrib: disk-tiered + persisted, because the
    serving twin consumes this frame TWICE PER MICRO-BATCH (the probe
    encoder lookup and the fusion's corpus pass) — left lazy, every
    trigger re-ran the tokenize + embedding join, which the round-12
    isolated warm probe measured as the bulk of twin_hybrid_rrf's p50
    sitting 1.36x over its pin (scripts/twin_warm_probe.py; the
    round-10 BM25 re-pack was the same defect).  Production stores this
    index as a table; the parquet tier IS that table across sessions."""
    from scala_reactivex_spark.plans.memo import disk_memo

    return disk_memo(
        spark, sf_dir, "hybrid_corpus", lambda: _hybrid_corpus(spark, sf_dir)
    )


def _hybrid_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scala_reactivex_spark.operators.llm_similarity import norm_col

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    e = table(spark, sf_dir, "embeddings")
    out = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "toks",
            "embedding",
            norm_col("embedding").alias("nrm"),
        )
        .persist()
    )
    out.count()
    return out


def rrf_fuse(probes: DataFrame, docs: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of the lexical (token Jaccard) and
    semantic (cosine) rankings for ``probes`` (probe_id, ptoks, pe, pn)
    against the ``docs`` corpus frame — the scoring core shared by
    ``llm_hybrid_rrf`` and its serving twin.  Probes broadcast; the
    corpus streams through once; rank windows partition per probe."""
    from scala_reactivex_spark.operators.llm_similarity import (
        cosine_with_norms,
    )

    isz = F.size(F.array_intersect("ptoks", "toks"))
    cand = (
        F.broadcast(probes)
        .join(docs, F.col("doc_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "doc_id",
            F.round(
                isz.cast("double")
                / (F.size("ptoks") + F.size("toks") - isz).cast("double"),
                4,
            ).alias("jac"),
            F.round(
                cosine_with_norms("pe", "embedding", "pn", "nrm"), 4
            ).alias("cos_sim"),
        )
    )
    wl = Window.partitionBy("probe_id").orderBy(
        F.col("jac").desc(), "doc_id"
    )
    ws = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), "doc_id"
    )
    ranks = cand.select(
        "probe_id",
        "doc_id",
        F.row_number().over(wl).cast("bigint").alias("r_lex"),
        F.row_number().over(ws).cast("bigint").alias("r_sem"),
    )
    fused = ranks.withColumn(
        "rrf_1e6",
        F.expr(
            f"CAST(1000000 DIV ({RRF_K} + r_lex)"
            f" + 1000000 DIV ({RRF_K} + r_sem) AS BIGINT)"
        ),
    )
    wf = Window.partitionBy("probe_id").orderBy(
        F.col("rrf_1e6").desc(), "doc_id"
    )
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("bigint"))
        .where(F.col("rnk") <= RRF_TOPK)
        .select("probe_id", "rnk", "doc_id", "r_lex", "r_sem", "rrf_1e6")
    )
