"""Multimodal column operators (SURVEY.md §2.10).

Design: image/audio/video are opaque ``binary`` columns with typed metadata
alongside.  The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partition parallelism — is real and tested; the actual codec call
is STUBBED (this container ships no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless a library is importable, and the
registered query uses the deterministic fake extractor so the pipeline is
verifiable end-to-end.

The fixture has no binary column, so ``llm_multimodal_features``
materializes one (UTF-8 bytes of ``text``) — at scale this is exactly the
shape of a parquet binary column of encoded images.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, first_cp int, decode_status string"
)


def decode_image(data: bytes) -> object:
    """Decode an encoded image to an array — REAL CODEC STUBBED.

    On a cluster with Pillow installed this returns the decoded array;
    here it raises so callers fall back to :func:`fake_features`.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use fake_features() for plumbing tests"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(data))  # pragma: no cover


def fake_features(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode + feature-extract: byte length and
    the first Unicode code point of the payload (-1 for an empty payload,
    matching DuckDB's unicode('') so the oracle agrees row-for-row)."""
    text = data.decode("utf-8")
    return len(data), (ord(text[0]) if text else -1)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, feature rows out.

    This is the exact shape a real image/audio featurizer plugs into —
    swap ``fake_features`` for the codec and the distributed plumbing
    (partitioning, batch sizing, schema) is unchanged.
    """
    for pdf in batches:
        feats = pdf["payload"].map(fake_features)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": feats.map(lambda t: t[0]).astype("int64"),
                "first_cp": feats.map(lambda t: t[1]).astype("int32"),
                "decode_status": "stub",
            }
        )


@register(
    "llm_multimodal_join",
    tier="T3",
    doc="Multimodal row assembly: text + vector + metadata in one row "
    "(documents ⋈ embeddings 1:1), aggregated per (lang, label).",
    oracle="""
SELECT d.lang, e.label, count(*) AS n,
       ROUND(CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY d.lang, e.label
""",
)
def llm_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 4
            ).alias("avg_chars"),
        )
    )


@register(
    "llm_multimodal_features",
    tier="T3",
    doc="Binary-column feature extraction via mapInPandas: opaque payload "
    "bytes → (n_bytes, first code point, status) with the codec stubbed "
    "deterministically. Oracle checks the Spark plumbing end-to-end "
    "(octet_length / unicode are the ground truth for the fake).",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       unicode(text) AS first_cp,
       'stub' AS decode_status
FROM documents
""",
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payload.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


def fake_resize(data: bytes) -> bytes:
    """Deterministic stand-in for an image resize: every 2nd byte (a 2×
    nearest-neighbor downsample of a 1-D signal). Swap for a real
    PIL/cv2 resample and the plumbing below is unchanged."""
    return data[::2]


def _resize_worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": pdf["payload"].map(len).astype("int64"),
                "resized": pdf["payload"].map(fake_resize),
            }
        )


@register(
    "llm_multimodal_resize",
    tier="T3",
    doc="Binary-column resize stage via mapInPandas: payload → downsampled "
    "payload (codec stubbed as an every-2nd-byte resample), with the "
    "resized bytes' md5 computed JVM-side. The oracle rebuilds the same "
    "resample character-wise (ASCII fixture: char ≡ byte), proving the "
    "Arrow round-trip of BINARY columns end-to-end.",
    oracle="""
WITH r AS (
  SELECT doc_id, text,
         array_to_string(list_transform(
             range(1, length(text) + 1, 2),
             i -> substring(text, i, 1)), '') AS resized
  FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS orig_bytes,
       CAST(length(resized) AS BIGINT) AS resized_bytes,
       md5(resized) AS resized_md5
FROM r
""",
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = payload.mapInPandas(
        _resize_worker, schema="doc_id long, orig_bytes long, resized binary"
    )
    return out.select(
        "doc_id",
        "orig_bytes",
        F.length("resized").cast("bigint").alias("resized_bytes"),
        F.md5("resized").alias("resized_md5"),
    )


FRAME_BYTES = 32  # video-ish framing of the opaque payload
FRAME_STRIDE = 4  # keep every 4th frame


def fake_frame_sample(data: bytes) -> tuple[int, int, bytes]:
    """Deterministic stand-in for video frame sampling: split the payload
    into 32-byte frames, keep every 4th. Returns (n_frames, n_sampled,
    sampled_bytes)."""
    n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
    kept = range(0, n_frames, FRAME_STRIDE)
    sampled = b"".join(
        data[k * FRAME_BYTES : (k + 1) * FRAME_BYTES] for k in kept
    )
    return n_frames, len(kept), sampled


def _frame_worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        trip = pdf["payload"].map(fake_frame_sample)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_frames": trip.map(lambda t: t[0]).astype("int64"),
                "n_sampled": trip.map(lambda t: t[1]).astype("int64"),
                "sampled": trip.map(lambda t: t[2]),
            }
        )


@register(
    "llm_multimodal_frames",
    tier="T3",
    doc="Frame-sampling stage via mapInPandas: payload framed into 32-byte "
    "chunks, every 4th kept (the video keyframe-sampling shape), sampled "
    "bytes checksummed JVM-side. Oracle rebuilds the framing with blob "
    "substring arithmetic (ASCII fixture: char ≡ byte).",
    oracle="""
WITH f AS (
  SELECT doc_id,
         CAST(ceil(length(text) / 32.0) AS BIGINT) AS n_frames,
         array_to_string(list_transform(
             range(0, CAST(ceil(length(text) / 32.0) AS BIGINT), 4),
             k -> substring(text, k * 32 + 1, 32)), '') AS sampled
  FROM documents
)
SELECT doc_id, n_frames,
       CAST(ceil(n_frames / 4.0) AS BIGINT) AS n_sampled,
       md5(sampled) AS sample_md5
FROM f
""",
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    out = payload.mapInPandas(
        _frame_worker,
        schema="doc_id long, n_frames long, n_sampled long, sampled binary",
    )
    return out.select(
        "doc_id",
        "n_frames",
        "n_sampled",
        F.md5("sampled").alias("sample_md5"),
    )


PHASH_BITS = 32
PHASH_BANDS = 8  # 8 × 4-bit bands
PHASH_HAM_T = 5  # report pairs with Hamming distance <= 5
PHASH_BUCKET_CAP = 256  # hot-bucket guard, as in the MinHash LSH path
_PHASH_BAND_DIVS = [16 ** j for j in range(8)]

#: dHash bit k compares the payload bytes at two sampled positions —
#: 1 + floor(k·(L-1)/32) and the next sample — exactly the
#: difference-hash an image pipeline computes on downsampled pixels,
#: here on the stub payload bytes (ASCII fixture: Spark ascii ≡ DuckDB
#: ord, asserted in tests/test_multimodal.py).
_PHASH_SPARK = (
    "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, k) -> acc * 2 + "
    "IF(ascii(substring(text, 1 + (k * (length(text) - 1)) DIV 32, 1)) > "
    "ascii(substring(text, 1 + ((k + 1) * (length(text) - 1)) DIV 32, 1)),"
    " CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"
)

_PHASH_DUCK = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "range(0, 32), k -> CASE WHEN "
    "ord(substring(text, 1 + (k * (length(text) - 1)) // 32, 1)) > "
    "ord(substring(text, 1 + ((k + 1) * (length(text) - 1)) // 32, 1)) "
    "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)), "
    "(acc, b) -> acc * 2 + b)"
)


#: The full phash pair query as a NAMED constant: llm_multimodal_phash's
#: oracle, the ``pairs`` CTE body of llm_multimodal_dedup's recursive
#: oracle, and plans/sql_corpus's Spark-runnable CC override all compose
#: the SAME text (the llm_dedup._NEAR_PAIRS_ORACLE convention — no
#: string-splitting of oracle text).
#: The hash→bands→bucket-size CTE prefix, shared verbatim by the pair
#: query below and llm_phash_stats' cap-billing oracle.
_PHASH_BANDS_CTE = f"""
WITH h AS (
  SELECT doc_id, {_PHASH_DUCK} AS ph
  FROM documents WHERE length(text) >= 2
), bands AS (
  SELECT doc_id, b.j AS band, (h.ph // b.d) % 16 AS bval
  FROM h CROSS JOIN (VALUES {', '.join(f'({j}, {d})'
      for j, d in enumerate(_PHASH_BAND_DIVS))}) b(j, d)
), bsz AS (
  SELECT band, bval, count(*) AS c FROM bands GROUP BY band, bval
)"""

_PHASH_PAIRS_ORACLE = _PHASH_BANDS_CTE + f""", kept AS (
  SELECT bands.doc_id, bands.band, bands.bval
  FROM bands JOIN bsz
    ON bands.band = bsz.band AND bands.bval = bsz.bval
  WHERE bsz.c <= {PHASH_BUCKET_CAP}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(ha.ph, hb.ph)) AS INT) AS hamming
FROM cand c
JOIN h ha ON c.doc_a = ha.doc_id
JOIN h hb ON c.doc_b = hb.doc_id
WHERE bit_count(xor(ha.ph, hb.ph)) <= {PHASH_HAM_T}
"""


def _phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perceptual-hash signature store (doc_id, ph): referenced by
    both sides of the pair query's band self-join AND by the cap-billing
    stats key, so without caching the per-payload hash fold executes
    repeatedly — session-memoized + persisted once (plans/memo.py), the
    same one-build-per-session shape as the SimHash and BM25 indexes."""
    from scala_reactivex_spark.plans.memo import session_memo

    return session_memo(
        spark,
        sf_dir,
        "phash_sig",
        lambda: (
            table(spark, sf_dir, "documents")
            .where(F.length("text") >= 2)
            .select("doc_id", F.expr(_PHASH_SPARK).alias("ph"))
            .persist()
        ),
    )


def _phash_bands(h: DataFrame) -> DataFrame:
    """(doc_id, ph, band, bval) band projection over a signature frame —
    THE single band definition: the pair query's LSH join and the
    cap-billing stats aggregate must describe the SAME buckets, so a
    future band-width change cannot desynchronize them (round-14
    review finding).  The 8-byte signature rides along (round-17) so
    the pair query's bucket self-join can emit both hashes inline;
    the stats aggregate simply ignores it."""
    return h.select(
        "doc_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        ((F.col("ph") / d).cast("bigint") % 16).alias(
                            "bval"
                        ),
                    )
                    for j, d in enumerate(_PHASH_BAND_DIVS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "ph", "bb.band", "bb.bval")


@register(
    "llm_multimodal_phash",
    tier="T3",
    doc=f"Perceptual-hash near-dup for the multimodal binary column: a "
    f"{PHASH_BITS}-bit dHash (difference hash — the standard image "
    "near-dup fingerprint) over evenly sampled payload bytes, then "
    f"banded Hamming LSH ({PHASH_BANDS} × 4-bit bands, equi-join on the "
    "band value) and exact Hamming verification at distance <= "
    f"{PHASH_HAM_T}.  By pigeonhole, <= {PHASH_HAM_T} differing bits "
    f"can touch at most {PHASH_HAM_T} of {PHASH_BANDS} bands, so one "
    "band always matches: the LSH candidate set has FULL recall at the "
    "threshold (pytest-asserted against brute force), unlike "
    "probabilistic MinHash banding.  Buckets over "
    f"{PHASH_BUCKET_CAP} entries are skipped in both engines (hot-"
    "bucket cap).  Scale shape: per-row hash (zero shuffle), band "
    "equi-join candidates, verify on candidates only; production "
    "widens to 64-bit hashes with 16-bit bands — same plan.",
    oracle=_PHASH_PAIRS_ORACLE,
)
def llm_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _phash_signatures(spark, sf_dir)
    # Round-17 (guide §2.4, the llm_dedup_simhash_nn rewrite): carry
    # the 8-byte perceptual hash THROUGH the band rows so the bucket
    # self-join emits both hashes inline — the two doc-keyed join-backs
    # disappear, and the pair dedup (a pair CAN co-occur in several
    # bands; the output is the pair set, so distinct stays) moves
    # AFTER the Hamming cut, deduping only surviving pairs instead of
    # the whole candidate set.  hamming is a function of the pair, so
    # distinct over (doc_a, doc_b, hamming) ≡ distinct over the pair;
    # values unchanged.
    bands = _phash_bands(h)
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bval")
    kept = (
        bands.withColumn("c", F.count("*").over(w))
        .where(F.col("c") <= PHASH_BUCKET_CAP)
        .drop("c")
    )
    a = kept.alias("a")
    b = kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.ph ^ b.ph) AS INT)").alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= PHASH_HAM_T)
        .distinct()
    )


from scala_reactivex_spark.operators.llm_dedup import (  # noqa: E402
    _CC_ORACLE_SUFFIX,
)


@register(
    "llm_multimodal_dedup",
    tier="T3",
    doc="Multimodal duplicate-cluster resolution — the keep-one-per-"
    "group step over the PERCEPTUAL near-dup graph, completing the "
    "image-dedup ladder the way llm_dedup_cluster completes the text "
    "ladder: connected components (min-label propagation to fixpoint, "
    "the shared operators/llm_dedup.connected_components driver-"
    "controlled loop — all data stays distributed) over "
    "llm_multimodal_phash's Hamming-verified pair set; each payload "
    "gets cluster_id = min doc_id reachable and is_canonical marks "
    "the survivor whose bytes a 100 TB media corpus keeps.  Scale "
    "shape: everything upstream is the banded-LSH pair query (linear "
    "+ capped buckets); the CC loop is O(log diameter) rounds like "
    "every other cluster key.  Oracle: DuckDB recursive-CTE "
    "reachability over the SAME pair query.",
    oracle=f"""
WITH RECURSIVE pairs AS (
{_PHASH_PAIRS_ORACLE}{_CC_ORACLE_SUFFIX}""",
)
def llm_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Disk-memoized like minhash_cluster: the perceptual cluster labels
    # are a stored artifact (a production media corpus keeps its dedup
    # assignment as a table, not a per-session recomputation); the
    # hook+jump fixpoint is deterministic (min-id labels), so read-back
    # is value-identical.
    from scala_reactivex_spark.operators.llm_dedup import (
        connected_components,
    )
    from scala_reactivex_spark.plans.memo import disk_memo

    return disk_memo(
        spark,
        sf_dir,
        "mm_phash_cluster",
        lambda: connected_components(
            llm_multimodal_phash(spark, sf_dir).select("doc_a", "doc_b")
        ),
    )


@register(
    "llm_phash_stats",
    tier="T3",
    doc="Perceptual-LSH cap billing — the hot-bucket accounting every "
    "capped path here ships (the llm_dedup_minhash_stats discipline, "
    "extended to the phash band index): per band, the bucket count, "
    "the largest bucket, how many buckets the "
    f"{PHASH_BUCKET_CAP}-entry cap drops, and how many doc entries "
    "those dropped buckets held — the quantity llm_multimodal_phash "
    "and llm_multimodal_dedup silently exclude, made visible so an "
    "operator can size the cap against measured bucket density "
    "instead of trusting it.  Scale shape: the shared band projection "
    "+ one bounded (band, bval) aggregate + one 8-row rollup.",
    oracle=_PHASH_BANDS_CTE + f"""
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(c) AS BIGINT) AS max_bucket,
       CAST(count(*) FILTER (WHERE c > {PHASH_BUCKET_CAP}) AS BIGINT)
         AS n_capped,
       CAST(coalesce(sum(c) FILTER (WHERE c > {PHASH_BUCKET_CAP}), 0)
            AS BIGINT) AS n_dropped_entries
FROM bsz GROUP BY band
""",
)
def llm_phash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    bands = _phash_bands(_phash_signatures(spark, sf_dir))
    bsz = bands.groupBy("band", "bval").agg(F.count("*").alias("c"))
    return bsz.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.max("c").cast("bigint").alias("max_bucket"),
        F.count(F.when(F.col("c") > PHASH_BUCKET_CAP, 1))
        .cast("bigint")
        .alias("n_capped"),
        F.coalesce(
            F.sum(F.when(F.col("c") > PHASH_BUCKET_CAP, F.col("c"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_dropped_entries"),
    )
