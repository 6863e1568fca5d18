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
       octet_length(encode(text)) AS n_bytes,
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
