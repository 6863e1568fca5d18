"""Multimodal plumbing tests: the stubbed codec path and the real
Arrow-batch feature extraction (SURVEY.md §2.10)."""

from __future__ import annotations

import pandas as pd
import pytest

from scala_reactivex_spark.operators import llm_multimodal as mm


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n")


def test_fake_features_deterministic():
    n, cp = mm.fake_features("hello world".encode())
    assert n == 11
    assert cp == ord("h")
    assert mm.fake_features("héllo".encode()) == (6, ord("h"))


def test_extract_features_batch_shape():
    batch = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [b"abc", "zebra".encode()]}
    )
    out = list(mm.extract_features(iter([batch])))
    assert len(out) == 1
    df = out[0]
    assert list(df.columns) == [
        "doc_id",
        "n_bytes",
        "first_cp",
        "decode_status",
    ]
    assert df.n_bytes.tolist() == [3, 5]
    assert df.first_cp.tolist() == [ord("a"), ord("z")]
    assert (df.decode_status == "stub").all()


def test_features_query_matches_metadata(spark, sf_dir):
    out = mm.llm_multimodal_features(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # ascii-only corpus → n_bytes == n_chars
    joined = out.join(docs, "doc_id").where("n_bytes <> n_chars")
    assert joined.count() == 0


def test_fingerprint_deterministic(spark, sf_dir):
    from scala_reactivex_spark.operators.llm_text import llm_doc_fingerprint

    a = {
        (r.doc_id, r.fingerprint)
        for r in llm_doc_fingerprint(spark, sf_dir).collect()
    }
    b = {
        (r.doc_id, r.fingerprint)
        for r in llm_doc_fingerprint(spark, sf_dir).collect()
    }
    assert a == b and len(a) > 0


def test_fake_features_empty_payload():
    """Empty payload → (0, -1), matching DuckDB's unicode('') = -1 instead
    of crashing the whole mapInPandas task."""
    assert mm.fake_features(b"") == (0, -1)


def test_fake_resize_and_frames_edges():
    """Deterministic codec stubs behave on empty / sub-frame payloads."""
    from scala_reactivex_spark.operators.llm_multimodal import (
        fake_frame_sample,
        fake_resize,
    )

    assert fake_resize(b"") == b""
    assert fake_resize(b"abcdef") == b"ace"
    assert fake_frame_sample(b"") == (0, 0, b"")
    n_frames, n_sampled, sampled = fake_frame_sample(b"x" * 33)
    assert (n_frames, n_sampled) == (2, 1)
    assert sampled == b"x" * 32  # frame 0 only; frame 1 skipped by stride


def test_multimodal_resize_binary_roundtrip(spark, sf_dir):
    """The resized payload survives the Arrow binary round-trip: JVM-side
    md5 over the UDF's bytes matches a driver-side recomputation."""
    import hashlib

    from scala_reactivex_spark.operators.llm_multimodal import (
        llm_multimodal_resize,
    )

    out = {r.doc_id: r.resized_md5 for r in llm_multimodal_resize(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert len(out) == len(docs) > 0
    for doc_id, text in list(docs.items())[:25]:
        exp = hashlib.md5(text.encode()[::2]).hexdigest()
        assert out[doc_id] == exp


def test_phash_full_recall_at_threshold(spark, sf_dir):
    """Pigeonhole law: with 8 bands and threshold 5 < 8, every pair
    within Hamming distance 5 shares at least one band — so the LSH
    output must EQUAL the brute-force pair set (the cap never triggers
    at this SF, asserted)."""
    import itertools

    from scala_reactivex_spark.operators.llm_multimodal import (
        PHASH_BUCKET_CAP,
        PHASH_HAM_T,
        _PHASH_SPARK,
        llm_multimodal_phash,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        "length(text) >= 2"
    )
    hs = {
        r["doc_id"]: r["ph"]
        for r in docs.selectExpr(
            "doc_id", f"{_PHASH_SPARK} AS ph"
        ).collect()
    }
    brute = {
        (a, b, bin(hs[a] ^ hs[b]).count("1"))
        for a, b in itertools.combinations(sorted(hs), 2)
        if bin(hs[a] ^ hs[b]).count("1") <= PHASH_HAM_T
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in llm_multimodal_phash(spark, sf_dir).collect()
    }
    assert got == brute and brute, "LSH must have full recall here"
    # Cap headroom: no (band, value) bucket is hot at this SF.
    from collections import Counter

    c = Counter()
    for ph in hs.values():
        for j in range(8):
            c[(j, (ph >> (4 * j)) & 15)] += 1
    assert max(c.values()) <= PHASH_BUCKET_CAP
