"""Hypothesis property tests for the round-6 corpus operators.

Each property generates a random mini-corpus, writes it as a
documents.parquet fixture, runs the REAL registered operator against it,
and requires exact agreement with an independent pure-Python reference —
the same two-implementations law style as test_property.py.
"""

from __future__ import annotations

import hashlib
import shutil
import tempfile
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scala_reactivex_spark.operators.llm_pipeline import (
    N_SHARDS,
    llm_curriculum,
    llm_shard_assign,
)
from scala_reactivex_spark.operators.llm_subdoc import (
    SEG_W,
    llm_bpe_pairs,
    llm_line_dedup,
)

WORDS = ("alpha", "beta", "gamma", "delta", "eps")

texts_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(
        " ".join
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _fixture(spark, texts):
    """Write a throwaway documents.parquet shaped like the real fixture."""
    d = tempfile.mkdtemp(prefix="subdoc_prop_")
    rows = [
        (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


@given(texts=texts_strategy)
@settings(**SETTINGS)
def test_line_dedup_matches_pure_python(spark, texts):
    d = _fixture(spark, texts)
    try:
        got = {
            r["doc_id"]: (r["n_segs"], r["n_dup_segs"], r["dup_1e4"])
            for r in llm_line_dedup(spark, d).collect()
        }
        segs = {}
        for i, t in enumerate(texts):
            ws = t.split(" ")
            segs[i] = [
                " ".join(ws[k : k + SEG_W])
                for k in range(0, len(ws), SEG_W)
            ]
        seg_docs = Counter()
        for i, ss in segs.items():
            for s in set(ss):
                seg_docs[s] += 1
        want = {}
        for i, ss in segs.items():
            dup = sum(1 for s in ss if seg_docs[s] >= 2)
            want[i] = (len(ss), dup, dup * 10000 // len(ss))
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(texts=texts_strategy)
@settings(**SETTINGS)
def test_shard_assign_matches_pure_python(spark, texts):
    d = _fixture(spark, texts)
    try:
        got = {
            r["shard"]: (r["n_docs"], r["n_bytes"])
            for r in llm_shard_assign(spark, d).collect()
        }
        want_docs = Counter()
        want_bytes = Counter()
        for t in texts:
            h = hashlib.md5(t.encode()).hexdigest()
            shard = (int(h[0], 16) * 16 + int(h[1], 16)) % N_SHARDS
            want_docs[shard] += 1
            want_bytes[shard] += len(t)
        assert got == {
            s: (want_docs[s], want_bytes[s]) for s in want_docs
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(texts=texts_strategy)
@settings(**SETTINGS)
def test_curriculum_matches_discrete_quartiles(spark, texts):
    d = _fixture(spark, texts)
    try:
        rows = llm_curriculum(spark, d).collect()
        lens = sorted(len(t.split(" ")) for t in texts)
        n = len(lens)
        # discrete percentile: smallest value with cum count >= ceil(q*n)
        def q(p_num, p_den):
            need = -(-n * p_num // p_den)  # ceil
            return lens[need - 1]

        q1, q2, q3 = q(1, 4), q(2, 4), q(3, 4)
        want = Counter()
        for ln in lens:
            phase = 1 + (ln > q1) + (ln > q2) + (ln > q3)
            want[phase] += 1
        got = {r["phase"]: r["n_docs"] for r in rows}
        assert got == dict(want)
        assert sum(got.values()) == n
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(texts=texts_strategy)
@settings(**SETTINGS)
def test_bpe_pairs_match_pure_counter(spark, texts):
    d = _fixture(spark, texts)
    try:
        rows = sorted(
            llm_bpe_pairs(spark, d).collect(), key=lambda r: r["rank"]
        )
        c = Counter()
        for t in texts:
            for w in t.split(" "):
                for k in range(len(w) - 1):
                    c[w[k : k + 2]] += 1
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        got = [(r["pair"], r["cnt"]) for r in rows]
        assert got == want[: len(got)]
    finally:
        shutil.rmtree(d, ignore_errors=True)
