"""Session-memo behavior: shared index builds are built once per
(session, fixture dir, name) and are keyed strictly enough that a
different fixture dir or name never serves a stale object."""

from __future__ import annotations


def test_memo_returns_same_object_per_key(spark, sf_dir):
    from scala_reactivex_spark.plans.memo import session_memo

    calls = []

    def build():
        calls.append(1)
        return object()

    a = session_memo(spark, sf_dir, "t_memo_probe", build)
    b = session_memo(spark, sf_dir, "t_memo_probe", build)
    assert a is b and len(calls) == 1


def test_memo_keys_on_dir_and_name(spark, sf_dir, tmp_path):
    from scala_reactivex_spark.plans.memo import session_memo

    a = session_memo(spark, sf_dir, "t_memo_k1", object)
    b = session_memo(spark, sf_dir, "t_memo_k2", object)
    c = session_memo(spark, str(tmp_path), "t_memo_k1", object)
    assert a is not b and a is not c


def test_shared_index_builders_are_memoized(spark, sf_dir):
    """The real builders return the identical frame objects on repeat
    calls — one persisted copy per session, not one per consumer."""
    from scala_reactivex_spark.operators.llm_cluster import _kmeans_loop
    from scala_reactivex_spark.operators.llm_similarity import (
        _ivf_index,
        _pq_index,
    )

    assert _ivf_index(spark, sf_dir)[2] is _ivf_index(spark, sf_dir)[2]
    assert _pq_index(spark, sf_dir)[0] is _pq_index(spark, sf_dir)[0]
    assert _kmeans_loop(spark, sf_dir)[0] is _kmeans_loop(spark, sf_dir)[0]
