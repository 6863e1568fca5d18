"""Convergence guard for the bounded connected-components SQL form.

The raw-SQL corpus resolves duplicate clusters with CC_HOP_BOUND hops of
label propagation; ``llm_cluster_cc_guard`` is the detectable signal that
the bound was (or wasn't) enough for a given corpus (round-9 ADVICE).
These tests prove the guard fires on an over-bound graph and stays quiet
on in-bound ones — including the real fixture.
"""

from __future__ import annotations

from scala_reactivex_spark.operators.llm_dedup import (
    cc_bound_guard,
    connected_components,
    llm_cluster_cc_guard,
)
from scala_reactivex_spark.plans.sql_corpus import CC_HOP_BOUND


def _chain(spark, n):
    """Path graph 0-1-2-...-n (diameter n)."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


def test_guard_fires_on_component_wider_than_bound(spark):
    """A 20-edge path has diameter 20 > CC_HOP_BOUND=12: the bounded
    labels are NOT the fixpoint and the guard must say so."""
    row = cc_bound_guard(_chain(spark, 20), CC_HOP_BOUND).collect()[0]
    assert row.converged == 0
    assert row.n_nonconverged > 0
    assert row.n_nodes == 21
    assert row.hop_bound == CC_HOP_BOUND


def test_guard_quiet_within_bound(spark):
    """A path exactly at the bound resolves fully: converged=1, and the
    bounded labels equal the exact fixpoint (single cluster rooted at 0)."""
    pairs = _chain(spark, CC_HOP_BOUND)
    row = cc_bound_guard(pairs, CC_HOP_BOUND).collect()[0]
    assert row.converged == 1
    assert row.n_nonconverged == 0
    exact = connected_components(pairs)
    assert exact.where("cluster_id <> 0").count() == 0


def test_guard_certifies_fixture_corpus(spark, sf_dir):
    """The fixture's near-dup clusters are near-cliques — the registered
    guard certifies the corpus-level bound holds, which is exactly the
    precondition the four bounded corpus entries rely on."""
    row = llm_cluster_cc_guard(spark, sf_dir).collect()[0]
    assert row.converged == 1
    assert row.n_nonconverged == 0
    assert row.n_nodes > 0


def test_bounded_labels_match_exact_cc_when_converged(spark):
    """converged=1 is a CERTIFICATE: on a multi-component in-bound graph
    the bounded propagation's min labels equal connected_components'."""
    pairs = spark.createDataFrame(
        [(1, 5), (5, 3), (10, 11), (12, 11), (20, 21)],
        "doc_a long, doc_b long",
    )
    row = cc_bound_guard(pairs, CC_HOP_BOUND).collect()[0]
    assert row.converged == 1
    exact = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert exact == {
        (1, 1), (5, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }
