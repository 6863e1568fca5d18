"""The bench stdout contract line must stay inside the driver's 2000-char
tail window REGARDLESS of data widths (round-12 verdict #1: the old
72-query map made line length data-dependent and BENCH_r12.json recorded
rc=1/parsed:null when more floats tipped over 1.0 s).

These tests exercise bench.build_contract_line directly — no Spark — with
worst-case numeric widths and maximal-length query names, so a structural
addition that could re-overflow the window fails in pytest, not in the
driver's once-per-round bench run.
"""

from __future__ import annotations

import json

import bench


def _line(sf_val=0.1, *, name_len=64, seconds=8_640_000.999):
    # 72 headline names at an implausible 64 chars each, every timing at
    # a 100-days-in-seconds width — far beyond anything a real pass can
    # produce (the slowest real query is ~3 s at sf0.1).
    times = {f"q{i:03d}".ljust(name_len, "x"): seconds for i in range(72)}
    # All ELEVEN measured twins (not just the pinned five), at worst-case
    # width, so the new per-twin p50 map is bounded under the real twin
    # count.
    from scala_reactivex_spark.streaming.latency import DEFAULT_TWINS

    twin_latency = {
        k: {"p50_trigger_ms": 8_640_000_000.9} for k in DEFAULT_TWINS
    }
    return bench.build_contract_line(
        times=times,
        untiered=set(times),
        total=seconds * 72,
        extras=seconds * 130,
        archive_sec=seconds * 22,
        beyond_sec=seconds * 50,
        beyond_pin=bench.BEYOND_NEWEST_BASELINE_SEC["readback"],
        growth_sec=seconds * 50,
        growth_pin=bench.GROWTH_BASELINE_SEC["readback"],
        frontier_sec=seconds * 50,
        frontier_pin=bench.FRONTIER_BASELINE_SEC["readback"],
        horizon_sec=seconds * 50,
        horizon_pin=bench.HORIZON_BASELINE_SEC["readback"],
        summit_sec=seconds * 50,
        sf_val=sf_val,
        warm={f"w{i:03d}".ljust(name_len, "x"): seconds for i in range(20)},
        warm_headline=seconds * 72 if sf_val == 0.1 else None,
        warm_ratios={
            k: (8_640_000.999 if sf_val == 0.1 else None)
            for k in (
                "extras_warm",
                "archive_warm",
                "beyond_warm",
                "growth_warm",
                "frontier_warm",
                "horizon_warm",
            )
        },
        twin_latency=twin_latency,
        prepopulated=99_999,
        cold_cache={"hits": 99_999, "misses": 99_999},
    )


def test_contract_line_bounded_under_worst_case_widths():
    line = _line()
    assert len(line) < 1800, len(line)
    assert "\n" not in line


def test_contract_line_parses_and_carries_every_pin_ratio():
    parsed = json.loads(_line())
    for key in (
        "value",
        "extras_vs_baseline",
        "archive_seconds",
        "archive_vs_baseline",
        "beyond_seconds",
        "beyond_vs_baseline",
        "growth_seconds",
        "growth_vs_baseline",
        "frontier_seconds",
        "frontier_vs_baseline",
        "horizon_seconds",
        "horizon_vs_baseline",
        "summit_seconds",
        "warm_headline_sec",
        "twin_vs_baseline",
        "warm20_sec",
        "dcache",
        # r18 additions (r17 verdict #4/#8)
        "extras_warm",
        "archive_warm",
        "beyond_warm",
        "growth_warm",
        "frontier_warm",
        "horizon_warm",
        "twin_p50",
    ):
        assert key in parsed, key
        assert parsed[key] is not None, key
    # The per-twin p50 map carries every measured twin, prefix-stripped.
    from scala_reactivex_spark.streaming.latency import DEFAULT_TWINS

    assert set(parsed["twin_p50"]) == {
        t.removeprefix("twin_") for t in DEFAULT_TWINS
    }
    # The per-query map is capped at the slowest 5 — never the full set.
    assert len(parsed["queries"]) == 5


def test_contract_line_shorter_than_r16_shape():
    """r16 verdict #4 retired the new/newer/newest fields for good; the
    r17 verdict #4/#8 then ADDED seven observability fields (six
    per-bucket warm companions + the per-twin p50 map), so the cap is
    the r17 shape's 24 plus exactly those seven."""
    parsed = json.loads(_line())
    assert len(parsed) <= 31, sorted(parsed)
    for retired in ("new_vs_baseline", "newer_seconds", "newest_seconds"):
        assert retired not in parsed


def test_contract_line_non_sf01_omits_scale_specific_ratios():
    parsed = json.loads(_line(sf_val=0.01))
    assert parsed["extras_vs_baseline"] is None
    assert parsed["archive_vs_baseline"] is None
    assert parsed["beyond_vs_baseline"] is None
    assert parsed["growth_vs_baseline"] is None
    assert parsed["frontier_vs_baseline"] is None
    assert parsed["horizon_vs_baseline"] is None
    assert parsed["twin_vs_baseline"] is None
    for k in (
        "extras_warm",
        "archive_warm",
        "beyond_warm",
        "growth_warm",
        "frontier_warm",
        "horizon_warm",
    ):
        assert parsed[k] is None, k


def test_frozen_suites_are_closed_sets():
    assert len(bench.BEYOND_BASELINE) == 130
    assert len(bench.BEYOND_EXTRAS) == 12
    assert len(bench.BEYOND_NEW) == 5
    assert len(bench.BEYOND_NEWER) == 5
    assert (
        len(bench.BEYOND_EXTRAS | bench.BEYOND_NEW | bench.BEYOND_NEWER)
        == 22
    )
    assert len(bench.BEYOND_NEWEST) == 10
    assert len(bench.GROWTH) == 7
    assert len(bench.FRONTIER) == 8
    assert len(bench.HORIZON) == 7
    # Regime-specific pins — both regimes must be present.
    assert set(bench.BEYOND_NEWEST_BASELINE_SEC) == {"fresh", "readback"}
    assert set(bench.GROWTH_BASELINE_SEC) == {"fresh", "readback"}
    assert set(bench.FRONTIER_BASELINE_SEC) == {"fresh", "readback"}
    assert set(bench.HORIZON_BASELINE_SEC) == {"fresh", "readback"}
    # The archive pin is the exact sum of its three retired components.
    assert bench.ARCHIVE_BASELINE_SEC == (
        bench.NEW_BASELINE_SEC
        + bench.NEWER_BASELINE_SEC
        + bench.NEWEST_BASELINE_SEC
    )


def test_warm_headline_reference_covers_exactly_the_frozen_72():
    """The arbitration anchor must cover the headline suite exactly:
    a missing entry would silently skip arbitration for that query, an
    extra entry would arbitrate a tiered query into the wrong total."""
    assert len(bench.WARM_HEADLINE_REF) == 72
    tiered = (
        bench.BEYOND_BASELINE
        | bench.BEYOND_EXTRAS
        | bench.BEYOND_NEW
        | bench.BEYOND_NEWER
        | bench.BEYOND_NEWEST
        | bench.GROWTH
        | bench.FRONTIER
        | bench.HORIZON
        | bench.SUMMIT
        | bench.EXCLUDE
    )
    assert not set(bench.WARM_HEADLINE_REF) & tiered
    assert all(v > 0 for v in bench.WARM_HEADLINE_REF.values())


def test_tiered_warm_reference_covers_exactly_the_tiered_suites():
    """The bucket arbitration anchor must cover the timed tiered suites
    exactly (every bucket member, nothing from the headline 72 or the
    untimed EXCLUDE family); future SUMMIT keys fall back to their cold
    time until the reference is extended at pin time."""
    tiered = (
        bench.BEYOND_BASELINE
        | bench.BEYOND_EXTRAS
        | bench.BEYOND_NEW
        | bench.BEYOND_NEWER
        | bench.BEYOND_NEWEST
        | bench.GROWTH
        | bench.FRONTIER
        | bench.HORIZON
    )
    assert set(bench.TIERED_WARM_REF) == tiered
    assert not set(bench.TIERED_WARM_REF) & set(bench.WARM_HEADLINE_REF)
    assert not set(bench.TIERED_WARM_REF) & bench.EXCLUDE
    assert all(v > 0 for v in bench.TIERED_WARM_REF.values())
