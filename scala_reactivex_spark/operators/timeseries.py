"""Time-series / change-data-capture operators over the events stream.

The reference's event model (SURVEY.md §1.2, §2.9 custom-operator row) calls
for the temporal join/compaction family every event-sourced system needs and
plain SQL lacks first-class syntax for:

- ``rel_join_asof``: as-of join — each purchase picks the MOST RECENT click
  of the same user at-or-before its timestamp.  Spark has no ASOF JOIN; the
  scalable formulation is union-tag + one partitioned sort + ``last(...,
  ignorenulls)`` — a single shuffle on the key, NO range-expanded
  intermediate (the naive interval join materializes every (purchase ×
  preceding-click) pair before aggregating it away).
- ``rel_cdc_upsert``: latest-change-wins compaction of a change log — the
  MERGE/upsert snapshot shape, as one map-side-combinable ``max(struct)``.
- ``rel_scd2``: slowly-changing-dimension type-2 intervals — contiguous
  same-value runs become [valid_from, valid_to) effective ranges
  (gaps-and-islands with a running change counter).
- ``rel_funnel``: ordered conversion funnel (signup → click → purchase),
  each stage anchored at-or-after the previous stage's first completion.

Determinism (§2.11): event total order is (ts, event_id) everywhere; time is
emitted only as ``ms`` (≡ DuckDB ``epoch_ms``); ratios are integer ``DIV``
on non-negative operands; window frames are explicit ROWS frames.

Scale shape: every operator here is ONE hash shuffle on its natural key
(user_id or (user_id, event_type)) with any window sorts riding that same
partitioning — no broadcast of the fact side, no driver state, no
correlated per-row work.  At 100 TB the events table would be
bucketed/partitioned by user_id and these plans keep zero extra exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.plans.registry import register
from scala_reactivex_spark.sources.catalog import table


@register(
    "rel_join_asof",
    tier="T2",
    doc="As-of join: purchase ← most recent click of the same user with "
    "click.ts <= purchase.ts (ties on ts broken by max event_id).  "
    "Implemented as union-tag + last(ignorenulls) over one (user_id)-"
    "partitioned ROWS frame — one shuffle, no pair blow-up; the oracle is "
    "the independent max-ts/max-id two-join formulation.",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click'),
     best AS (
       SELECT p.event_id AS p_event_id, p.user_id, p.ts AS p_ts,
              max(c.ts) AS c_ts
       FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
       GROUP BY p.event_id, p.user_id, p.ts)
SELECT b.p_event_id, b.user_id, epoch_ms(b.p_ts) AS p_ms,
       max(c.event_id) AS c_event_id, epoch_ms(b.c_ts) AS c_ms
FROM best b LEFT JOIN c ON c.user_id = b.user_id AND c.ts = b.c_ts
GROUP BY b.p_event_id, b.user_id, b.p_ts, b.c_ts
""",
)
def rel_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # kind 0 sorts clicks before a same-ts purchase (<= semantics); within
    # a ts tie the click with max event_id is last, so it wins.
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "ms", F.lit(0).alias("kind")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "ms", F.lit(1).alias("kind")
    )
    u = clicks.unionByName(purchases).select(
        "*",
        F.when(F.col("kind") == 0, F.col("event_id")).alias("click_id"),
        F.when(F.col("kind") == 0, F.col("ms")).alias("click_ms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("c_event_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("c_ms", F.last("click_ms", ignorenulls=True).over(w))
        .where(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.col("ms").alias("p_ms"),
            "c_event_id",
            "c_ms",
        )
    )


@register(
    "rel_cdc_upsert",
    tier="T2",
    doc="Latest-change-wins upsert compaction: the events table as a change "
    "log keyed by (user_id, event_type); emit each key's current state — "
    "the MERGE INTO snapshot shape.  One max(struct) aggregate ordered by "
    "the (ts, event_id) total order: map-side combinable, ONE shuffle, "
    "strictly cheaper than the window row_number formulation the oracle "
    "uses (which must materialize and sort every version).",
    oracle="""
WITH r AS (
  SELECT user_id, event_type, event_id, epoch_ms(ts) AS ms, value,
         CAST(count(*) OVER (PARTITION BY user_id, event_type) AS BIGINT)
             AS n_changes,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, n_changes, event_id, ms, value
FROM r WHERE rn = 1
""",
)
def rel_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # Lexicographic struct max on the unique (ts, event_id) prefix — the
    # trailing payload fields never participate in the comparison.
    last = F.max(F.struct("ts", "event_id", "ms", "value")).alias("last")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").cast("bigint").alias("n_changes"), last)
        .select(
            "user_id",
            "event_type",
            "n_changes",
            F.col("last.event_id").alias("event_id"),
            F.col("last.ms").alias("ms"),
            F.col("last.value").alias("value"),
        )
    )


@register(
    "rel_scd2",
    tier="T2",
    doc="SCD type-2 interval build: per user, contiguous runs of the same "
    "event_type become [valid_from_ms, valid_to_ms) effective ranges "
    "(valid_to = next run's start, NULL while current).  Gaps-and-islands "
    "via a running change-flag sum; both window passes and the final lead "
    "ride the SAME user_id partitioning — one shuffle end to end.",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id, epoch_ms(ts) AS ms,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
f AS (
  SELECT user_id, event_type, ts, event_id, ms,
         CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END
             AS chg
  FROM o),
s AS (
  SELECT user_id, event_type, ms,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
  FROM f),
g AS (
  SELECT user_id, seg, min(event_type) AS event_type,
         CAST(min(ms) AS BIGINT) AS valid_from_ms,
         count(*) AS n_events
  FROM s GROUP BY user_id, seg)
SELECT user_id, seg, event_type, valid_from_ms,
       lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY seg)
           AS valid_to_ms,
       n_events
FROM g
""",
)
def rel_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "ms"
    )
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(wseq)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    run = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    segs = ev.withColumn("chg", chg).withColumn(
        "seg", F.sum("chg").over(run).cast("bigint")
    )
    g = segs.groupBy("user_id", "seg").agg(
        F.min("event_type").alias("event_type"),
        F.min("ms").cast("bigint").alias("valid_from_ms"),
        F.count("*").alias("n_events"),
    )
    wuser = Window.partitionBy("user_id").orderBy("seg")
    return g.select(
        "user_id",
        "seg",
        "event_type",
        "valid_from_ms",
        F.lead("valid_from_ms").over(wuser).alias("valid_to_ms"),
        "n_events",
    )


@register(
    "rel_funnel",
    tier="T2",
    doc="Ordered conversion funnel signup → click → purchase: each stage "
    "counts users whose first qualifying event is at-or-after the previous "
    "stage's anchor.  Three unbounded windows over ONE user_id partitioning "
    "(no re-shuffle between stages), then a single global roll-up; "
    "conversion rates are integer 1e4 ratios (non-negative DIV).",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY e.user_id)
SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_click,
       CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchase,
       CAST((SELECT count(*) FROM s2) * 10000
            // NULLIF((SELECT count(*) FROM s1), 0) AS BIGINT)
           AS click_conv_1e4,
       CAST((SELECT count(*) FROM s3) * 10000
            // NULLIF((SELECT count(*) FROM s1), 0) AS BIGINT)
           AS purchase_conv_1e4
""",
)
def rel_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    df = ev.withColumn("s1", F.min(F.when(is_("signup"), F.col("ts"))).over(wu))
    df = df.withColumn(
        "s2",
        F.min(
            F.when(is_("click") & (F.col("ts") >= F.col("s1")), F.col("ts"))
        ).over(wu),
    )
    df = df.withColumn(
        "s3",
        F.min(
            F.when(is_("purchase") & (F.col("ts") >= F.col("s2")), F.col("ts"))
        ).over(wu),
    )
    per_user = df.groupBy("user_id").agg(
        F.max("s1").alias("s1"), F.max("s2").alias("s2"), F.max("s3").alias("s3")
    )
    return per_user.agg(
        F.count("s1").cast("bigint").alias("n_signup"),
        F.count("s2").cast("bigint").alias("n_click"),
        F.count("s3").cast("bigint").alias("n_purchase"),
        F.expr("CAST(count(s2) * 10000 DIV count(s1) AS BIGINT)").alias(
            "click_conv_1e4"
        ),
        F.expr("CAST(count(s3) * 10000 DIV count(s1) AS BIGINT)").alias(
            "purchase_conv_1e4"
        ),
    )


#: Salt fan-out for the skewed-key aggregate — the hot key spreads over
#: this many map-side partials before the (tiny) final combine.
SKEW_SALT = 16


@register(
    "rel_skew_agg",
    tier="T2",
    doc="Skew-resistant aggregation over a deliberately hot key: "
    "skew_key collapses ~30%% of all events onto key 0 (user_id %% 10 < "
    "3), the kill-shape for a naive groupBy at 100 TB (one reducer gets "
    "a third of the table). Two standard counters, both graded: (1) "
    "sum/count run salt-then-combine — a first aggregate on (skew_key, "
    "event_id %% 16) spreads the hot key over 16 partials, the second "
    "combines 16 tiny rows per key; (2) distinct-user counts first "
    "deduplicate (skew_key, user_id) pairs — a shuffle on the HIGH-"
    "cardinality composite, immune to the hot key — then count. AQE "
    "skew-join splitting (spark.sql.adaptive.skewJoin, on in "
    "RUNTIME_CONFS) covers the join side of the same problem at "
    "runtime. Salting changes WHERE rows combine, never the result: "
    "sums ride DECIMAL(38,6), counts are integers — exact under any "
    "grouping, which is precisely why the oracle is a plain GROUP BY.",
    oracle="""
WITH s AS (
  SELECT CASE WHEN user_id % 10 < 3 THEN 0 ELSE user_id END AS skew_key,
         user_id, value
  FROM events
)
SELECT skew_key,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4)
           AS total_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM s GROUP BY skew_key
""",
)
def rel_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 < 3, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("skew_key"),
        "user_id",
        "value",
        "event_id",
    )
    # Phase 1: salted partials — the hot key's rows land on SKEW_SALT
    # different reducers instead of one straggler.
    partial = ev.groupBy(
        "skew_key", (F.col("event_id") % SKEW_SALT).alias("salt")
    ).agg(
        F.count("*").alias("pn"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("ps"),
    )
    # Phase 2: combine — ≤ SKEW_SALT rows per key, trivially balanced.
    totals = partial.groupBy("skew_key").agg(
        F.sum("pn").cast("bigint").alias("n_events"),
        F.round(F.sum("ps").cast("double"), 4).alias("total_value"),
    )
    # Distinct users: dedupe on the high-cardinality (skew_key, user_id)
    # pair first (hot key spreads across users), then a tiny count.
    users = (
        ev.select("skew_key", "user_id")
        .distinct()
        .groupBy("skew_key")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )
    return totals.join(users, "skew_key").select(
        "skew_key", "n_events", "total_value", "n_users"
    )


WEEK_MS = 7 * 86_400_000


@register(
    "rel_retention",
    tier="T2",
    doc="Weekly cohort retention — the classic growth-analytics matrix: "
    "cohort = a user's first active epoch-week, and each (cohort, age) "
    "cell counts users active age weeks later, with the retention share "
    "in integer 1e4 units.  Scale shape: one distinct (user, week) "
    "aggregate over the fact table, a per-user min that reuses the user "
    "key, and a bounded weeks² output joined to bounded cohort sizes — "
    "no self-join of the raw fact, no window over the corpus.",
    oracle=f"""
WITH u AS (
  SELECT user_id, epoch_ms(ts) // {WEEK_MS} AS wk
  FROM events GROUP BY 1, 2
), c AS (
  SELECT user_id, min(wk) AS cw FROM u GROUP BY user_id
), a AS (
  SELECT c.cw AS cohort_week, u.wk - c.cw AS age_weeks,
         count(*) AS n_active
  FROM u JOIN c USING (user_id) GROUP BY 1, 2
), s AS (
  SELECT cw AS cohort_week, count(*) AS cohort_size FROM c GROUP BY 1
)
SELECT a.cohort_week, a.age_weeks,
       CAST(a.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(a.n_active * 10000 // s.cohort_size AS BIGINT)
         AS retention_1e4
FROM a JOIN s USING (cohort_week)
""",
)
def rel_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        table(spark, sf_dir, "events")
        .select("user_id", F.expr(f"ms DIV {WEEK_MS}").alias("wk"))
        .distinct()
    )
    c = u.groupBy("user_id").agg(F.min("wk").alias("cw"))
    a = (
        u.join(c, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("wk") - F.col("cw")).alias("age_weeks"),
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    s = c.groupBy(F.col("cw").alias("cohort_week")).agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    return a.join(s, "cohort_week").select(
        "cohort_week",
        "age_weeks",
        "n_active",
        "cohort_size",
        F.expr("CAST(n_active * 10000 DIV cohort_size AS BIGINT)").alias(
            "retention_1e4"
        ),
    )


DAY_MS = 86_400_000


@register(
    "rel_cusum_changepoint",
    tier="T2",
    doc="CUSUM changepoint detection on the daily event-count series: "
    "cumulative sum of (count - floor-mean) deviations per day, with "
    "the maximum-|CUSUM| day flagged (tie → earliest) — the classic "
    "level-shift detector a monitoring pipeline runs on ingest "
    "volumes.  All integer arithmetic (counts, floor mean, exact "
    "cumulative sums).  Scale shape: the fact table reduces to one "
    "bounded (day, count) aggregate; every window runs over DAYS, "
    "never events.",
    oracle=f"""
WITH d AS (
  SELECT epoch_ms(ts) // {DAY_MS} AS day, count(*) AS n
  FROM events GROUP BY 1
), m AS (
  SELECT CAST(sum(n) // count(*) AS BIGINT) AS mu FROM d
), c AS (
  SELECT d.day, d.n,
         CAST(sum(d.n - m.mu) OVER (ORDER BY d.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cusum
  FROM d CROSS JOIN m
), x AS (
  SELECT min(day) FILTER (WHERE abs(cusum) =
           (SELECT max(abs(cusum)) FROM c)) AS cp_day
  FROM c
)
SELECT c.day, CAST(c.n AS BIGINT) AS n, c.cusum,
       CAST(c.day = x.cp_day AS INT) AS is_changepoint
FROM c CROSS JOIN x
""",
)
def rel_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "events")
        .groupBy(F.expr(f"ms DIV {DAY_MS}").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    m = d.agg(F.expr("CAST(sum(n) DIV count(*) AS BIGINT)").alias("mu"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        F.sum(F.col("n") - F.col("mu")).over(w).cast("bigint").alias(
            "cusum"
        ),
    )
    peak = c.select(F.max(F.abs("cusum")).alias("ma"))
    cp = (
        c.crossJoin(F.broadcast(peak))
        .where(F.abs("cusum") == F.col("ma"))
        .agg(F.min("day").alias("cp_day"))
    )
    return c.crossJoin(F.broadcast(cp)).select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        "cusum",
        (F.col("day") == F.col("cp_day")).cast("int").alias(
            "is_changepoint"
        ),
    )


@register(
    "rel_gapfill",
    tier="T2",
    doc="Calendar-spine gap filling — the time-series hygiene step "
    "before any window/trend math: generate the full day spine from "
    "the observed [min, max] day range, left-join per-(type, day) "
    "counts and emit zero-filled rows with an is_gap marker.  Scale "
    "shape: the fact table reduces to one bounded (type, day) "
    "aggregate; the spine is a generated sequence crossed with the "
    "bounded type dimension — rows are days × types, never events.",
    oracle=f"""
WITH d AS (
  SELECT event_type, epoch_ms(ts) // {DAY_MS} AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(day) AS lo, max(day) AS hi FROM d
), spine AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM d) t
  CROSS JOIN (SELECT unnest(range(
      (SELECT lo FROM bounds), (SELECT hi FROM bounds) + 1)) AS day) s
)
SELECT sp.event_type, CAST(sp.day AS BIGINT) AS day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n,
       CAST(d.n IS NULL AS INT) AS is_gap
FROM spine sp LEFT JOIN d
  ON sp.event_type = d.event_type AND sp.day = d.day
""",
)
def rel_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.expr(f"ms DIV {DAY_MS}").alias("day")
        )
        .agg(F.count("*").alias("n"))
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = d.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("day"),
    )
    return spine.join(d, ["event_type", "day"], "left").select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.isnull("n").cast("int").alias("is_gap"),
    )


@register(
    "rel_lateness_profile",
    tier="T2",
    doc="Event-lateness profile — the measurement that SIZES a streaming "
    "watermark instead of guessing it: per event, lateness = how far "
    "behind the per-user running maximum timestamp it arrived, "
    "bucketed into power-of-two second bands (integer bit length, the "
    "seq_len_hist idiom) with counts and the max observed.  A "
    "watermark of the p99 band bounds dropped-late-data risk "
    "explicitly.  The fixture's events are perfectly ts-ordered, so "
    "arrival order is a DETERMINISTIC shuffled ingest replay (LCG "
    "permutation of event_id — both engines compute the identical "
    "key); on real data the ingest sequence column plays this role.  "
    "Scale shape: one running-max window on the per-user arrival "
    "order, one bounded histogram aggregate.",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms,
         max(epoch_ms(ts)) OVER (PARTITION BY user_id
             ORDER BY (event_id * 1103515245 + 12345) % 2147483648,
                      event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high
  FROM events
), lat AS (
  SELECT CASE WHEN high IS NULL OR high <= ms THEN 0
              ELSE (high - ms) // 1000 END AS late_s
  FROM o
), b AS (
  SELECT CASE WHEN late_s = 0 THEN 0
              ELSE length(bin(CAST(late_s AS BIGINT))) END AS bucket,
         late_s
  FROM lat
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(late_s) AS BIGINT) AS max_late_s
FROM b GROUP BY bucket
""",
)
def rel_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    arrival = F.expr("(event_id * 1103515245 + 12345) % 2147483648")
    w = (
        Window.partitionBy("user_id")
        .orderBy(arrival, "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ms",
        F.max("ms").over(w).alias("high"),
    )
    late_s = F.when(
        F.col("high").isNull() | (F.col("high") <= F.col("ms")), F.lit(0)
    ).otherwise(F.expr("(high - ms) DIV 1000"))
    b = o.select(late_s.alias("late_s")).select(
        F.when(F.col("late_s") == 0, F.lit(0))
        .otherwise(F.length(F.bin("late_s")))
        .cast("bigint")
        .alias("bucket"),
        "late_s",
    )
    return b.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    )


@register(
    "rel_concurrency",
    tier="T2",
    doc="Peak concurrency via the sweep-line pattern — the load question "
    "every capacity plan asks ('how many users were in a session at "
    "once?'): user sessions (the op_window_session 2-hour-gap islands) "
    "become [start, end] intervals, interval edges union as +1/-1 "
    "deltas ordered by (time, -delta) so a touch-and-go boundary "
    "counts as overlap, and a running sum sweeps the edge stream; "
    "emitted per day: edge count, peak concurrency and the first "
    "millisecond the peak is reached.  Cross-midnight sessions carry "
    "into the next day via per-day delta totals cumulated over the "
    "bounded DAY domain (two-level sweep).  Scale shape: "
    "sessionization rides the per-user shuffle; the sweep orders "
    "EDGES (two per session, ≪ events) within day partitions — the "
    "classic interval-stabbing plan with no corpus-global sort.",
    oracle="""
WITH x AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 2 HOURS
              THEN 1 ELSE 0 END AS new_session
  FROM events
), y AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM x
), sess AS (
  SELECT user_id, sid,
         min(epoch_ms(ts)) AS s_ms, max(epoch_ms(ts)) AS e_ms
  FROM y GROUP BY user_id, sid
), edges AS (
  SELECT s_ms AS ms, 1 AS d FROM sess
  UNION ALL
  SELECT e_ms AS ms, -1 AS d FROM sess
), carry AS (
  SELECT day, coalesce(SUM(daysum) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cin
  FROM (SELECT ms // 86400000 AS day, SUM(d) AS daysum
        FROM edges GROUP BY 1)
), sweep AS (
  SELECT e.ms // 86400000 AS day, e.ms, e.d,
         c.cin + SUM(e.d) OVER (PARTITION BY e.ms // 86400000
             ORDER BY e.ms, e.d DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
  FROM edges e JOIN carry c ON e.ms // 86400000 = c.day
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(max(conc) AS BIGINT) AS peak,
       CAST(min(CASE WHEN conc = mx THEN ms END) AS BIGINT)
         AS first_peak_ms
FROM (SELECT *, max(conc) OVER (PARTITION BY day) AS mx FROM sweep)
GROUP BY day
""",
)
def rel_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    two_h_ns = 2 * 3_600 * 1_000_000_000
    x = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") - F.lag("ts").over(wseq) >= two_h_ns, 1
        ).otherwise(0),
    )
    y = x.withColumn(
        "sid",
        F.sum("new_session").over(
            wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = y.groupBy("user_id", "sid").agg(
        F.min("ms").alias("s_ms"), F.max("ms").alias("e_ms")
    )
    # Round-17 (guide §2.4 — don't compute things twice): the +1/-1
    # edge stream was a UNION of two selects over `sess`, so the
    # sessionization window + aggregate ran once per branch — and
    # `tagged` feeds both the carry rollup and the sweep join, doubling
    # it again (4 corpus-window passes in one plan).  An explode emits
    # both edges from ONE sess pass, and the tiny edge table (2 rows
    # per session, ≪ events) is session-memoized + persisted so the
    # carry and sweep consumers — and warm re-runs — read it instead
    # of re-running the per-user window (the _chunk_table convention).
    from scala_reactivex_spark.plans.memo import session_memo

    edges = session_memo(
        spark,
        sf_dir,
        "concurrency_edges",
        lambda: sess.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("s_ms").alias("ms"), F.lit(1).alias("d")
                    ),
                    F.struct(
                        F.col("e_ms").alias("ms"), F.lit(-1).alias("d")
                    ),
                )
            ).alias("e")
        )
        .select("e.ms", "e.d")
        .persist(),
    )
    day = F.expr("ms DIV 86400000")
    tagged = edges.withColumn("day", day)
    # Overnight carry: per-day delta totals (bounded) cumulated over the
    # DAY domain, so a session spanning midnight still counts tomorrow —
    # the two-level form of the sweep that avoids any corpus-global sort.
    wdays = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = (
        tagged.groupBy("day")
        .agg(F.sum("d").alias("daysum"))
        .withColumn("cin", F.coalesce(F.sum("daysum").over(wdays), F.lit(0)))
        .select("day", "cin")
    )
    wsweep = (
        Window.partitionBy("day")
        .orderBy(F.col("ms"), F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = tagged.join(F.broadcast(carry), "day").withColumn(
        "conc", F.col("cin") + F.sum("d").over(wsweep)
    )
    wmax = Window.partitionBy("day")
    marked = sweep.withColumn("mx", F.max("conc").over(wmax))
    return marked.groupBy(F.col("day").cast("bigint").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_edges"),
        F.max("conc").cast("bigint").alias("peak"),
        F.min(F.when(F.col("conc") == F.col("mx"), F.col("ms")))
        .cast("bigint")
        .alias("first_peak_ms"),
    )


@register(
    "rel_join_asof_nearest",
    tier="T2",
    doc="Nearest-in-time as-of join — the sensor-alignment variant of "
    "rel_join_asof: each purchase pairs with the click of the same "
    "user MINIMIZING absolute time distance (backward OR forward), "
    "ties to the earlier click then smaller id.  Two union-tag "
    "as-of passes (backward last-ignorenulls + forward first over the "
    "reversed order) on ONE user partitioning produce both "
    "candidates; a struct-min picks the nearer — still no pair "
    "blow-up, still one shuffle.  Scale shape: identical to "
    "rel_join_asof ×2 window passes.",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click'),
     cand AS (
       SELECT p.event_id AS p_event_id, p.user_id,
              epoch_ms(p.ts) AS p_ms,
              c.event_id AS c_event_id, epoch_ms(c.ts) AS c_ms,
              abs(epoch_ms(c.ts) - epoch_ms(p.ts)) AS dist
       FROM p JOIN c ON p.user_id = c.user_id
     ), best AS (
       SELECT *, row_number() OVER (PARTITION BY p_event_id
                 ORDER BY dist, c_ms, c_event_id) AS rn
       FROM cand
     )
SELECT p_event_id, user_id, p_ms, c_event_id, c_ms,
       CAST(dist AS BIGINT) AS dist_ms
FROM best WHERE rn = 1
""",
)
def rel_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "ms", F.lit(0).alias("kind")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "ms", F.lit(1).alias("kind")
    )
    u = clicks.unionByName(purchases).select(
        "*",
        F.when(F.col("kind") == 0, F.struct("ms", "event_id")).alias("ck"),
    )
    # Backward pass: clicks sort before same-ts purchases (<= semantics,
    # ties prefer max id like rel_join_asof); forward pass mirrors.
    # Within equal-ts click runs the LAST-visited row becomes the
    # candidate, so clicks order by event_id DESC in the backward pass
    # (and DESC again under the reversed forward sort) — both passes
    # then surface the SMALLEST click id, matching the oracle's
    # (dist, c_ms, c_event_id) tie order even on duplicate timestamps.
    click_id_desc = F.expr(
        "CASE WHEN kind = 0 THEN -event_id ELSE event_id END"
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", click_id_desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("kind").desc(),
                 F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = (
        u.withColumn("back", F.last("ck", ignorenulls=True).over(wb))
        .withColumn("fwd", F.last("ck", ignorenulls=True).over(wf))
        .where(F.col("kind") == 1)
    )
    pick = F.expr(
        """CASE
          WHEN back IS NULL AND fwd IS NULL THEN NULL
          WHEN back IS NULL THEN fwd
          WHEN fwd IS NULL THEN back
          WHEN abs(back.ms - ms) < abs(fwd.ms - ms) THEN back
          WHEN abs(fwd.ms - ms) < abs(back.ms - ms) THEN fwd
          WHEN back.ms < fwd.ms THEN back
          WHEN fwd.ms < back.ms THEN fwd
          WHEN back.event_id <= fwd.event_id THEN back ELSE fwd
        END"""
    )
    out = both.withColumn("nn", pick).where(F.col("nn").isNotNull())
    return out.select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ms").alias("p_ms"),
        F.col("nn.event_id").alias("c_event_id"),
        F.col("nn.ms").alias("c_ms"),
        F.abs(F.col("nn.ms") - F.col("ms")).cast("bigint").alias(
            "dist_ms"
        ),
    )


TOP_MOVERS_K = 3


@register(
    "rel_top_movers",
    tier="T2",
    doc="Day-over-day top movers — the anomaly feed an ops dashboard "
    "leads with: per event type, daily deltas over the GAP-FILLED "
    "calendar spine (a missing day legitimately produces a crash-to-"
    f"zero delta, which is the point), ranked by |Δ|; top "
    f"{TOP_MOVERS_K} days per type with the delta and previous value. "
    " The oracle nests the green rel_gapfill oracle.  Scale shape: "
    "lag + rank windows run over the bounded (type, day) spine, never "
    "events.",
    oracle=None,  # assigned below (embeds rel_gapfill's oracle)
)
def rel_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    filled = rel_gapfill(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    d = filled.withColumn("prev_n", F.lag("n").over(w)).where(
        F.col("prev_n").isNotNull()
    )
    d = d.withColumn("delta", F.col("n") - F.col("prev_n"))
    wr = Window.partitionBy("event_type").orderBy(
        F.abs("delta").desc(), "day"
    )
    return (
        d.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= TOP_MOVERS_K)
        .select(
            "event_type",
            F.col("rnk").cast("bigint").alias("rnk"),
            "day",
            F.col("n").cast("bigint").alias("n"),
            F.col("prev_n").cast("bigint").alias("prev_n"),
            F.col("delta").cast("bigint").alias("delta"),
        )
    )


from scala_reactivex_spark.plans.registry import peek as _peek_tm  # noqa: E402

_peek_tm("rel_top_movers").oracle = f"""
WITH filled AS (
{_peek_tm("rel_gapfill").oracle}
), d AS (
  SELECT event_type, day, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
  FROM filled
), deltas AS (
  SELECT event_type, day, n, prev_n, n - prev_n AS delta
  FROM d WHERE prev_n IS NOT NULL
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY abs(delta) DESC, day) AS rnk
  FROM deltas
)
SELECT event_type, CAST(rnk AS BIGINT) AS rnk, day,
       CAST(n AS BIGINT) AS n, CAST(prev_n AS BIGINT) AS prev_n,
       CAST(delta AS BIGINT) AS delta
FROM ranked WHERE rnk <= {TOP_MOVERS_K}
"""


DECAY_HALF_LIFE_DAYS = 7


@register(
    "rel_decay_sum",
    tier="T2",
    doc="Exponential time-decay aggregation — the recency-weighted "
    "score behind trending/ranking feeds: each event contributes "
    f"value × 2^(-age_days/{DECAY_HALF_LIFE_DAYS}) relative to the "
    "corpus max day.  Weights pin per ROW to integer 1e6 (identical "
    "pow doubles of identical integer ages), 2-dp values lift to "
    "integer cents, so the per-type decayed total is an EXACT integer "
    "sum — order-proof despite the floats inside.  Scale shape: one "
    "1-row max-day broadcast, one hash aggregate; weights never "
    "require a sort.",
    oracle=f"""
WITH mx AS (
  SELECT max(epoch_ms(ts)) // 86400000 AS maxd FROM events
), w AS (
  SELECT e.event_type,
         CAST(round(e.value * 100) AS BIGINT) AS cents,
         CAST(floor(pow(2.0, -CAST(mx.maxd - epoch_ms(e.ts) // 86400000
                                   AS DOUBLE) / {DECAY_HALF_LIFE_DAYS})
                    * 1000000 + 0.5) AS BIGINT) AS w1e6
  FROM events e CROSS JOIN mx
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents * w1e6) AS BIGINT) AS decayed_micro_cents,
       CAST(sum(cents) AS BIGINT) AS raw_cents
FROM w GROUP BY event_type
""",
)
def rel_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.expr("max(ms) DIV 86400000").alias("maxd"))
    w = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.floor(
            F.pow(
                F.lit(2.0),
                -(
                    (F.col("maxd") - F.expr("ms DIV 86400000")).cast(
                        "double"
                    )
                )
                / DECAY_HALF_LIFE_DAYS,
            )
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("w1e6"),
    )
    return w.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("cents") * F.col("w1e6"))
        .cast("bigint")
        .alias("decayed_micro_cents"),
        F.sum("cents").cast("bigint").alias("raw_cents"),
    )


ATTR_CHANNELS = 10  # channel = JSON props.k mod 10


@register(
    "rel_attribution",
    tier="T2",
    doc="Last-touch attribution — the marketing rollup every revenue "
    "dashboard runs: each purchase's value (integer cents) attributes "
    "to the CHANNEL of its as-of click (rel_join_asof's most-recent-"
    "click-at-or-before semantics; channel = the click's JSON props.k "
    f"mod {ATTR_CHANNELS}); purchases with no prior click land in the "
    "'organic' bucket (-1).  Composes the graded as-of machinery with "
    "JSON extraction on the dimension side.  Scale shape: the union-"
    "tag as-of pass is one user-keyed shuffle; the rollup is one hash "
    "aggregate on the bounded channel key.",
    oracle=f"""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     c AS (SELECT * FROM events WHERE event_type = 'click'),
     best AS (
       SELECT p.event_id AS p_event_id, p.user_id, p.ts AS p_ts,
              p.value, max(c.ts) AS c_ts
       FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
       GROUP BY p.event_id, p.user_id, p.ts, p.value
     ), pick AS (
       SELECT b.p_event_id, b.value,
              max(c.event_id) AS c_event_id
       FROM best b LEFT JOIN c
         ON c.user_id = b.user_id AND c.ts = b.c_ts
       GROUP BY b.p_event_id, b.value
     ), attr AS (
       SELECT pk.p_event_id, pk.value,
              CASE WHEN pk.c_event_id IS NULL THEN -1
                   ELSE TRY_CAST(json_extract_string(c.props, '$.k')
                                 AS INTEGER) % {ATTR_CHANNELS} END
                AS channel
       FROM pick pk LEFT JOIN c ON pk.c_event_id = c.event_id
     )
SELECT CAST(channel AS BIGINT) AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM attr GROUP BY channel
""",
)
def rel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.lit(None).cast("double").alias("pvalue"),
        F.expr(
            f"try_cast(get_json_object(props, '$.k') AS INT)"
            f" % {ATTR_CHANNELS}"
        ).alias("ch"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.col("value").alias("pvalue"),
        F.lit(None).cast("int").alias("ch"),
    )
    u = clicks.unionByName(purchases).select(
        "*", F.when(F.col("kind") == 0, F.col("ch")).alias("click_ch")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        u.withColumn(
            "attr_ch", F.last("click_ch", ignorenulls=True).over(w)
        )
        .where(F.col("kind") == 1)
        .select(
            F.coalesce("attr_ch", F.lit(-1)).alias("channel"), "pvalue"
        )
    )
    return attributed.groupBy(
        F.col("channel").cast("bigint").alias("channel")
    ).agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum(F.round(F.col("pvalue") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )
