"""Salted two-level escape hatches for the per-key ordered family.

The per-key ordered operators (running scan, pairwise, distinct-until-
changed, debounce) plan as one window over ``PARTITION BY user_id ORDER
BY ts, event_id`` — all rows of one user land in a single task and sort
there.  The round-11 hot-key probe (scripts/skew_probe.py, SCALING.md)
measured what that costs when one user holds ~30% of a 10M-row corpus:
op_pairwise 2.77×, op_distinct_until_changed 2.65×, op_scan_running_sum
and op_debounce 1.73× their uniform-distribution wall time, because the
3M-row hot partition binds while 31 cores idle.  (At 1M rows the same
skew is absorbed — worst ratio 1.06 — so the hatch is a scale knob, not
a default.)

The hatch is the classic two-level rewrite: split each user's stream
into TIME-RANGE CHUNKS (equal ``ts`` always lands in one chunk, so the
(ts, event_id) total order is preserved across the split), do the
ordered work within (user_id, chunk) — the hot key now spreads over
``SALT_CHUNKS`` tasks — then stitch chunk boundaries with one tiny
per-user pass over the chunk SUMMARIES (≤ SALT_CHUNKS rows per user):

- running sum: exclusive prefix of per-chunk DECIMAL totals, added to
  the chunk-local running sum (decimal addition is exact, so values
  are bit-identical to the single-window form);
- pairwise / distinct-until-changed: a chunk's first row takes its
  predecessor from the previous non-empty chunk's TAIL row;
- debounce: a chunk's last row takes its successor gap from the next
  non-empty chunk's HEAD timestamp.

Each hatch is registered as a first-class graded query against the SAME
DuckDB oracle as its single-window twin — the driver hash-grades that
the two plans agree to the bit.  llm_pack_sequences' two-phase cumsum
(llm_pipeline.py) is the same rewrite applied to sequence packing.

WHEN to switch is itself a graded query: ``op_salt_dispatch_stats``
(below) reports the hottest key's row count and corpus share in one
skew-immune aggregate pass and emits ``use_salted`` against the
measured ``SALT_DISPATCH_ROWS`` threshold — run it on the target
corpus and dispatch on its answer instead of guessing from SCALING.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import DEC
from scala_reactivex_spark.operators import stateful as _stateful  # noqa: F401
from scala_reactivex_spark.operators import windows as _windows
from scala_reactivex_spark.plans.registry import _REGISTRY, register
from scala_reactivex_spark.sources.catalog import table

#: Chunks per user stream — the parallelism a hot key spreads over.
SALT_CHUNKS = 32


def _chunked(df: DataFrame, n: int = SALT_CHUNKS) -> DataFrame:
    """Attach a time-range ``chunk`` id (0..n-1): integer math on the
    raw int64-ns ``ts`` over the global [min, max] span, so equal
    timestamps always share a chunk and chunk order extends the
    (ts, event_id) order.  The 1-row range frame is a broadcast scalar
    attach.

    Width-first form — ``width = span div n + 1; chunk = (ts - lo) div
    width`` — keeps every intermediate within int64 for ANY ns span (the
    round-11 ``(ts - lo) * n`` form overflowed past a ~2^63/n span,
    i.e. ~9 years of nanoseconds at n=32; round-11 ADVICE).  Monotone in
    ``ts`` and equal-ts-shares-a-chunk hold exactly as before; only the
    (arbitrary) boundary placement shifts, which the stitch passes never
    depend on."""
    rng = df.agg(F.min("ts").alias("_lo"), F.max("ts").alias("_hi"))
    return (
        df.crossJoin(F.broadcast(rng))
        .withColumn(
            "chunk",
            F.expr(f"(ts - _lo) div ((_hi - _lo) div {n} + 1)").cast(
                "bigint"
            ),
        )
        .drop("_lo", "_hi")
    )


def _w_chunk():
    """The salted order: per (user, time-chunk) — the hot user's sort
    now runs as SALT_CHUNKS independent tasks."""
    return Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")


def _w_chunks():
    """Per-user pass over chunk summaries (≤ SALT_CHUNKS rows/user)."""
    return Window.partitionBy("user_id").orderBy("chunk")


def scan_running_sum_salted(df: DataFrame) -> DataFrame:
    local = F.sum(F.col("value").cast(DEC)).over(
        _w_chunk().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = _chunked(df).withColumn("_loc", local)
    offs = (
        d.groupBy("user_id", "chunk")
        .agg(F.sum(F.col("value").cast(DEC)).alias("_tot"))
        .withColumn(
            "_off",
            F.sum("_tot").over(
                _w_chunks().rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .drop("_tot")
    )
    return d.join(offs, ["user_id", "chunk"]).select(
        "user_id",
        "event_id",
        "ms",
        F.round(
            (
                F.col("_loc")
                + F.coalesce(F.col("_off"), F.lit(0).cast(DEC))
            ).cast("double"),
            4,
        ).alias("running_sum"),
    )


def pairwise_salted(df: DataFrame) -> DataFrame:
    d = _chunked(df).withColumn(
        "_lp", F.lag(F.struct(F.col("value").alias("v"))).over(_w_chunk())
    )
    prevtail = (
        d.groupBy("user_id", "chunk")
        .agg(
            F.max(
                F.struct("ts", "event_id", F.col("value").alias("v"))
            ).alias("_tail")
        )
        .withColumn("_pt", F.lag("_tail").over(_w_chunks()))
        .select("user_id", "chunk", "_pt")
    )
    prev_v = F.when(F.col("_lp").isNotNull(), F.col("_lp.v")).otherwise(
        F.col("_pt.v")
    )
    return (
        d.join(prevtail, ["user_id", "chunk"])
        .select(
            "user_id",
            "event_id",
            "ms",
            F.round(prev_v, 4).alias("prev_value"),
            F.round("value", 4).alias("cur_value"),
        )
        .where(F.col("prev_value").isNotNull())
    )


def distinct_until_changed_salted(df: DataFrame) -> DataFrame:
    d = _chunked(df).withColumn(
        "_lp",
        F.lag(F.struct(F.col("event_type").alias("t"))).over(_w_chunk()),
    )
    prevtail = (
        d.groupBy("user_id", "chunk")
        .agg(
            F.max(
                F.struct("ts", "event_id", F.col("event_type").alias("t"))
            ).alias("_tail")
        )
        .withColumn("_pt", F.lag("_tail").over(_w_chunks()))
        .select("user_id", "chunk", "_pt")
    )
    prev_t = F.when(F.col("_lp").isNotNull(), F.col("_lp.t")).otherwise(
        F.col("_pt.t")
    )
    return (
        d.join(prevtail, ["user_id", "chunk"])
        .where(prev_t.isNull() | (F.col("event_type") != prev_t))
        .select("user_id", "event_id", "ms", "event_type")
    )


def debounce_salted(df: DataFrame) -> DataFrame:
    d = _chunked(df).withColumn("_ln", F.lead("ts").over(_w_chunk()))
    nexthead = (
        d.groupBy("user_id", "chunk")
        .agg(F.min("ts").alias("_h"))
        .withColumn("_nh", F.lead("_h").over(_w_chunks()))
        .select("user_id", "chunk", "_nh")
    )
    gap = F.coalesce(F.col("_ln"), F.col("_nh")) - F.col("ts")
    return (
        d.join(nexthead, ["user_id", "chunk"])
        .withColumn("gap_ns", gap)
        .where(
            F.col("gap_ns").isNull()
            | (F.col("gap_ns") >= _windows.DEBOUNCE_NS)
        )
        .select(
            "user_id",
            "event_id",
            "ms",
            "event_type",
            F.round("value", 4).alias("value_r"),
        )
    )


_HATCH_DOC = (
    "Salted two-level escape hatch for {base} [hot-key skew, round-11 "
    "probe: {ratio}x at a 30%-single-key 10M-row corpus]: the ordered "
    "work runs per (user, time-range chunk) — the hot key spreads over "
    f"{SALT_CHUNKS} tasks — and chunk boundaries are stitched with one "
    "per-user pass over chunk summaries.  Graded against {base}'s OWN "
    "oracle, so the driver hash-certifies the rewrite equals the "
    "single-window plan bit-for-bit.  See operators/salted.py module "
    "doc and SCALING.md round-11 skew batch."
)


@register(
    "op_scan_running_sum_salted",
    tier="T1",
    doc=_HATCH_DOC.format(base="op_scan_running_sum", ratio="1.73"),
    oracle=_REGISTRY["op_scan_running_sum"].oracle,
)
def op_scan_running_sum_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return scan_running_sum_salted(table(spark, sf_dir, "events"))


@register(
    "op_pairwise_salted",
    tier="T1",
    doc=_HATCH_DOC.format(base="op_pairwise", ratio="2.77"),
    oracle=_REGISTRY["op_pairwise"].oracle,
)
def op_pairwise_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pairwise_salted(table(spark, sf_dir, "events"))


@register(
    "op_distinct_until_changed_salted",
    tier="T1",
    doc=_HATCH_DOC.format(base="op_distinct_until_changed", ratio="2.65"),
    oracle=_REGISTRY["op_distinct_until_changed"].oracle,
)
def op_distinct_until_changed_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return distinct_until_changed_salted(table(spark, sf_dir, "events"))


@register(
    "op_debounce_salted",
    tier="T1",
    doc=_HATCH_DOC.format(base="op_debounce", ratio="1.73"),
    oracle=_REGISTRY["op_debounce"].oracle,
)
def op_debounce_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return debounce_salted(table(spark, sf_dir, "events"))


#: Dispatch threshold for the salted hatches, in ABSOLUTE rows on the
#: hottest key: the round-11 probe (scripts/skew_probe.py, SCALING.md)
#: measured a 300k-row hot key fully absorbed by the single-window plan
#: (worst skew ratio 1.06) and a 3M-row hot key binding it 2.6-2.9x,
#: with the salted plans ~1.6x slower on balanced keys — so the switch
#: pays off between those marks.  1M rows is the documented midpoint;
#: it tracks per-task sort throughput (one key = one task in the base
#: plan), NOT cluster size, so it holds unchanged on a 1000-executor
#: cluster.
SALT_DISPATCH_ROWS = 1_000_000


def _hot_key_rows(df: DataFrame) -> int:
    """Rows on the hottest key — the op_salt_dispatch_stats scalar the
    auto operators branch on.  One grouped count with map-side partials
    (skew-immune by construction) collapsed to a single driver scalar:
    size-based plan selection, the same sanctioned control-flow pattern
    as the convergence checks in connected_components."""
    row = (
        df.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("m"))
        .first()
    )
    return int(row["m"]) if row and row["m"] is not None else 0


_AUTO_DOC = (
    "Auto-dispatching {base} [the round-12 closing of the salted-hatch "
    "loop]: runs the op_salt_dispatch_stats probe (one skew-immune "
    "grouped count collapsed to a scalar — control flow, not data "
    "movement) and picks the plan a production job should run — the "
    "single-window {base} below SALT_DISPATCH_ROWS on the hottest key, "
    "the salted two-level rewrite above it.  Both branches are driver "
    "hash-certified against this SAME oracle ({base}'s), so the "
    "dispatch can never change the answer, only the plan.  This is the "
    "engine making SCALING.md's 'switch when a key binds' rule "
    "self-executing."
)


def _auto(spark: SparkSession, sf_dir: str, base_key: str, salted_fn):
    ev = table(spark, sf_dir, "events")
    if _hot_key_rows(ev) > SALT_DISPATCH_ROWS:
        return salted_fn(ev)
    return _REGISTRY[base_key].fn(spark, sf_dir)


@register(
    "op_scan_running_sum_auto",
    tier="T1",
    doc=_AUTO_DOC.format(base="op_scan_running_sum"),
    oracle=_REGISTRY["op_scan_running_sum"].oracle,
)
def op_scan_running_sum_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _auto(
        spark, sf_dir, "op_scan_running_sum", scan_running_sum_salted
    )


@register(
    "op_pairwise_auto",
    tier="T1",
    doc=_AUTO_DOC.format(base="op_pairwise"),
    oracle=_REGISTRY["op_pairwise"].oracle,
)
def op_pairwise_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _auto(spark, sf_dir, "op_pairwise", pairwise_salted)


@register(
    "op_distinct_until_changed_auto",
    tier="T1",
    doc=_AUTO_DOC.format(base="op_distinct_until_changed"),
    oracle=_REGISTRY["op_distinct_until_changed"].oracle,
)
def op_distinct_until_changed_auto(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _auto(
        spark,
        sf_dir,
        "op_distinct_until_changed",
        distinct_until_changed_salted,
    )


@register(
    "op_debounce_auto",
    tier="T1",
    doc=_AUTO_DOC.format(base="op_debounce"),
    oracle=_REGISTRY["op_debounce"].oracle,
)
def op_debounce_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _auto(spark, sf_dir, "op_debounce", debounce_salted)


@register(
    "op_salt_dispatch_stats",
    tier="T1",
    doc="Skew dispatch signal for the salted escape hatches [the "
    "llm_dedup_minhash_stats pattern applied to per-key skew]: one "
    "hash-aggregate pass over events reporting total rows, key "
    "cardinality, the hottest key and its row count / corpus share "
    f"(1e4 units), and use_salted = top_rows > {SALT_DISPATCH_ROWS} "
    "(SALT_DISPATCH_ROWS — the round-11 probe's measured switch "
    "point; see the constant's doc).  This is the production decision "
    "procedure the round-11 verdict asked for: instead of a threshold "
    "buried in SCALING.md, a pipeline runs THIS query and switches to "
    "the _salted twins when it says so.  The stats pass itself is "
    "skew-immune (grouped count with map-side partials; the hottest "
    "key costs one partial per task, never one task).",
    oracle=f"""
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows
  FROM per
), top AS (
  SELECT CAST(user_id AS BIGINT) AS top_user_id,
         cnt AS top_rows
  FROM per ORDER BY cnt DESC, user_id ASC LIMIT 1
)
SELECT n_rows, n_keys, top_user_id, top_rows,
       CAST(top_rows * 10000 // n_rows AS BIGINT) AS top_share_1e4,
       CAST({SALT_DISPATCH_ROWS} AS BIGINT) AS dispatch_rows,
       top_rows > {SALT_DISPATCH_ROWS} AS use_salted
FROM tot, top
""",
)
def op_salt_dispatch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    return dispatch_summary(per)


def dispatch_summary(per: DataFrame) -> DataFrame:
    """One-row dispatch summary over a ``(user_id, cnt)`` per-key count
    frame — shared by the batch query and the streaming skew monitor's
    view (streaming/twins.py salt_dispatch_view), so the live table and
    the batch grade derive the decision identically."""
    tot = per.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
    )
    # Deterministic argmax: max on (cnt, -user_id) = highest count,
    # ties to the SMALLEST user id — replayed by the oracle's ORDER BY.
    top = per.agg(
        F.max(F.struct(F.col("cnt"), (-F.col("user_id")).alias("nu"))).alias(
            "t"
        )
    ).select(
        (-F.col("t.nu")).cast("bigint").alias("top_user_id"),
        F.col("t.cnt").alias("top_rows"),
    )
    return (
        tot.crossJoin(F.broadcast(top))
        # Empty-input parity with the oracle (round-12 review): on an
        # empty per-key frame the aggregates still emit one all-NULL
        # row but the oracle's LIMIT-1 'top' CTE emits none — filter
        # the NULL-top row so both engines return ZERO rows, the
        # defined degradation (a consumer never sees use_salted=NULL).
        .where(F.col("top_rows").isNotNull())
        .select(
            "n_rows",
            "n_keys",
            "top_user_id",
            "top_rows",
            F.expr("CAST(top_rows * 10000 DIV n_rows AS BIGINT)").alias(
                "top_share_1e4"
            ),
            F.lit(SALT_DISPATCH_ROWS).cast("bigint").alias("dispatch_rows"),
            (F.col("top_rows") > SALT_DISPATCH_ROWS).alias("use_salted"),
        )
    )
