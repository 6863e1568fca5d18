"""Fluent Observable-style API — the reference user's composition surface.

A user of ``pietro909/scala-reactivex`` writes chains like
``stream.filter(p).map(f).scan(g)`` [RS:4.x processors; RX contract].  This
module gives them the same ergonomics over DataFrames: :class:`EventStream`
wraps a frame plus its (key, event-time, tie-break) columns and exposes the
Rx operator surface as composable methods.  Every method builds the SAME
window/join formulation the verified ``queries()`` registry uses — this is
a fluent veneer, not a second implementation (equivalence pytest-checked).

Assembly is lazy exactly like the reference: each call only grows the
logical plan; nothing executes until a terminal action (``to_df().collect``,
``write``), at which point Catalyst optimizes the WHOLE chain — the engine's
analogue of operator fusion.

>>> s = EventStream.from_parquet(spark, f"{sf}/events.parquet")
>>> (s.filter("event_type = 'purchase'")
...   .scan_sum("value")
...   .to_df())
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, WindowSpec
from pyspark.sql import functions as F

from scala_reactivex_spark.functions.determinism import DEC
from scala_reactivex_spark.session import configure_session


class EventStream:
    """An ordered, keyed event stream (Observable[T] stand-in, SURVEY §1.2).

    Order is data: ``(ts_col, seq_col)`` is the per-key total order; all
    stateful operators window over it. The wrapped frame is immutable —
    every operator returns a new EventStream.
    """

    def __init__(
        self,
        df: DataFrame,
        key: str = "user_id",
        ts_col: str = "ts",
        seq_col: str = "event_id",
    ) -> None:
        self.df = df
        self.key = key
        self.ts_col = ts_col
        self.seq_col = seq_col

    @classmethod
    def from_parquet(
        cls,
        spark: SparkSession,
        path: str,
        key: str = "user_id",
        ts_col: str = "ts",
        seq_col: str = "event_id",
    ) -> "EventStream":
        configure_session(spark)
        return cls(spark.read.parquet(path), key, ts_col, seq_col)

    # -- internals ---------------------------------------------------------

    def _wrap(self, df: DataFrame) -> "EventStream":
        return EventStream(df, self.key, self.ts_col, self.seq_col)

    def _w(self) -> WindowSpec:
        return Window.partitionBy(self.key).orderBy(self.ts_col, self.seq_col)

    def _w_run(self) -> WindowSpec:
        return self._w().rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )

    # -- stateless [RX:map, RX:filter, RX:flatmap] -------------------------

    def map(self, *cols: Column | str) -> "EventStream":
        keep = [self.key, self.ts_col, self.seq_col]
        return self._wrap(self.df.select(*keep, *cols))

    def with_column(self, name: str, col: Column) -> "EventStream":
        return self._wrap(self.df.withColumn(name, col))

    def filter(self, cond: Column | str) -> "EventStream":
        return self._wrap(self.df.where(cond))

    def flat_map(self, name: str, array_col: Column | str) -> "EventStream":
        keep = [self.key, self.ts_col, self.seq_col]
        return self._wrap(
            self.df.select(*keep, F.explode(array_col).alias(name))
        )

    # -- per-key state [RX:scan, RX:distinct, RX:take, RX:skip] ------------

    def scan_sum(self, value_col: str, alias: str = "running_sum") -> "EventStream":
        running = F.round(
            F.sum(F.col(value_col).cast(DEC)).over(self._w_run()).cast("double"),
            4,
        )
        return self._wrap(self.df.withColumn(alias, running))

    def pairwise(self, value_col: str) -> "EventStream":
        prev = F.lag(value_col).over(self._w())
        return self._wrap(
            self.df.withColumn("prev_" + value_col, prev).where(
                F.col("prev_" + value_col).isNotNull()
            )
        )

    def distinct_until_changed(self, col: str) -> "EventStream":
        prev = F.lag(col).over(self._w())
        return self._wrap(
            self.df.withColumn("_prev", prev)
            .where(F.col("_prev").isNull() | (F.col(col) != F.col("_prev")))
            .drop("_prev")
        )

    def take(self, n: int) -> "EventStream":
        return self._wrap(
            self.df.withColumn("_rn", F.row_number().over(self._w()))
            .where(F.col("_rn") <= n)
            .drop("_rn")
        )

    def skip(self, n: int) -> "EventStream":
        return self._wrap(
            self.df.withColumn("_rn", F.row_number().over(self._w()))
            .where(F.col("_rn") > n)
            .drop("_rn")
        )

    # -- time / rate [RX:debounce, RX:sample] ------------------------------

    def debounce(self, gap_ns: int) -> "EventStream":
        nxt = F.lead(self.ts_col).over(self._w())
        gap = nxt - F.col(self.ts_col)
        return self._wrap(
            self.df.withColumn("_gap", gap)
            .where(F.col("_gap").isNull() | (F.col("_gap") >= gap_ns))
            .drop("_gap")
        )

    def throttle_first(self, period_ns: int) -> "EventStream":
        bucket = F.expr(f"{self.ts_col} div {period_ns}")
        w = Window.partitionBy(self.key, bucket).orderBy(
            self.ts_col, self.seq_col
        )
        return self._wrap(
            self.df.withColumn("_rn", F.row_number().over(w))
            .where("_rn = 1")
            .drop("_rn")
        )

    # -- combinators [RX:merge, RX:zip, RX:combinelatest, RX:takeuntil] ----

    def merge(self, other: "EventStream") -> "EventStream":
        return self._wrap(self.df.unionByName(other.df, allowMissingColumns=True))

    def zip(self, other: "EventStream", suffix: str = "_b") -> "EventStream":
        num = lambda s: s.df.withColumn(  # noqa: E731
            "_rn", F.row_number().over(s._w())
        )
        a = num(self)
        # Address the other stream through ITS OWN key column, aliased —
        # the two streams may use different key/ts/seq names.
        b = num(other).select(
            F.col(other.key).alias("_k"),
            "_rn",
            *[
                F.col(c).alias(c + suffix)
                for c in other.df.columns
                if c != other.key
            ],
        )
        joined = a.join(
            b, (a[self.key] == b["_k"]) & (a["_rn"] == b["_rn"])
        ).drop("_k", "_rn")
        return self._wrap(joined)

    def with_latest_from(
        self, other: "EventStream", value_col: str, alias: str
    ) -> "EventStream":
        """As-of join: each element of self paired with other's latest
        value at or before it (union + last IGNORE NULLS — SURVEY §7)."""
        a = self.df.withColumn("_is_a", F.lit(True)).withColumn(
            "_other_val", F.lit(None).cast("double")
        )
        # Select the OTHER stream's own key/time/seq columns, aliased into
        # self's names so the union lines up even when the two streams use
        # different column naming.
        b = (
            other.df.select(
                F.col(other.key).alias(self.key),
                F.col(other.ts_col).alias(self.ts_col),
                F.col(other.seq_col).alias(self.seq_col),
                F.col(value_col).cast("double").alias("_other_val"),
            )
            .withColumn("_is_a", F.lit(False))
        )
        u = a.unionByName(b, allowMissingColumns=True)
        latest = F.last("_other_val", ignorenulls=True).over(
            Window.partitionBy(self.key)
            .orderBy(self.ts_col, self.seq_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            u.withColumn(alias, latest)
            .where(F.col("_is_a") & F.col(alias).isNotNull())
            .drop("_is_a", "_other_val")
        )
        return self._wrap(out)

    def take_until(self, other: "EventStream") -> "EventStream":
        firsts = other.df.groupBy(
            F.col(other.key).alias(self.key)
        ).agg(F.min(other.ts_col).alias("_first_ts"))
        joined = self.df.join(F.broadcast(firsts), self.key, "left")
        return self._wrap(
            joined.where(
                F.col("_first_ts").isNull()
                | (F.col(self.ts_col) < F.col("_first_ts"))
            ).drop("_first_ts")
        )

    # -- connectable / multicast [RX:share, RX:replay] (SURVEY §2.7) -------

    def share(self) -> "EventStream":
        """Multicast the chain so far [RX:share/publish+refCount].

        Rx ``share`` makes one upstream subscription feed every downstream
        subscriber; the Spark analogue is caching the materialized prefix —
        every downstream action reuses the cached partitions instead of
        recomputing the chain. MEMORY_AND_DISK (the ``cache()`` default):
        hot partitions serve from memory, cold spill to disk rather than
        being evicted into recomputation."""
        return self._wrap(self.df.cache())

    def replay(self, storage_level: str = "MEMORY_AND_DISK_DESER") -> "EventStream":
        """Persist with an explicit storage level [RX:replay].

        Rx ``replay`` buffers the emitted sequence for late subscribers;
        here the buffer is an explicit ``persist`` whose level the caller
        picks (e.g. DISK_ONLY for a 100 TB intermediate that must not
        occupy executor memory)."""
        from pyspark import StorageLevel

        return self._wrap(
            self.df.persist(getattr(StorageLevel, storage_level))
        )

    def unpersist(self) -> "EventStream":
        """Release the share/replay buffer (≡ connection teardown)."""
        return self._wrap(self.df.unpersist())

    # -- terminal [RX:reduce, RS:2.x subscribe] ----------------------------

    def reduce_sum(self, value_col: str) -> DataFrame:
        return self.df.groupBy(self.key).agg(
            F.round(
                F.sum(F.col(value_col).cast(DEC)).cast("double"), 4
            ).alias("total_" + value_col),
            F.count("*").alias("n"),
        )

    def to_df(self) -> DataFrame:
        return self.df
