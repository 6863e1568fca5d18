"""Durable-sink (retry/exactly-once) and format-surface tests."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from scala_reactivex_spark.sources import formats
from scala_reactivex_spark.sources.catalog import table
from scala_reactivex_spark.streaming import sinks, twins


@pytest.fixture(scope="module")
def stream_src2(spark, sf_dir, tmp_path_factory):
    src = tmp_path_factory.mktemp("events_sink_src")
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")
    return str(src)


def test_idempotent_sink_exactly_once(spark, stream_src2, tmp_path):
    """Drain → rerun with same checkpoint → byte-identical output, no
    duplicates: the retry(n)/effectively-once contract (RUNTIME.md)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sdf = twins.events_stream(spark, stream_src2).select(
        "event_id", "user_id", "ms"
    )
    sinks.run_with_idempotent_sink(sdf, out, ckpt)
    n_first = spark.read.parquet(out).count()
    files_first = sorted(glob.glob(f"{out}/**/*.parquet", recursive=True))

    # Restart with the SAME checkpoint: no new data → no reprocessing.
    sdf2 = twins.events_stream(spark, stream_src2).select(
        "event_id", "user_id", "ms"
    )
    sinks.run_with_idempotent_sink(sdf2, out, ckpt)
    n_second = spark.read.parquet(out).count()
    files_second = sorted(glob.glob(f"{out}/**/*.parquet", recursive=True))

    assert n_first == n_second > 0
    assert files_first == files_second
    # No duplicate events across batch dirs.
    dupes = (
        spark.read.parquet(out)
        .groupBy("event_id")
        .count()
        .where("count > 1")
        .count()
    )
    assert dupes == 0


def test_replayed_batch_skipped_via_marker(spark, stream_src2, tmp_path):
    """Simulate a replay: drop the checkpoint but keep the output — the
    _COMMITTED markers must prevent double-writes."""
    out = str(tmp_path / "out2")
    sdf = twins.events_stream(spark, stream_src2).select("event_id")
    sinks.run_with_idempotent_sink(sdf, out, str(tmp_path / "c1"))
    n = spark.read.parquet(out).count()
    # New checkpoint ⇒ Spark replays batch 0; marker must short-circuit.
    sinks.run_with_idempotent_sink(
        twins.events_stream(spark, stream_src2).select("event_id"),
        out,
        str(tmp_path / "c2"),
    )
    assert spark.read.parquet(out).count() == n


def test_csv_jsonl_roundtrip(spark, sf_dir, tmp_path):
    """CSV and JSON-lines writers/readers preserve values under explicit
    schemas (no inference pass)."""
    src = table(spark, sf_dir, "nation")
    schema = "n_nationkey INT, n_name STRING, n_regionkey INT"
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    formats.write_csv(src, csv_path)
    formats.write_jsonl(src, json_path)
    from_csv = formats.read_csv(spark, csv_path, schema)
    from_json = formats.read_jsonl(spark, json_path, schema)
    # read_csv appends the PERMISSIVE corrupt-record channel; clean data
    # leaves it all-null. (cache() first: Spark disallows queries that
    # touch ONLY the corrupt-record column on a raw CSV scan.)
    assert "_corrupt_record" in from_csv.columns
    from_csv = from_csv.cache()
    assert from_csv.where("_corrupt_record IS NOT NULL").count() == 0
    from_csv = from_csv.drop("_corrupt_record")
    assert from_csv.exceptAll(src).count() == 0
    assert src.exceptAll(from_csv).count() == 0
    assert from_json.exceptAll(src).count() == 0


def test_src_partition_prune_reads_only_matching_partitions(spark, sf_dir):
    """The graded pruning query must actually prune: the executed scan's
    input files all come from dom<=7 partition directories, and the plan
    carries PartitionFilters on the partition column."""
    import contextlib
    import io

    from scala_reactivex_spark.operators import creation

    path = creation._partitioned_events(spark, sf_dir)
    scan = spark.read.parquet(path).where(F.col("dom") <= 7)
    # Files ACTUALLY read at execution (input_file_name reflects pruning;
    # DataFrame.inputFiles() lists the pre-pruning index, so is useless here).
    read_files = [
        r[0] for r in scan.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files, "scan read no files"
    bad = [
        f
        for f in read_files
        if not any(f"/dom={d}/" in f for d in range(1, 8))
    ]
    assert not bad, f"read files outside dom<=7 partitions: {bad[:3]}"
    # And strictly fewer than the full 30-day layout.
    assert len(read_files) < len(scan.inputFiles())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain()
    assert "PartitionFilters" in buf.getvalue()


def test_csv_malformed_rows_land_in_corrupt_record(spark, tmp_path):
    """A row that can't parse under the declared schema must surface in
    _corrupt_record (in-band), not silently become an all-null row."""
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,x\nnot_an_int,y\n")
    out = formats.read_csv(spark, str(p), "a INT, b STRING").cache()
    bad = out.where("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1
    assert bad[0]["_corrupt_record"] == "not_an_int,y"


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    """Partitioned writes produce a layout whose scan prunes partitions
    (PartitionFilters in the plan — the 100 TB pruning path)."""
    import contextlib
    import io

    path = str(tmp_path / "events_by_type")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    formats.write_parquet_partitioned(ev, path, ["event_type"])
    scan = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    assert scan.count() == ev.where("event_type = 'purchase'").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    n_dirs = len(
        [d for d in os.listdir(path) if d.startswith("event_type=")]
    )
    assert n_dirs == 5


def test_events_ts_contract_across_fixture_generations(spark, tmp_path):
    """catalog.table('events') must yield identical (ts bigint-ns, ms, tsm)
    whether the parquet stores TIMESTAMP(NANOS) (read as bigint under
    nanosAsLong — the original fixture generation) or TIMESTAMP(MICROS)
    (read as timestamp_ntz — the round-6 generation)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scala_reactivex_spark.sources.catalog import table as cat_table

    ns_vals = [1704067200_000_000_000, 1704067201_500_000_000]
    cols = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([7, 8], pa.int64()),
        "event_type": pa.array(["click", "view"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(['{"k":1}', '{"k":2}']),
    }
    gens = {}
    for unit, div in (("ns", 1), ("us", 1000)):
        d = tmp_path / f"gen_{unit}"
        d.mkdir()
        t = pa.table(
            {
                "event_id": cols["event_id"],
                "ts": pa.array(
                    [v // div for v in ns_vals], pa.timestamp(unit)
                ),
                "user_id": cols["user_id"],
                "event_type": cols["event_type"],
                "value": cols["value"],
                "props": cols["props"],
            }
        )
        pq.write_table(t, str(d / "events.parquet"))
        df = cat_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "bigint"
        gens[unit] = sorted(
            (r.event_id, r.ts, r.ms, r.tsm) for r in df.collect()
        )
    assert gens["ns"] == gens["us"]
    assert [g[1] for g in gens["us"]] == ns_vals


def test_orderdate_contract_across_parquet_types(spark, tmp_path):
    """catalog.table('orders') pins o_orderdate to timestamp_ntz whether
    the parquet stores DATE, TIMESTAMP(MICROS, NTZ) or an instant
    TIMESTAMP — insurance against the next fixture-generation change
    (events.ts changed type in round 6)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from scala_reactivex_spark.sources.catalog import table as cat_table

    days = [datetime.date(1996, 1, 1), datetime.date(1997, 6, 15)]
    base = {
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_orderstatus": pa.array(["O", "F"]),
        "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW"]),
    }
    variants = {
        "date": pa.array(days, pa.date32()),
        "ts_ntz": pa.array(
            [datetime.datetime.combine(d, datetime.time()) for d in days],
            pa.timestamp("us"),
        ),
    }
    results = {}
    for tag, arr in variants.items():
        d = tmp_path / f"orders_{tag}"
        d.mkdir()
        t = pa.table({**base, "o_orderdate": arr})
        pq.write_table(t, str(d / "orders.parquet"))
        df = cat_table(spark, str(d), "orders")
        assert dict(df.dtypes)["o_orderdate"] == "timestamp_ntz"
        results[tag] = sorted(
            (r.o_orderkey, r.o_orderdate) for r in df.collect()
        )
    assert results["date"] == results["ts_ntz"]


def test_half_written_batch_overwritten_on_replay(spark, stream_src2, tmp_path):
    """Crash mid-write: a batch directory left with PARTIAL parquet and
    NO _COMMITTED marker must be fully overwritten on replay — the
    mode=overwrite half of the exactly-once contract (a marker-only
    check would leave the torn files in place)."""
    out = str(tmp_path / "out3")
    # Simulate the torn state a mid-write crash leaves behind: partial
    # data for batch 0, marker absent.
    torn = f"{out}/batch_id=0"
    spark.range(3).selectExpr(
        "id AS event_id"
    ).write.mode("overwrite").parquet(torn)
    assert not glob.glob(f"{torn}/_COMMITTED")

    sdf = twins.events_stream(spark, stream_src2).select("event_id")
    sinks.run_with_idempotent_sink(sdf, out, str(tmp_path / "c3"))

    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    want = {
        r["event_id"]
        for r in twins.events_stream(spark, stream_src2)
        .select("event_id")
        .sparkSession.read.parquet(stream_src2)
        .collect()
    }
    # The torn rows (0, 1, 2 from spark.range) must be GONE unless they
    # are genuine events; the committed output is exactly the source.
    assert got == want
    assert glob.glob(f"{torn}/_COMMITTED") or glob.glob(
        f"{out}/batch_id=*/_COMMITTED"
    )
