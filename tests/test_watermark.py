"""Late-data semantics: watermarks actually drop late rows (SURVEY.md §2.8).

Two micro-batches: batch 1 carries the stream far ahead; batch 2 arrives
entirely BEHIND the watermark. In append mode with a 1-hour watermark the
late batch must not resurrect closed windows — the reference's arrival-
order assumption enforced as event-time policy.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scala_reactivex_spark.streaming import twins

NS_HOUR = 3_600 * 10**9
DAY0 = 1_704_067_200 * 10**9  # 2024-01-01 UTC in ns


def _write_events(path, rows):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, path, version="2.6")


@pytest.fixture()
def late_src(tmp_path):
    src = tmp_path / "late_src"
    src.mkdir()
    # Four micro-batches (mtime-ordered; maxFilesPerTrigger=1):
    #  a: day0 event + day5 event   → watermark advances to day5-1h
    #  b: day6 event                → day0 window (end day1) finalized:
    #                                 EMITTED with n=1 and evicted
    #  c: LATE day0 event           → behind the watermark: must be dropped
    #  d: day7 event                → one more watermark advance: if the
    #                                 late row had sneaked into state, the
    #                                 day0 window would be emitted a SECOND
    #                                 time here — the detectable failure
    _write_events(
        str(src / "a.parquet"),
        [
            (0, DAY0 + NS_HOUR, 1, "click", 1.0),
            (1, DAY0 + 5 * 24 * NS_HOUR, 1, "click", 1.0),
        ],
    )
    _write_events(
        str(src / "b.parquet"),
        [(3, DAY0 + 6 * 24 * NS_HOUR, 1, "click", 1.0)],
    )
    _write_events(
        str(src / "c.parquet"),
        [(2, DAY0 + 2 * NS_HOUR, 1, "click", 1.0)],
    )
    _write_events(
        str(src / "d.parquet"),
        [(4, DAY0 + 7 * 24 * NS_HOUR, 1, "click", 1.0)],
    )
    import os
    import time

    now = time.time()
    for i, name in enumerate(["a", "b", "c", "d"]):
        t = now - 240 + i * 60
        os.utime(src / f"{name}.parquet", (t, t))
    return str(src)


def test_watermark_drops_late_rows(spark, late_src, tmp_path):
    sdf = twins.events_stream(spark, late_src)
    out = twins.run_stream_to_table(
        twins.twin_tumbling(sdf),
        "t_late",
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    day0_ms = DAY0 // 10**6
    day0_rows = [r for r in out.collect() for _ in [0] if r.bucket_ms == day0_ms]
    # Exactly ONE emission of the day-0 window, with only the on-time
    # event: the late row was dropped, not merged (n=2) and the closed
    # window was not re-emitted (a second day-0 row).
    assert len(day0_rows) == 1
    assert day0_rows[0].n == 1


def test_late_rows_kept_without_watermark(spark, late_src, tmp_path):
    """Control: in complete mode (no append finalization) the same input
    merges the late event — proving the drop above is the watermark's
    doing, not data loss in the source."""
    sdf = twins.events_stream(spark, late_src)
    out = twins.run_stream_to_table(
        twins.twin_tumbling(sdf),
        "t_late_c",
        str(tmp_path / "ckpt_c"),
        output_mode="complete",
    )
    day0_ms = DAY0 // 10**6
    rows = {(r.bucket_ms, r.n) for r in out.collect()}
    assert (day0_ms, 2) in rows
