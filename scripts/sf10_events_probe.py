#!/usr/bin/env python
"""Second-decade scale probe for the EVENTS family (fourth sf10 batch).

The sf1/sf10 probes scaled documents, embeddings, and the TPC-H facts;
the events-based ordered-state family (windows, debounce, funnel,
retention, concurrency) had only the analytic per-key argument in
SCALING.md — never a measured point.  This script builds TWO scaled
events fixtures and times the family across one decade of growth at
second-decade absolute size:

  - ev_sf1  = events ×10   (1M rows,  15k users)
  - ev_sf10 = events ×100  (10M rows, 150k users)

Growth model: copy i shifts ``user_id += i·10_000`` and ``event_id +=
i·10_000_000`` with ``ts`` unchanged — the time span is fixed and the
USER COUNT grows, so per-key history depth stays constant while key
cardinality rises 100×.  That is the production growth shape for
per-key ordered state (more entities, not deeper histories): window
partitions multiply, none deepens, and any hidden corpus-global term
(a single-partition window, a driver-side sort) shows up as a
super-linear ratio immediately.

    SPARK_GRAFT_CPUS=32 python scripts/sf10_events_probe.py
    # env: SPARK_GRAFT_SF01 (default /root/testdata/sf0.1),
    #      SPARK_GRAFT_PROBE (comma-separated override)

Output: one JSON line per query {name, sf1_sec, sf10_sec, ratio,
vs_linear=ratio/10} plus a summary line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

EV_SF1_DIR = "/tmp/sf10_probe_ev1"
EV_SF10_DIR = "/tmp/sf10_probe_ev10"
DECADE = 10

#: Events-family probe set: per-user running state, the three window
#: geometries, rate limiting, and the three events-table analytics
#: rollups.
PROBE = (
    "op_scan_running_sum",
    "op_window_tumbling",
    "op_window_sliding",
    "op_window_session",
    "op_debounce",
    "rel_funnel",
    "rel_retention",
    "rel_concurrency",
)


def build_events_fixture(sf01: str, out_dir: str, copies: int) -> None:
    """events ×copies with disjoint user/event id ranges, ts unchanged;
    every other table copied as-is (dimension-stable growth)."""
    import duckdb

    out = Path(out_dir)
    if (out / "_DONE").exists():
        return
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    con = duckdb.connect()
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "documents",
        "embeddings",
    ):
        con.sql(
            f"COPY (SELECT * FROM '{sf01}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    union = " UNION ALL ".join(
        f"""SELECT event_id + {i * 10_000_000} AS event_id, ts,
               user_id + {i * 10_000} AS user_id, event_type, value, props
            FROM '{sf01}/events.parquet'"""
        for i in range(copies)
    )
    con.sql(f"COPY ({union}) TO '{out}/events.parquet' (FORMAT PARQUET)")
    (out / "_DONE").touch()


def main() -> None:
    sf01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    probe = tuple(
        n for n in os.environ.get("SPARK_GRAFT_PROBE", "").split(",") if n
    ) or PROBE

    build_events_fixture(sf01, EV_SF1_DIR, 10)
    build_events_fixture(sf01, EV_SF10_DIR, 100)

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("sf10-events-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # Warm the JVM once at each scale before timing.
    run("op_reduce", EV_SF1_DIR)
    run("op_reduce", EV_SF10_DIR)

    rows = []
    for name in probe:
        t_sf1 = run(name, EV_SF1_DIR)
        t_sf10 = run(name, EV_SF10_DIR)
        ratio = round(t_sf10 / t_sf1, 2) if t_sf1 > 0 else None
        row = {
            "query": name,
            "sf1_sec": t_sf1,
            "sf10_sec": t_sf10,
            "ratio": ratio,
            "vs_linear": round(ratio / DECADE, 2) if ratio else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "metric": "sf10_events_probe",
                "decade": DECADE,
                "worst_vs_linear": max(
                    (
                        r["vs_linear"]
                        for r in rows
                        if r["vs_linear"] is not None
                    ),
                    default=None,
                ),
                "rows": rows,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
