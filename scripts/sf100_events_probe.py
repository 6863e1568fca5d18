#!/usr/bin/env python
"""Third-decade scale probe for the EVENTS family: ev_sf10 (10M rows,
150k users) → ev_sf100 (100M rows, 1.5M users).

Extends scripts/sf10_events_probe.py's two measured decades with a
third at 1000× the sf0.1 fixture.  Growth model unchanged — the time
span is FIXED and the user count grows, so per-key history depth stays
constant while key cardinality rises 1000×: the production growth
shape for per-key ordered state.  The fixture is built ×10 from the
ev_sf10 fixture (disjoint user/event id ranges, ts unchanged), so no
1000-term UNION is needed.

    SPARK_GRAFT_CPUS=32 python scripts/sf100_events_probe.py
    # env: SPARK_GRAFT_SF01 (default /root/testdata/sf0.1),
    #      SPARK_GRAFT_PROBE (comma-separated override)

Output: one JSON line per query {name, sf10_sec, sf100_sec, ratio,
vs_linear=ratio/10} plus a summary line; paste into SCALING.md.
Queries are measured standalone-cold (session memos cleared between
measurements) with identical confs at both scales.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

EV_SF100_DIR = "/tmp/sf100_probe_ev"
OUTER_COPIES = 10  # on top of the ev_sf10 fixture
DECADE = 10

#: The per-key ordered core plus the window geometries and two
#: events-table analytics rollups — the same families the first two
#: decades measured.
PROBE = (
    "op_map",
    "op_scan_running_sum",
    "op_pairwise",
    "op_distinct_until_changed",
    "op_debounce",
    "op_window_tumbling",
    "op_window_session",
    "rel_funnel",
    "rel_retention",
)


def build_fixture(ev_sf10_dir: str) -> None:
    """events ×10 from ev_sf10 with disjoint user/event id ranges, ts
    unchanged; dimension tables copied as-is."""
    import duckdb

    out = Path(EV_SF100_DIR)
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
            f"COPY (SELECT * FROM '{ev_sf10_dir}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    union = " UNION ALL ".join(
        f"""SELECT event_id + {j * 1_000_000_000} AS event_id, ts,
               user_id + {j * 2_000_000} AS user_id, event_type, value,
               props
            FROM '{ev_sf10_dir}/events.parquet'"""
        for j in range(OUTER_COPIES)
    )
    con.sql(f"COPY ({union}) TO '{out}/events.parquet' (FORMAT PARQUET)")
    (out / "_DONE").touch()


def main() -> None:
    sf01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "128")
    probe = tuple(
        n for n in os.environ.get("SPARK_GRAFT_PROBE", "").split(",") if n
    ) or PROBE

    from scripts import sf10_events_probe

    sf10_events_probe.build_events_fixture(
        sf01, sf10_events_probe.EV_SF10_DIR, 100
    )
    build_fixture(sf10_events_probe.EV_SF10_DIR)

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("sf100-events-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    def release() -> None:
        import gc

        from scala_reactivex_spark.plans.memo import clear_session_memo

        clear_session_memo()
        gc.collect()
        spark._jvm.System.gc()

    run("op_filter", sf10_events_probe.EV_SF10_DIR)
    run("op_filter", EV_SF100_DIR)

    rows = []
    for name in probe:
        t_sf10 = run(name, sf10_events_probe.EV_SF10_DIR)
        release()
        t_sf100 = run(name, EV_SF100_DIR)
        release()
        ratio = round(t_sf100 / t_sf10, 2) if t_sf10 > 0 else None
        row = {
            "query": name,
            "sf10_sec": t_sf10,
            "sf100_sec": t_sf100,
            "ratio": ratio,
            "vs_linear": round(ratio / DECADE, 2) if ratio else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "metric": "sf100_events_probe",
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
