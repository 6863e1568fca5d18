#!/usr/bin/env python
"""Third-decade scale probe for the RELATIONAL substrate: TPC-H shapes
at lineitem ×1000 (600M rows, ~11 GB parquet).

Extends the round-9 sf1→sf10 TPC-H campaign (all 22 shapes sub-linear
at 60M rows) with a third decade for the flagship shapes.  Growth
model unchanged (scripts/sf10_probe.build_fixture_rel): facts grow
×10 from the sf10 fixture with disjoint orderkey ranges (keys are
BIGINT; max ≈ 10^10), dimensions stay fixed — per-entity density rises
1000× vs sf0.1, the conservative shape for dimension-keyed group-bys.

    SPARK_GRAFT_CPUS=32 python scripts/sf100_rel_probe.py
    # env: SPARK_GRAFT_SF01 (default /root/testdata/sf0.1),
    #      SPARK_GRAFT_PROBE (comma-separated override)

Output: one JSON line per query {name, sf10_sec, sf100_sec, ratio,
vs_linear=ratio/10} plus a summary; paste into SCALING.md.  Queries
run standalone-cold with shuffle spill released between measurements
(the heaviest join shapes move tens of GB at this scale; the probe
orders them lightest-first so a disk ceiling loses the least
evidence)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

SF100_REL_DIR = "/tmp/sf100_probe_rel"
OUTER_COPIES = 10  # on top of the sf10 relational fixture
DECADE = 10

#: Flagship shapes, lightest first: scan-agg, distribution outer join,
#: join+top-k, group-having+join, and the 6-way join DAG last.
PROBE = (
    "rel_q1_pricing",
    "rel_q13_custdist",
    "rel_q3_shipping",
    "rel_q18_large_orders",
    "rel_q9_profit",
)


def build_fixture(sf10_dir: str) -> None:
    import duckdb

    out = Path(SF100_REL_DIR)
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
        "events",
        "documents",
        "embeddings",
    ):
        con.sql(
            f"COPY (SELECT * FROM '{sf10_dir}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        union = " UNION ALL ".join(
            f"""SELECT * REPLACE ({key} + {j * 1_000_000_000} AS {key})
                FROM '{sf10_dir}/{t}.parquet'"""
            for j in range(OUTER_COPIES)
        )
        con.sql(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    (out / "_DONE").touch()


def main() -> None:
    sf01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "128")
    probe = tuple(
        n for n in os.environ.get("SPARK_GRAFT_PROBE", "").split(",") if n
    ) or PROBE

    from scripts import sf10_probe

    sf10_probe.build_fixture(sf01)
    sf10_probe.build_fixture_rel(sf01)
    build_fixture(sf10_probe.SF10_DIR)

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("sf100-rel-probe")
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

    run("rel_topk", sf10_probe.SF10_DIR)
    run("rel_topk", SF100_REL_DIR)

    rows = []
    for name in probe:
        t_sf10 = run(name, sf10_probe.SF10_DIR)
        release()
        t_sf100 = run(name, SF100_REL_DIR)
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
                "metric": "sf100_rel_probe",
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
