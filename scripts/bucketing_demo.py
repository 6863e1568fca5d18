#!/usr/bin/env python
"""Bucketed co-located join demo: prove the exchange-free join plan.

Scenario modeled: the recurring FACT-FACT join at 100 TB, where neither
side fits in a broadcast (autoBroadcastJoinThreshold=-1 forces the honest
sort-merge path that a 600 GB × 4 TB join would take). Both sides are
written bucketed+sorted by the join key; the bucketed scans then satisfy
the join's distribution requirement directly:

- bucketed:   SortMergeJoin over two bucketed scans — ZERO Exchange
              (and zero Sort, thanks to sortBy)
- control:    the same join over plain parquet — one Exchange + Sort per
              side

Evidence is appended to PLANS.md. Caveats this demo encodes (found the
hard way): at fixture scale the planner prefers broadcast and reports
"Bucketed: false (disabled by query planner)" — bucketing only pays when
broadcast is off the table, which is exactly the at-scale regime; and
bucket metadata lives in the session catalog (in-memory by default), so
both writes and the join happen in one session here.

    python scripts/bucketing_demo.py
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def main() -> int:
    from scala_reactivex_spark.functions.scale import (
        read_bucketed_join,
        write_bucketed,
    )
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("bucketing-demo", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # The at-scale regime: neither fact table broadcasts.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_key="o_orderkey")
    write_bucketed(
        lineitem, "lineitem_b", "l_orderkey", 8, sort_key="l_orderkey"
    )

    bucketed = read_bucketed_join(
        spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey"
    )
    control = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    )

    p_b = plan_of(bucketed)
    p_c = plan_of(control)
    nx_b = p_b.count("Exchange")
    nx_c = p_c.count("Exchange")
    bucketed_scans = p_b.count("Bucketed: true")
    n = bucketed.count()

    checks = [
        ("bucketed join has ZERO exchanges", nx_b == 0),
        ("control (plain parquet) join shuffles both sides", nx_c >= 2),
        ("both scans read bucketed", bucketed_scans == 2),
        ("join produces rows", n > 0),
    ]

    with open("PLANS.md", "a") as f:
        f.write(
            "\n## Bucketed co-located join (scripts/bucketing_demo.py)\n\n"
            "Fact-fact join with broadcast disabled (the 100 TB regime): "
            f"bucketed join exchanges = {nx_b}, control exchanges = {nx_c}, "
            f"bucketed scans = {bucketed_scans}, rows = {n}.\n\n"
            "Bucketed plan:\n```\n"
            + "\n".join(
                line
                for line in p_b.splitlines()
                if any(
                    k in line
                    for k in ("SortMergeJoin", "Exchange", "Sort ", "Bucketed")
                )
            )
            + "\n```\n\nControl plan (same join, plain parquet):\n```\n"
            + "\n".join(
                line
                for line in p_c.splitlines()
                if any(
                    k in line
                    for k in ("SortMergeJoin", "Exchange", "Sort ")
                )
            )
            + "\n```\n"
        )

    ok = True
    for desc, passed in checks:
        print(("PASS " if passed else "FAIL ") + desc)
        ok = ok and passed
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
