#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r18/<q>_<tag>.txt.

Explain-only (no execution) so before-plans can be captured at the
pre-round commit state without paying a bench pass.

    python scripts/plan_dump_r18.py --tag before query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("plan_dump_r18")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    os.makedirs("plans/r18", exist_ok=True)
    for name in args.queries:
        df = specs[name].fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = f"plans/r18/{name}_{args.tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
