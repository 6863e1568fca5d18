#!/usr/bin/env python
"""Round-17 optimization profiler.

For each named query (or the top-N by BENCH_DETAIL cold time), run it
through the noop sink REPS times on the bench fixture, record
cold/warm times, and dump `.explain("formatted")` to plans/r18/.
Also counts plan features the optimization guide cares about
(Exchange nodes, join strategies, Python eval nodes, scan pushdown).

    python scripts/profile_r18.py [--reps 3] [--sf DIR] [--tag before] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, ".")


def plan_summary(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "windows": len(re.findall(r"\bWindow\b", plan)),
        "wholestage": len(re.findall(r"WholeStageCodegen", plan)),
        "aggregates": len(re.findall(r"HashAggregate|ObjectHashAggregate|SortAggregate", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--top", type=int, default=0, help="profile top-N by BENCH_DETAIL cold time")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("profile_r18")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    names = list(args.queries)
    if args.top:
        detail = json.load(open("BENCH_DETAIL.json"))
        ranked = sorted(detail["queries"], key=detail["queries"].get, reverse=True)
        names.extend(n for n in ranked if n in specs)
        names = names[: args.top + len(args.queries)]
    assert names, "no queries to profile"

    os.makedirs("plans/r18", exist_ok=True)
    # warm the session once
    specs["rel_q1_pricing"].fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = specs[name].fn
        spark.sparkContext.setJobDescription(f"r18-profile:{name}")
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r18/{name}_{args.tag}.txt", "w") as f:
            f.write(plan)
        summ = plan_summary(plan)
        results[name] = {"times": reps, "plan": summ}
        print(f"{name}: {reps} {summ}", flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(f"/tmp/profile_r18_{args.tag}.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
