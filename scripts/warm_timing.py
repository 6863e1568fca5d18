#!/usr/bin/env python
"""Isolated warm-session timing for individual queries.

The bench headline interleaves 100+ queries in one cold session, and this
box's run-to-run variance is large (BASELINE.md; same-code headline has
ranged 41.8-50.0 s).  This script answers "is query X actually slow?" by
timing it ALONE in a warm session: one untimed warm-up run (JIT, codegen,
parquet footer cache), then N timed repeats, reporting min/median.

    SPARK_GRAFT_CPUS=32 python scripts/warm_timing.py llm_ann_ivf [q ...]
    # env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPS (3)

Prints one JSON line per query plus a summary JSON suitable for
committing next to BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: warm_timing.py QUERY [QUERY ...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "3"))

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("warm-timing")
    # Execute through the SAME sink bench.py times (noop, full pipeline,
    # no driver fetch).  The pre-round-13 default was .collect(), which
    # charged wide full-table projections for driver-side serialization
    # bench never pays — rel_scalar_battery arbitrated 1.09 s by collect
    # vs 0.60 s by noop (BASELINE.md round-13 entry), a false-positive
    # regression verdict waiting to happen.  SPARK_GRAFT_WARM_SINK=collect
    # restores the old semantics for queries where driver-fetch cost is
    # itself the question.
    sink = os.environ.get("SPARK_GRAFT_WARM_SINK", "noop")

    def run(df):
        if sink == "collect":
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()

    specs = registry()
    out = {}
    for name in names:
        fn = specs[name].fn
        run(fn(spark, sf_dir))  # warm-up, untimed
        times = []
        clear = os.environ.get("SPARK_GRAFT_CLEARCACHE", "1") == "1"
        for _ in range(reps):
            # A query that .persist()s would otherwise serve later reps
            # from the earlier rep's cache (Spark cache-matches on the
            # analyzed plan) — clear so every rep pays its own
            # materialization and the timing is honest.  CAVEAT: this
            # also drops the session-memoized shared index frames
            # (plans/memo.py), so for memoized queries this measures the
            # UNMEMOIZED worst case — and without the cache barrier the
            # optimizer may re-inline work the persist deliberately
            # blocks (e.g. the winnowing md5 chain), inflating reps far
            # beyond what bench.py's warm re-run (which keeps the cache,
            # matching driver behavior) reports.  Set
            # SPARK_GRAFT_CLEARCACHE=0 for bench-like warm semantics.
            if clear:
                spark.catalog.clearCache()
            t0 = time.time()
            run(fn(spark, sf_dir))
            times.append(round(time.time() - t0, 3))
        out[name] = {
            "warm_min": min(times),
            "warm_median": statistics.median(times),
            "reps": times,
        }
        print(json.dumps({name: out[name]}))
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
