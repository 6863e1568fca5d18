#!/usr/bin/env python
"""ADAPTIVE_TARGET_LOAD sweep at sf10 (round-11 verdict #3).

The corpus-adaptive sign-LSH (llm_dedup_embed_lsh_adaptive) sizes its
bucket space from one constant: expected vectors per bucket
(``ADAPTIVE_TARGET_LOAD`` — candidate volume ~ N x load/2 x bands for a
self-join).  Round 11 shipped it at 2 with a comment explaining the
choice; this sweep makes the constant a MEASURED knob: for load in
(1, 2, 4) it times the full adaptive pipeline at sf10 (200k vectors)
and records the chosen rows-per-band, the verified pair count, and the
wall time, so SCALING.md documents what the load constant buys and
costs.  The verified-pair superset property (lower load → bigger bucket
space → same-or-fewer candidates; higher load → more) shows up directly
in the pair counts.

    SPARK_GRAFT_CPUS=32 python scripts/adaptive_load_sweep.py
    # env: SWEEP_SF_DIR (default /tmp/sf10_probe), LOADS (default 1,2,4)

One JSON line per load + a summary line; paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/tmp/sf10_probe")
    loads = [
        int(x)
        for x in os.environ.get("LOADS", "1,2,4").split(",")
        if x.strip()
    ]
    if not os.path.isdir(sf_dir):
        print(f"fixture missing: {sf_dir} (run scripts/sf10_probe.py)",
              file=sys.stderr)
        return 2

    from scala_reactivex_spark.operators import llm_dedup as dd
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("adaptive-load-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    n_vec = dd.table(spark, sf_dir, "embeddings").count()
    results = []
    default_load = dd.ADAPTIVE_TARGET_LOAD
    try:
        for load in loads:
            # The knob under test: module constant, read by
            # adaptive_lsh_rows at query-build time.
            dd.ADAPTIVE_TARGET_LOAD = load
            r = dd.adaptive_lsh_rows(n_vec)
            t0 = time.perf_counter()
            df = dd.llm_dedup_embed_lsh_adaptive(spark, sf_dir).persist()
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 2)
            # Count from the persisted result — a bare recount would
            # re-run the whole banding + verify pipeline per load point
            # (round-12 review).
            pairs = df.count()
            df.unpersist()
            rec = {
                "load": load,
                "rows_per_band": r,
                "bucket_space": 1 << r,
                "pairs": pairs,
                "wall_sec": wall,
                "n_vectors": n_vec,
            }
            results.append(rec)
            print(json.dumps(rec, sort_keys=True))
    finally:
        dd.ADAPTIVE_TARGET_LOAD = default_load
    print(json.dumps({"adaptive_load_sweep": results, "sf_dir": sf_dir},
                     sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
