#!/usr/bin/env python
"""Isolated warm arbitration for the serving twins (round-11 verdict #1).

BASELINE.md's variance protocol says a single cold bench measurement of a
serving twin is not actionable; when BENCH_r{N} shows a twin's p50 above
its TWIN_BASELINE pin, THIS script is the arbitration step: it drains the
flagged twin(s) alone in a fresh session with more reps than bench.py's
default 2, so the warm p50 (reps 2..N, rep 1 pays the static index build)
carries enough samples to call noise vs regression.

    SPARK_GRAFT_CPUS=32 python scripts/twin_warm_probe.py \
        twin_hybrid_rrf twin_dedup_gate
    # env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPS (4)

Prints one JSON line per twin plus a summary comparing against the
bench.py TWIN_BASELINE_P50_MS pins; paste the verdict into BASELINE.md
(the op_scan_running_sum r10 arbitration entry is the template).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, ".")


def main() -> int:
    names = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))

    from bench import TWIN_BASELINE_P50_MS
    from scala_reactivex_spark.session import get_spark
    from scala_reactivex_spark.streaming.latency import (
        measure_serving_latency,
    )

    # Probe-able = every twin the latency harness measures (the shared
    # DEFAULT_TWINS list), pinned or not: unpinned twins (the post-r9
    # additions reporting through twin_worst_p50_ms) need isolated
    # arbitration too — the r14 twin_nb_filter retrain fix is verified
    # exactly this way.
    from scala_reactivex_spark.streaming.latency import DEFAULT_TWINS

    measurable = set(DEFAULT_TWINS)
    if not names:
        names = set(TWIN_BASELINE_P50_MS)
    unknown = names - measurable
    if unknown:
        print(f"unknown twins: {sorted(unknown)}", file=sys.stderr)
        return 2

    spark = get_spark("twin-warm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = measure_serving_latency(
        spark,
        sf_dir,
        tempfile.mkdtemp(prefix="twin_warm_probe_"),
        reps=reps,
        only=names,
    )
    summary = {}
    for name, m in sorted(out.items()):
        pin = TWIN_BASELINE_P50_MS.get(name)
        p50 = m["p50_trigger_ms"]
        summary[name] = {
            **m,
            "pin_ms": pin,
            "vs_pin": (
                round(p50 / pin, 3)
                if p50 is not None and pin is not None
                else None
            ),
            "reps": reps,
        }
        print(json.dumps({name: summary[name]}, sort_keys=True))
    print(json.dumps({"twin_warm_probe": summary, "sf_dir": sf_dir},
                     sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
