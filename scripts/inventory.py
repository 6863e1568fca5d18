#!/usr/bin/env python
"""Single-command inventory of the engine's graded surface.

Prints the authoritative counts cited in COVERAGE.md and commit
messages (r6 verdict "Next round" #6 — replace hand-counts, which
drifted, with one command):

    python scripts/inventory.py          # human-readable
    python scripts/inventory.py --json   # one JSON line

Counts:
  queries   — registered (name, fn) pairs in the plans registry
  oracles   — of those, how many declare a DuckDB oracle (rest are
              rows-only by design)
  twins     — ``def twin_*`` streaming twins in streaming/twins.py
  tests     — collected pytest items under tests/ (static AST count of
              ``test_*`` functions incl. parametrize expansion is NOT
              attempted; this is the raw function count, the number
              pytest prints as collected may be higher with params)
  driver_green — keys with an all-match row in any CORRECTNESS_r*.json
  driver_pending — registered keys never externally hash-green
"""

from __future__ import annotations

import ast
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ROOT = Path(__file__).resolve().parents[1]


def count_tests() -> int:
    n = 0
    for p in sorted((ROOT / "tests").glob("test_*.py")):
        tree = ast.parse(p.read_text())
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ) and node.name.startswith("test_"):
                n += 1
    return n


def count_twins() -> int:
    text = (ROOT / "scala_reactivex_spark/streaming/twins.py").read_text()
    return len(re.findall(r"^def twin_\w+", text, flags=re.M))


def main() -> None:
    from scala_reactivex_spark.plans.registry import (
        _externally_green,
        registry,
    )

    reg = registry()
    green = _externally_green()
    inv = {
        "queries": len(reg),
        "oracles": sum(1 for s in reg.values() if s.oracle),
        "rows_only": sum(1 for s in reg.values() if not s.oracle),
        "twins": count_twins(),
        "test_functions": count_tests(),
        "driver_green": sum(1 for n in reg if n in green),
        "driver_pending": sorted(n for n in reg if n not in green),
    }
    if "--json" in sys.argv:
        print(json.dumps(inv))
        return
    print(f"registered queries : {inv['queries']}")
    print(f"  with DuckDB oracle: {inv['oracles']}")
    print(f"  rows-only         : {inv['rows_only']}")
    print(f"streaming twins    : {inv['twins']}")
    print(f"test functions     : {inv['test_functions']}")
    print(f"driver hash-green  : {inv['driver_green']}")
    pend = inv["driver_pending"]
    print(f"driver-pending     : {len(pend)}")
    for n in pend:
        print(f"  - {n}")


if __name__ == "__main__":
    main()
