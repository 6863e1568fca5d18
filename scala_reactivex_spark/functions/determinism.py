"""Determinism helpers shared by every query (SURVEY.md §2.11).

The driver compares Spark output against a DuckDB oracle with an
order-insensitive VALUE hash, so floating-point results must be bit-stable
across engines AND across Spark's own partial-aggregation orders.

The one real hazard is SUM/AVG over doubles: Spark combines partial sums in
partition order (nondeterministic), DuckDB sums in scan order — over 10k+
rows the accumulated FP error (~ulp·√n) is larger than the 1e-4 grid that
``ROUND(x, 4)`` snaps to, so raw double sums WILL hash-mismatch.  Fix: cast
each element to ``DECIMAL(38,6)`` first.  Decimal addition is exact and
associative, so any combine order yields the identical sum; both engines then
round the identical value.  Per-element expressions (products, ratios) stay
in double — IEEE ops on identical inputs are identical in both engines.

Cost at scale: decimal aggregation is a constant-factor overhead inside
whole-stage codegen (no extra shuffle, map-side partial aggregation intact) —
the right price for cross-engine reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for any fixture sum (values ≤ 1e6, rows ≤ 1e9).
DEC = "decimal(38,6)"
#: Output rounding for every computed float (SURVEY.md §2.11.1).
ROUND = 4


def r4(col: Column | str) -> Column:
    """Round a computed double to the canonical 4 decimals."""
    return F.round(F.col(col) if isinstance(col, str) else col, ROUND)


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a double column, rounded to 4 dp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), ROUND)


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum ÷ count, rounded to 4 dp.

    Built from sum/count (not engine AVG) so both engines divide the same
    two deterministic numbers in double precision.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), ROUND)


def rmin(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.min(c), ROUND)


def rmax(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.max(c), ROUND)


# --- DuckDB-side SQL fragments (kept adjacent so the two stay in sync) ---

def sql_dsum(expr: str) -> str:
    """Oracle fragment matching :func:`dsum` exactly."""
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE), 4)"


def sql_davg(expr: str) -> str:
    """Oracle fragment matching :func:`davg` exactly."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr}), 4)"
    )
