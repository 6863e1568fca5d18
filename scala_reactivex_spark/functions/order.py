"""Shared event-time window orders (SURVEY.md §2.11.4).

Lazy factories (Column construction needs an active SparkContext, so these
cannot be module-level constants): every positional/stateful operator orders
by the TOTAL order ``(ts, event_id)`` — never ``ts`` alone, since timestamp
collisions are possible at scale.
"""

from __future__ import annotations

from pyspark.sql import Window, WindowSpec
from pyspark.sql import functions as F


def w_user() -> WindowSpec:
    """Per-user event-time order — the reference's per-stream total order."""
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def w_user_desc() -> WindowSpec:
    return Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )


def w_running() -> WindowSpec:
    """Running frame: everything seen so far, inclusive — scan/fold state."""
    return w_user().rowsBetween(Window.unboundedPreceding, Window.currentRow)
