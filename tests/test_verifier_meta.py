"""Meta-tests of the verification machinery itself: the gate must be able
to FAIL.  A verifier that cannot detect a wrong answer proves nothing, so
these tests feed table_hash deliberately corrupted results and require a
mismatch, plus sanity on the canonicalization rules the driver applies
(column-name ordering, row-order insensitivity, None/NaN/bool forms)."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "verify_local", Path(__file__).parents[1] / "scripts" / "verify_local.py"
)
_vl = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("verify_local", _vl)
_spec.loader.exec_module(_vl)


def test_table_hash_is_order_insensitive_but_value_sensitive():
    cols = ["b", "a"]
    rows = [(1, "x"), (2, "y")]
    h = _vl.table_hash(cols, rows)
    assert h == _vl.table_hash(cols, list(reversed(rows)))
    # Column ordering is by NAME: swapping names must change the hash
    # when values are asymmetric.
    assert h != _vl.table_hash(["a", "b"], rows)
    # Any single-cell corruption must change the hash.
    assert h != _vl.table_hash(cols, [(1, "x"), (2, "z")])
    assert h != _vl.table_hash(cols, [(1, "x")])


def test_norm_cell_distinguishes_the_tricky_values():
    n = _vl.norm_cell
    assert n(None) != n("None") != n(0)
    assert n(True) != n(1)
    assert n(float("nan")) == "nan"
    assert n(1.5) == repr(1.5)
    # -0.0 and 0.0 normalize differently ONLY if repr differs — document
    # the actual behavior so a future change is a conscious one.
    assert n(-0.0) == repr(-0.0)


def test_collect_capped_refuses_unbounded(spark):
    df = spark.range(0, 100)
    rows = _vl.collect_capped(df, cap=100)
    assert len(rows) == 100
    try:
        _vl.collect_capped(spark.range(0, 101), cap=100)
    except OverflowError:
        pass
    else:  # pragma: no cover
        raise AssertionError("cap must refuse oversized results")


def test_gate_detects_a_doctored_oracle(spark, sf_dir):
    """End-to-end negative control: run a real query against a WRONG
    oracle result and require the hash comparison to differ."""
    import duckdb

    from scala_reactivex_spark.plans.registry import registry

    spec = registry()["llm_dedup_exact"]
    sdf = spec.fn(spark, sf_dir)
    srows = _vl.collect_capped(sdf)
    scols = sdf.columns
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    good = con.execute(spec.oracle).fetchall()
    gcols = [d[0] for d in con.description]
    assert _vl.table_hash(scols, srows) == _vl.table_hash(gcols, good)
    doctored = con.execute(
        spec.oracle.replace("min(doc_id)", "min(doc_id) + 1")
    ).fetchall()
    assert _vl.table_hash(scols, srows) != _vl.table_hash(gcols, doctored)
