"""src_zorder_read: the z-clustered layout must PRUNE, losslessly.

Three laws close the loop the src_zorder_layout audit opens (r13 verdict
#6): (1) the bucket intersection list is COMPLETE — every (u8, d8) inside
the probe box Morton-encodes into a kept bucket, so the partition filter
is a superset of the exact predicate and can never drop a matching row;
(2) the executed scan reads files ONLY from kept z-bucket directories and
strictly fewer than the full layout (real file skipping, not just a plan
annotation); (3) the plan carries PartitionFilters on zbucket.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from scala_reactivex_spark.operators import creation


def _interleave(u: int, d: int) -> int:
    z = 0
    for i in range(creation.Z_BITS):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((d >> i) & 1) << (2 * i)
    return z


def test_zread_bucket_list_is_complete_and_proper():
    lo, hi = creation.ZREAD_BOX
    keep = set(creation._zread_buckets())
    cell = 65536 // creation.Z_BUCKETS
    for u in range(lo, hi + 1):
        for d in range(lo, hi + 1):
            assert _interleave(u, d) // cell in keep, (u, d)
    # ... and a REAL prune: a proper subset of the bucket space.
    assert 0 < len(keep) < creation.Z_BUCKETS
    assert keep == {3, 6, 7, 9, 11, 12, 13, 14, 15, 18, 24, 26, 33, 36, 37, 48}


def test_zorder_read_scans_only_intersecting_buckets(spark, sf_dir):
    path = creation._zordered_events(spark, sf_dir)
    keep = set(creation._zread_buckets())
    lo, hi = creation.ZREAD_BOX
    scan = (
        spark.read.parquet(path)
        .where(F.col("zbucket").isin(list(keep)))
        .where(F.col("u8").between(lo, hi) & F.col("d8").between(lo, hi))
    )
    read_files = [
        r[0] for r in scan.select(F.input_file_name()).distinct().collect()
    ]
    assert read_files, "scan read no files"
    bad = [
        f
        for f in read_files
        if not any(f"/zbucket={b}/" in f for b in keep)
    ]
    assert not bad, f"read files outside kept z-buckets: {bad[:3]}"
    assert len(read_files) < len(spark.read.parquet(path).inputFiles())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain()
    assert "PartitionFilters" in buf.getvalue()


def test_zorder_read_prune_is_lossless(spark, sf_dir):
    """Dropping the bucket pre-filter must not change the result — the
    partition prune is pure I/O savings, never semantics."""
    lo, hi = creation.ZREAD_BOX
    pruned = creation.src_zorder_read(spark, sf_dir)
    full = (
        spark.read.parquet(creation._zordered_events(spark, sf_dir))
        .where(F.col("u8").between(lo, hi) & F.col("d8").between(lo, hi))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    got = {r["event_type"]: r["n_events"] for r in pruned.collect()}
    want = {r["event_type"]: r["n_events"] for r in full.collect()}
    assert got == want


def test_zorder_compare_pins_the_layout_claim(spark, sf_dir):
    """The graded comparison table must actually show the decision: the
    single-column sort skips NOTHING for a second-column-only probe
    (its buckets are full-width stripes in d), while z-order skips a
    positive share on EVERY probe shape — the reason a two-hot-column
    table z-orders instead of sorting."""
    rows = {
        (r["layout"], r["probe"]): r
        for r in creation.src_zorder_compare(spark, sf_dir).collect()
    }
    assert rows[("usort", "d_quarter")]["n_skippable"] == 0
    for probe in ("u_quarter", "d_quarter", "both"):
        assert rows[("zorder", probe)]["n_skippable"] > 0, probe
    # And on the box probe, z-order must skip at least as much as the
    # single-column layout (it strictly dominates on this geometry).
    assert (
        rows[("zorder", "both")]["n_skippable"]
        >= rows[("usort", "both")]["n_skippable"]
    )
