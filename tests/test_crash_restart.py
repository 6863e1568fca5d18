"""Crash-restart probes for the STATEFUL streaming ingest gates.

The ANN serving twins already have checkpoint-restart replay probes
(tests/test_extras.py, round 8).  These extend the same torn-write
protocol to the two stateful gates the round-9 verdict flagged as
claimed-by-construction-only:

- ``twin_budget_gate``: the applyInPandasWithState token counter must
  RESUME from the checkpointed state store — a restart that reset the
  marginal band's cumulative spend to 0 would over-admit (the exact
  failure the probe's overshoot assertion detects).
- ``twin_dedup_incremental``: the pair-dedup state and the source
  offsets must survive: after a crash that tears the in-flight batch,
  the committed output equals the batch reference with NO duplicate and
  NO lost match row.

Protocol per twin (the twin_cdc_upsert / ANN pattern): drain tranche A
through the idempotent sink, simulate a crash that half-wrote the NEXT
batch (partial parquet, no _COMMITTED marker), deliver tranche B,
restart on the SAME checkpoint, then assert the union of committed
batches equals the batch operator over A+B.
"""

from __future__ import annotations

import glob
import os
import time

import pyspark.sql.functions as F

from scala_reactivex_spark.streaming import twins
from scala_reactivex_spark.streaming.sinks import run_with_idempotent_sink


def _committed_rows(spark, out_dir: str):
    """Union of all durably committed batches (marker present)."""
    dirs = [
        os.path.dirname(m)
        for m in glob.glob(f"{out_dir}/batch_id=*/_COMMITTED")
    ]
    assert dirs, "no committed batches"
    df = spark.read.parquet(*dirs)
    return df


def _two_tranches(spark, df, src: str, key: str):
    """Write df as two parity-split parquet tranches; tranche B is NOT
    written yet — returns a closure that delivers it later (mtime-stamped
    after tranche A so the file source replays them in order)."""
    a = df.where(F.col(key) % 2 == 0)
    b = df.where(F.col(key) % 2 == 1)
    a.coalesce(1).write.mode("overwrite").parquet(src)
    base = time.time()
    for name in os.listdir(src):
        if name.endswith(".parquet"):
            os.utime(os.path.join(src, name), (base, base))

    def deliver_b():
        before = set(os.listdir(src))
        b.coalesce(1).write.mode("append").parquet(src)
        for name in set(os.listdir(src)) - before:
            if name.endswith(".parquet"):
                p = os.path.join(src, name)
                os.utime(p, (base + 30, base + 30))

    return deliver_b


def _tear_next_batch(spark, out_dir: str, schema_sql: str):
    """Simulate a crash mid-write of the next batch: schema-compatible
    garbage under its directory, marker absent."""
    committed = glob.glob(f"{out_dir}/batch_id=*/_COMMITTED")
    next_id = 1 + max(
        int(os.path.basename(os.path.dirname(m)).split("=")[1])
        for m in committed
    )
    torn = f"{out_dir}/batch_id={next_id}"
    spark.range(3).selectExpr(*schema_sql.split("|")).write.mode(
        "overwrite"
    ).parquet(torn)
    assert not glob.glob(f"{torn}/_COMMITTED")
    return torn


def test_budget_gate_crash_restart_no_dup_no_loss(spark, sf_dir, tmp_path):
    """Kill-mid-batch + restart for the token-budget gate with the
    GRADED plan: committed decisions over both tranches cover every
    incoming doc exactly once (no dup, no loss), match the batch
    reference on the deterministic band/out slices, and the torn batch's
    garbage is purged by the replay."""
    from scala_reactivex_spark.operators.llm_compose import (
        llm_budget_select,
    )
    from scala_reactivex_spark.sources.catalog import table

    gate = twins.budget_gate_plan(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_src")
    deliver_b = _two_tranches(spark, docs, src, "doc_id")
    out_dir = str(tmp_path / "gate_out")
    ckpt = str(tmp_path / "gate_ckpt")

    run_with_idempotent_sink(
        twins.twin_budget_gate(twins.docs_stream(spark, src), gate),
        out_dir,
        ckpt,
    )
    assert glob.glob(f"{out_dir}/batch_id=*/_COMMITTED")
    _tear_next_batch(
        spark,
        out_dir,
        "CAST(id + 900000 AS BIGINT) AS doc_id|CAST(0 AS BIGINT) AS band"
        "|CAST(0 AS BIGINT) AS n_tok|CAST(1 AS INT) AS keep"
        "|'torn' AS reason",
    )

    deliver_b()
    run_with_idempotent_sink(
        twins.twin_budget_gate(twins.docs_stream(spark, src), gate),
        out_dir,
        ckpt,
    )

    got = {r["doc_id"]: r for r in _committed_rows(spark, out_dir).collect()}
    # Torn garbage purged (overwritten by the replayed real batch).
    assert not any(d >= 900000 for d in got)
    batch = llm_budget_select(spark, sf_dir).collect()
    # No loss, no duplicates: one decision per incoming doc.
    assert len(got) == len(batch)
    for b in batch:
        s = got[b["doc_id"]]
        assert s["band"] == b["band"] and s["n_tok"] == b["n_tok"]
        if b["reason"] in ("band", "out") and s["reason"] != "marginal":
            assert (s["keep"], s["reason"]) == (b["keep"], b["reason"])


def test_budget_gate_crash_restart_counter_state_resumes(
    spark, sf_dir, tmp_path
):
    """THE stateful assertion: the applyInPandasWithState token counter
    must resume from the checkpointed state store across a crash.

    The graded sf0.001 budget lands exactly on a band edge (no
    straddling band), so this probe DOCTORS the plan's budget to cut the
    biggest band at 2/3 of its tokens — guaranteeing marginal docs, with
    both parity tranches contributing some.  After tranche A drains, the
    job dies and restarts on the same checkpoint for tranche B; if the
    counter restarted at 0, tranche B would admit up to a full second
    remainder and the cumulative marginal spend would overshoot — the
    <= rem assertion fails.  Prefix-greedy tightness (within one maximal
    doc) is asserted too, so an over-conservative resume (dropping all
    of tranche B) also fails."""
    gate = twins.budget_gate_plan(spark, sf_dir)
    rows = gate.collect()
    target = max(rows, key=lambda r: r["btok"])
    assert target["btok"] >= 3, "fixture band too small to straddle"
    b_new = target["above"] + (target["btok"] * 2) // 3
    doctored = gate.select(
        "band", "btok", "above", F.lit(b_new).cast("bigint").alias("b")
    )

    from scala_reactivex_spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_src_m")
    deliver_b = _two_tranches(spark, docs, src, "doc_id")
    out_dir = str(tmp_path / "gate_out_m")
    ckpt = str(tmp_path / "gate_ckpt_m")

    run_with_idempotent_sink(
        twins.twin_budget_gate(twins.docs_stream(spark, src), doctored),
        out_dir,
        ckpt,
    )
    deliver_b()
    run_with_idempotent_sink(
        twins.twin_budget_gate(twins.docs_stream(spark, src), doctored),
        out_dir,
        ckpt,
    )

    out = _committed_rows(spark, out_dir).collect()
    marginal = [r for r in out if r["reason"] == "marginal"]
    assert marginal, "doctored budget must produce a straddling band"
    # Both tranches must feed the counter, or the probe proves nothing.
    parities = {r["doc_id"] % 2 for r in marginal}
    assert parities == {0, 1}, "marginal docs must span both tranches"
    rem = b_new - target["above"]
    kept = sum(r["n_tok"] * r["keep"] for r in marginal)
    max_doc = max(r["n_tok"] for r in marginal)
    assert kept <= rem, "counter overshot: state did not resume"
    assert kept > rem - max_doc, "counter under-admitted after restart"


def test_dedup_gate_crash_restart_no_dup_no_loss(spark, sf_dir, tmp_path):
    """Kill-mid-batch + restart for the incremental dedup ingest gate:
    committed match rows over both tranches equal the batch reference
    (exact flags, near counts, best matches) with no duplicate pair."""
    from scala_reactivex_spark.operators.llm_dedup import (
        incremental_is_incoming,
        incremental_static_sides,
        llm_dedup_incremental,
    )
    from scala_reactivex_spark.sources.catalog import table

    existing_hashes, existing_index = incremental_static_sides(
        spark, sf_dir
    )
    incoming = table(spark, sf_dir, "documents").where(
        incremental_is_incoming()
    )
    src = str(tmp_path / "incr_src")
    deliver_b = _two_tranches(spark, incoming, src, "doc_id")
    out_dir = str(tmp_path / "incr_out")
    ckpt = str(tmp_path / "incr_ckpt")

    def run():
        run_with_idempotent_sink(
            twins.twin_dedup_incremental(
                twins.docs_stream(spark, src),
                existing_hashes,
                existing_index,
            ),
            out_dir,
            ckpt,
        )

    run()
    assert glob.glob(f"{out_dir}/batch_id=*/_COMMITTED")
    _tear_next_batch(
        spark,
        out_dir,
        "CAST(id + 900000 AS BIGINT) AS doc_id"
        "|CAST(0 AS BIGINT) AS doc_ex|'torn' AS match_type"
        "|CAST(1.0 AS DOUBLE) AS jaccard",
    )
    deliver_b()
    run()

    rows = _committed_rows(spark, out_dir).collect()
    assert not any(r["doc_id"] >= 900000 for r in rows)
    # No duplicate match row survived the replay.
    keys = [(r["doc_id"], r["doc_ex"], r["match_type"]) for r in rows]
    assert len(keys) == len(set(keys))
    got: dict[int, dict] = {}
    for r in rows:
        g = got.setdefault(r["doc_id"], {"exact": False, "near": set()})
        if r["match_type"] == "exact":
            g["exact"] = True
        else:
            g["near"].add(r["doc_ex"])
    batch = llm_dedup_incremental(spark, sf_dir).collect()
    assert batch
    some_near = False
    for b in batch:
        g = got.get(b["doc_id"], {"exact": False, "near": set()})
        assert g["exact"] == bool(b["is_exact_dup"]), b["doc_id"]
        assert len(g["near"]) == b["n_near"], b["doc_id"]
        if b["n_near"] > 0:
            some_near = True
            assert min(g["near"]) == b["best_near"]
    assert some_near, "fixture must exercise the near path"
