#!/usr/bin/env python
"""Crash-restart recovery timing for the stateful ingest gates.

Runs the tests/test_crash_restart.py protocol (tranche A drains → the
job dies with the next batch half-written → tranche B arrives → restart
on the same checkpoint) for ``twin_budget_gate`` and
``twin_dedup_incremental`` at a real scale factor and prints one JSON
line per gate:

    {"gate": ..., "cold_drain_sec": ..., "recovery_drain_sec": ...,
     "rows_committed": ..., "no_dup": true, "no_loss": true}

recovery_drain_sec is the judged number: wall time for the restarted
query to load the checkpointed state store, purge the torn batch and
commit tranche B.  Usage:

    python scripts/crash_restart_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402


def _two_tranches(df, src: str):
    a = df.where(F.col("doc_id") % 2 == 0)
    b = df.where(F.col("doc_id") % 2 == 1)
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
                os.utime(os.path.join(src, name), (base + 30, base + 30))

    return deliver_b


def _tear(spark, out_dir: str, schema_sql: str) -> None:
    committed = glob.glob(f"{out_dir}/batch_id=*/_COMMITTED")
    next_id = 1 + max(
        int(os.path.basename(os.path.dirname(m)).split("=")[1])
        for m in committed
    )
    spark.range(3).selectExpr(*schema_sql.split("|")).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/batch_id={next_id}")


def _committed(spark, out_dir: str):
    dirs = [
        os.path.dirname(m)
        for m in glob.glob(f"{out_dir}/batch_id=*/_COMMITTED")
    ]
    return spark.read.parquet(*dirs)


def probe_gate(spark, sf_dir: str, work: str, name: str) -> dict:
    from scala_reactivex_spark.operators.llm_dedup import (
        incremental_is_incoming,
        incremental_static_sides,
    )
    from scala_reactivex_spark.sources.catalog import table
    from scala_reactivex_spark.streaming import twins
    from scala_reactivex_spark.streaming.sinks import (
        run_with_idempotent_sink,
    )

    src = os.path.join(work, f"{name}_src")
    out_dir = os.path.join(work, f"{name}_out")
    ckpt = os.path.join(work, f"{name}_ckpt")
    if name == "budget_gate":
        gate = twins.budget_gate_plan(spark, sf_dir)
        docs = table(spark, sf_dir, "documents")
        deliver_b = _two_tranches(docs, src)

        def run():
            run_with_idempotent_sink(
                twins.twin_budget_gate(
                    twins.docs_stream(spark, src), gate
                ),
                out_dir,
                ckpt,
            )

        torn_schema = (
            "CAST(id + 900000 AS BIGINT) AS doc_id"
            "|CAST(0 AS BIGINT) AS band|CAST(0 AS BIGINT) AS n_tok"
            "|CAST(1 AS INT) AS keep|'torn' AS reason"
        )
        key_cols = ("doc_id",)
    else:
        ex_hashes, ex_index = incremental_static_sides(
            spark, sf_dir, packed=True
        )
        incoming = table(spark, sf_dir, "documents").where(
            incremental_is_incoming()
        )
        deliver_b = _two_tranches(incoming, src)

        def run():
            run_with_idempotent_sink(
                twins.twin_dedup_incremental(
                    twins.docs_stream(spark, src), ex_hashes, ex_index
                ),
                out_dir,
                ckpt,
            )

        torn_schema = (
            "CAST(id + 900000 AS BIGINT) AS doc_id"
            "|CAST(0 AS BIGINT) AS doc_ex|'torn' AS match_type"
            "|CAST(1.0 AS DOUBLE) AS jaccard"
        )
        key_cols = ("doc_id", "doc_ex", "match_type")

    t0 = time.perf_counter()
    run()
    cold = time.perf_counter() - t0
    _tear(spark, out_dir, torn_schema)
    deliver_b()
    t0 = time.perf_counter()
    run()
    recovery = time.perf_counter() - t0

    rows = _committed(spark, out_dir).collect()
    keys = [tuple(r[c] for c in key_cols) for r in rows]
    # no_loss = the committed stream output over both tranches covers
    # the BATCH REFERENCE exactly (the tests/test_crash_restart.py
    # comparison, replayed here at probe scale).
    if name == "budget_gate":
        from scala_reactivex_spark.operators.llm_compose import (
            llm_budget_select,
        )

        # One decision row per incoming doc: committed doc_id set must
        # equal the batch plan's doc_id set.
        ref_ids = {
            r["doc_id"] for r in llm_budget_select(spark, sf_dir).collect()
        }
        no_loss = {r["doc_id"] for r in rows} == ref_ids
    else:
        from scala_reactivex_spark.operators.llm_dedup import (
            llm_dedup_incremental,
        )

        # Aggregate committed match rows per doc and compare exact flag
        # + near-match count against the batch reference.
        got: dict[int, dict] = {}
        for r in rows:
            g = got.setdefault(
                r["doc_id"], {"exact": False, "near": set()}
            )
            if r["match_type"] == "exact":
                g["exact"] = True
            else:
                g["near"].add(r["doc_ex"])
        batch = llm_dedup_incremental(spark, sf_dir).collect()
        no_loss = bool(batch) and all(
            got.get(b["doc_id"], {"exact": False, "near": set()})["exact"]
            == bool(b["is_exact_dup"])
            and len(
                got.get(b["doc_id"], {"exact": False, "near": set()})[
                    "near"
                ]
            )
            == b["n_near"]
            for b in batch
        )
    return {
        "gate": name,
        "cold_drain_sec": round(cold, 3),
        "recovery_drain_sec": round(recovery, 3),
        "rows_committed": len(rows),
        "no_dup": len(keys) == len(set(keys)),
        "no_loss": no_loss,
        "torn_purged": not any(r["doc_id"] >= 900000 for r in rows),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("crash_probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="crash_probe_")
    for name in ("budget_gate", "dedup_gate"):
        print(json.dumps(probe_gate(spark, args.sf, work, name)))


if __name__ == "__main__":
    main()
