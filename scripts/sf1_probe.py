#!/usr/bin/env python
"""One-shot sf1 scale probe (r6 verdict "Next round" #4).

All per-round perf evidence is sf0.1/sf0.01; this script builds a 10×
sf0.1 ("sf1") fixture under /tmp/sf1_probe and times the most join-heavy
queries at BOTH scales in one warm session, so any super-linear
candidate-join blowup the small fixtures hide becomes measurable:

    SPARK_GRAFT_CPUS=32 python scripts/sf1_probe.py
    # env: SPARK_GRAFT_SF01 (default /root/testdata/sf0.1)

Fixture construction (deterministic, DuckDB, no network):
  - documents ×10: copy i suffixes every token with ``_i`` (i>0), so each
    copy is a disjoint sub-corpus — duplicate-cluster sizes stay constant
    while corpus and vocabulary grow 10×, which is the CONSERVATIVE model
    for LSH/minhash (bucket count grows, per-bucket density doesn't) and
    the worst case for |V|-bounded ops (real vocabularies grow
    sublinearly by Heaps' law).
  - embeddings ×10: copy i shifts every coordinate by 0.01·(i−4.5) —
    within-copy geometry preserved, copies decollapsed so IVF/PQ/kmeans
    see 10× genuinely distinct points.
  - lineitem/orders ×10: orderkey += i·10⁷; dimension tables (customer,
    supplier, part, nation, region) stay 1× — facts grow, dims don't,
    as at real scale.
  - events copied 1× (no probed query reads it).

Output: one JSON line per query {name, sf01_sec, sf1_sec, ratio,
linear_ratio=ratio/10} plus a summary; paste the table into SCALING.md.
A ratio > 30 (3× super-linear vs the 10× data growth) is a plan bug.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

SF1_DIR = "/tmp/sf1_probe"
COPIES = 10

#: The join-heavy probe set named by the r6 verdict.
PROBE = (
    "llm_dedup_minhash",
    "llm_dedup_embed_lsh",
    "llm_ann_ivf",
    "llm_ann_ivf_mp",
    "llm_ann_pq",
    "llm_semdedup",
    "llm_textrank",
    "llm_bm25",
    "llm_dedup_incremental",
    "rel_q21_waiting",
    # round-7 additions (follow-up probe, SCALING.md)
    "rel_join_skew_salted",
    "llm_chunk_overlap",
    "llm_chunk_retrieval_recall",
)


def build_fixture(sf01: str) -> None:
    import duckdb

    out = Path(SF1_DIR)
    if (out / "_DONE").exists():
        return
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    con = duckdb.connect()

    def copy_asis(t: str) -> None:
        con.sql(
            f"COPY (SELECT * FROM '{sf01}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    for t in ("region", "nation", "customer", "supplier", "part", "events"):
        copy_asis(t)

    union = " UNION ALL ".join(
        f"""SELECT doc_id + {i * 1_000_000} AS doc_id,
               {'text' if i == 0 else
                f"list_aggregate(list_transform(string_split(text, ' '),"
                f" x -> x || '_{i}'), 'string_agg', ' ')"} AS text,
               lang, source, n_chars
            FROM '{sf01}/documents.parquet'"""
        for i in range(COPIES)
    )
    con.sql(f"COPY ({union}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    union = " UNION ALL ".join(
        f"""SELECT vec_id + {i * 1_000_000} AS vec_id,
               list_transform(embedding,
                   x -> CAST(x + {0.01 * (i - 4.5)} AS FLOAT)) AS embedding,
               label
            FROM '{sf01}/embeddings.parquet'"""
        for i in range(COPIES)
    )
    con.sql(f"COPY ({union}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        union = " UNION ALL ".join(
            f"""SELECT * REPLACE ({key} + {i * 10_000_000} AS {key})
                FROM '{sf01}/{t}.parquet'"""
            for i in range(COPIES)
        )
        con.sql(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    (out / "_DONE").touch()


def main() -> None:
    sf01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    # Probe-set override for follow-up batches (comma-separated names),
    # e.g. the round-8 capped dedup-pair campaign.
    probe = tuple(
        n for n in os.environ.get("SPARK_GRAFT_PROBE", "").split(",") if n
    ) or PROBE
    build_fixture(sf01)

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # Warm the JVM once at each scale before timing.
    run("rel_q1_pricing", sf01)
    run("rel_q1_pricing", SF1_DIR)

    rows = []
    for name in probe:
        t_small = run(name, sf01)
        t_big = run(name, SF1_DIR)
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        row = {
            "query": name,
            "sf01_sec": t_small,
            "sf1_sec": t_big,
            "ratio": ratio,
            "vs_linear": round(ratio / COPIES, 2) if ratio else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "metric": "sf1_probe",
                "copies": COPIES,
                "worst_vs_linear": max(
                    (
                        r["vs_linear"]
                        for r in rows
                        if r["vs_linear"] is not None
                    ),
                    default=None,
                ),
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
