#!/usr/bin/env python
"""Third-decade scale probe: sf10 → sf100 for the two heaviest
families (round-10 verdict "Next round" #1 — the single open question
on the 100 TB claim).

SCALING.md holds two measured decades (sf0.1→sf1→sf10) for capped
MinHash-LSH dedup and IVF/PQ ANN; this script adds the third.  It
builds a 1000× sf0.1 ("sf100") fixture of JUST the tables those
families read (documents ~5M rows, embeddings 2M×64) under
/tmp/sf100_probe, reuses scripts/sf10_probe.py's fixture as the sf10
side, and times each probe at both scales in one warm session:

    SPARK_GRAFT_CPUS=32 python scripts/sf100_probe.py
    # env: SPARK_GRAFT_SF01 (default /root/testdata/sf0.1)
    #      SPARK_GRAFT_PROBE=a,b,c to override the probe list

Fixture construction (deterministic, DuckDB):
  - documents ×10 on top of the sf10 fixture: outer copy j re-suffixes
    every token with ``_j`` — still disjoint sub-corpora (vocabulary
    grows 1000× vs sf0.1), duplicate-cluster sizes constant: the
    conservative model for LSH banding, where bucket COUNT grows and
    per-bucket density must not.
  - embeddings ×1000 directly from sf0.1, decorrelated by the DIHEDRAL
    group × sign × shift-level: copy i applies permutation class
    p = (i//2) % 128 (p<64: rotate by p; else coordinate-reverse then
    rotate by p−64), sign s = ±1 (i%2), and uniform shift
    0.064·(i//256 − 1.5).  Permutations and negation preserve norms
    and within-copy geometry exactly while decorrelating copies; the
    1024 (perm, sign, level) classes cover 1000 copies with distinct
    transforms, and same-class copies are separated by the ≥0.064
    shift spacing the sf10 fixture proved sufficient.  Shifts stay
    ≤0.096 — small enough not to saturate the sign-LSH projections
    (the fixture artifact the sf10 build documented).

Output: one JSON line per query {name, sf10_sec, sf100_sec, ratio,
vs_linear=ratio/10} plus a summary line; paste into SCALING.md.  A
vs_linear materially above 1 is a plan bug (super-linear blowup).
Cap-density flatness is recorded separately: the *_stats probes'
capped/dropped bucket counts at both scales are printed so the
"per-bucket density flat across decades" number the verdict asked for
is in the artifact, not just the wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

SF100_DIR = "/tmp/sf100_probe"
OUTER_COPIES = 10  # on top of the sf10 fixture (documents)
EMB_COPIES = 1000  # embeddings built directly from sf0.1
DECADE = 10  # sf10 → sf100 growth factor the ratios are judged against

#: The verdict's probe list: capped LSH dedup (documents), the
#: containment-LSH variant, sign-LSH embedding dedup, and IVF/PQ ANN —
#: plus the two stats queries whose bucket counts ARE the cap-density
#: evidence.
PROBE = (
    "llm_dedup_minhash",
    "llm_dedup_minhash_stats",
    "llm_containment_lsh",
    "llm_dedup_embed_lsh",
    "llm_dedup_embed_lsh_stats",
    "llm_ann_ivf",
    "llm_ann_pq",
)

#: Stats queries whose OUTPUT rows are captured at both scales (bounded:
#: a handful of summary rows each) — the cap-density flatness record.
STATS = {"llm_dedup_minhash_stats", "llm_dedup_embed_lsh_stats"}


def _emb_term(sf01: str, i: int) -> str:
    s = 1 if i % 2 == 0 else -1
    p = (i // 2) % 128
    shift = 0.064 * (i // 256 - 1.5)
    if p < 64:
        elem = f"embedding[((j - 1 + {p}) % 64) + 1]"
    else:
        elem = f"embedding[64 - ((j - 1 + {p - 64}) % 64)]"
    return f"""SELECT vec_id + {i * 1_000_000} AS vec_id,
        list_transform(range(1, 65),
            j -> CAST({s} * {elem} + {shift} AS FLOAT)) AS embedding,
        label
     FROM '{sf01}/embeddings.parquet'"""


def build_fixture(sf01: str, sf10_dir: str) -> None:
    import duckdb

    out = Path(SF100_DIR)
    if (out / "_DONE").exists():
        return
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    con = duckdb.connect()
    # 1000 UNION ALL terms parse as a left-deep tree deeper than
    # DuckDB's default 1000-expression limit.
    con.sql("SET max_expression_depth TO 10000")

    union = " UNION ALL ".join(
        f"""SELECT doc_id + {j * 100_000_000} AS doc_id,
               {'text' if j == 0 else
                f"list_aggregate(list_transform(string_split(text, ' '),"
                f" x -> x || '_{j}'), 'string_agg', ' ')"} AS text,
               lang, source, n_chars
            FROM '{sf10_dir}/documents.parquet'"""
        for j in range(OUTER_COPIES)
    )
    con.sql(f"COPY ({union}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    union = " UNION ALL ".join(
        _emb_term(sf01, i) for i in range(EMB_COPIES)
    )
    con.sql(
        f"COPY ({union}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    (out / "_DONE").touch()


def main() -> None:
    sf01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    # A 5M-doc / 2M-vector fixture needs more than the 8g default local
    # JVM heap (the sf100 MinHash signature aggregation OOMs it) and
    # wider shuffles.  Both scales run in ONE session under the SAME
    # confs, so the judged ratios are conf-independent; absolute sf10
    # seconds here are not comparable to the older 32-partition
    # campaign's.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "128")
    probe = tuple(
        n for n in os.environ.get("SPARK_GRAFT_PROBE", "").split(",") if n
    ) or PROBE

    # sf10 side: reuse (or build) the sf10_probe fixture.
    from scripts import sf10_probe

    sf10_probe.build_fixture(sf01)
    build_fixture(sf01, sf10_probe.SF10_DIR)

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("sf100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    def release() -> None:
        """Drop session memos and nudge the JVM ContextCleaner between
        measurements: persisted index frames pin their upstream shuffle
        files, and at sf100 a few pinned 20-GB shuffles exhaust the
        sandbox disk mid-campaign (two probe runs died on ENOSPC).
        Each query is therefore measured STANDALONE-COLD — the
        conservative number; shared-memo reuse only makes production
        cheaper."""
        import gc

        from scala_reactivex_spark.plans.memo import clear_session_memo

        clear_session_memo()
        gc.collect()
        spark._jvm.System.gc()

    # Warm the JVM once at each scale before timing.
    run("llm_dedup_exact", sf10_probe.SF10_DIR)
    run("llm_dedup_exact", SF100_DIR)

    rows = []
    for name in probe:
        t_sf10 = run(name, sf10_probe.SF10_DIR)
        release()
        t_sf100 = run(name, SF100_DIR)
        release()
        ratio = round(t_sf100 / t_sf10, 2) if t_sf10 > 0 else None
        row = {
            "query": name,
            "sf10_sec": t_sf10,
            "sf100_sec": t_sf100,
            "ratio": ratio,
            "vs_linear": round(ratio / DECADE, 2) if ratio else None,
        }
        if name in STATS:
            row["stats_sf10"] = [
                r.asDict()
                for r in specs[name].fn(spark, sf10_probe.SF10_DIR).collect()
            ]
            row["stats_sf100"] = [
                r.asDict()
                for r in specs[name].fn(spark, SF100_DIR).collect()
            ]
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "metric": "sf100_probe",
                "decade": DECADE,
                "worst_vs_linear": max(
                    (
                        r["vs_linear"]
                        for r in rows
                        if r["vs_linear"] is not None
                    ),
                    default=None,
                ),
                "rows": [
                    {
                        k: v
                        for k, v in r.items()
                        if not k.startswith("stats_")
                    }
                    for r in rows
                ],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
