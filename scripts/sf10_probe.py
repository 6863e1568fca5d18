#!/usr/bin/env python
"""Second-decade scale probe: sf1 → sf10 for the two heaviest families
(r8 verdict "Next round" #5).

SCALING.md's sf0.1→sf1 batches prove one decade of linearity; this
script adds the second decade for MinHash-LSH dedup and IVF/PQ ANN —
the families whose 100 TB story rests on flat per-bucket density under
corpus growth.  It builds a 100× sf0.1 ("sf10") fixture of JUST the
tables those families read (documents, embeddings) under
/tmp/sf10_probe, reuses scripts/sf1_probe.py's fixture as the sf1
side, and times each probe at both scales in one warm session:

    SPARK_GRAFT_CPUS=32 python scripts/sf10_probe.py
    # env: SPARK_GRAFT_SF01 (default /root/testdata/sf0.1)

Fixture construction mirrors sf1_probe (deterministic, DuckDB):
  - documents ×100: copy i suffixes every token with ``_i`` — disjoint
    sub-corpora, duplicate-cluster sizes constant, vocabulary grows
    100× (the conservative model for LSH banding: bucket COUNT grows,
    per-bucket density must not).
  - embeddings ×100: copy i cyclically ROTATES the 64 coordinates by
    i mod 64 and shifts by 0.001·(i−49.5).  Rotation preserves norms
    and within-copy geometry exactly while decorrelating copies
    (cosine of a vector vs its rotated copy ≈ 0); the small shift
    separates the i / i+64 same-rotation pairs.  A plain large shift
    would instead saturate the sign-LSH projections (whole copies
    collapsing into one sign bucket — a fixture artifact measured as
    a quadratic candidate blowup, not a plan property).

Output: one JSON line per query {name, sf1_sec, sf10_sec, ratio,
vs_linear=ratio/10} plus a summary line; paste into SCALING.md.  A
vs_linear materially above 1 is a plan bug (super-linear blowup).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

SF10_DIR = "/tmp/sf10_probe"
COPIES_TOTAL = 100  # vs sf0.1; vs the sf1 side this is one more decade
DECADE = 10  # sf1 → sf10 growth factor the ratios are judged against

#: The two heaviest families: MinHash-LSH dedup (documents) and
#: IVF/PQ ANN (embeddings), plus the sign-LSH embedding dedup that
#: shares the banding scale argument.
PROBE = (
    "llm_dedup_minhash",
    "llm_dedup_minhash_stats",
    "llm_dedup_embed_lsh",
    "llm_ann_ivf",
    "llm_ann_ivf_mp",
    "llm_ann_pq",
)


def build_fixture(sf01: str) -> None:
    import duckdb

    out = Path(SF10_DIR)
    if (out / "_DONE").exists():
        return
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    con = duckdb.connect()

    union = " UNION ALL ".join(
        f"""SELECT doc_id + {i * 1_000_000} AS doc_id,
               {'text' if i == 0 else
                f"list_aggregate(list_transform(string_split(text, ' '),"
                f" x -> x || '_{i}'), 'string_agg', ' ')"} AS text,
               lang, source, n_chars
            FROM '{sf01}/documents.parquet'"""
        for i in range(COPIES_TOTAL)
    )
    con.sql(f"COPY ({union}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    union = " UNION ALL ".join(
        f"""SELECT vec_id + {i * 1_000_000} AS vec_id,
               list_transform(range(1, 65),
                   j -> CAST(embedding[((j - 1 + {i % 64}) % 64) + 1]
                             + {0.001 * (i - 49.5)} AS FLOAT))
                   AS embedding,
               label
            FROM '{sf01}/embeddings.parquet'"""
        for i in range(COPIES_TOTAL)
    )
    con.sql(
        f"COPY ({union}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    (out / "_DONE").touch()


def build_fixture_rel(sf01: str) -> None:
    """Relational side of the sf10 fixture (second batch): lineitem and
    orders ×100 with disjoint orderkey ranges (+i·10⁷ — max key ≈ 10⁹,
    inside int32), dimension tables copied as-is.  Same growth model as
    sf1_probe: facts grow, dimensions don't, so per-entity density rises
    100× — the conservative shape for group-bys keyed on dimensions
    (e.g. Q13's per-customer counts).  Separate _DONE_REL marker so the
    document/embedding fixture built by earlier batches is reused."""
    import duckdb

    out = Path(SF10_DIR)
    marker = out / "_DONE_REL"
    if marker.exists():
        return
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "events"):
        con.sql(
            f"COPY (SELECT * FROM '{sf01}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        union = " UNION ALL ".join(
            f"""SELECT * REPLACE ({key} + {i * 10_000_000} AS {key})
                FROM '{sf01}/{t}.parquet'"""
            for i in range(COPIES_TOTAL)
        )
        con.sql(f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    marker.touch()


def main() -> None:
    sf01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    probe = tuple(
        n for n in os.environ.get("SPARK_GRAFT_PROBE", "").split(",") if n
    ) or PROBE

    # sf1 side: reuse (or build) the sf1_probe fixture.
    from scripts import sf1_probe

    sf1_probe.build_fixture(sf01)
    build_fixture(sf01)
    if any(n.startswith("rel_") for n in probe):
        build_fixture_rel(sf01)

    from scala_reactivex_spark.plans.registry import registry
    from scala_reactivex_spark.session import get_spark

    spark = get_spark("sf10-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    # Warm the JVM once at each scale before timing (documents +
    # embeddings scans; the probed tables are the only ones present).
    run("llm_dedup_exact", sf1_probe.SF1_DIR)
    run("llm_dedup_exact", SF10_DIR)

    rows = []
    for name in probe:
        t_sf1 = run(name, sf1_probe.SF1_DIR)
        t_sf10 = run(name, SF10_DIR)
        ratio = round(t_sf10 / t_sf1, 2) if t_sf1 > 0 else None
        row = {
            "query": name,
            "sf1_sec": t_sf1,
            "sf10_sec": t_sf10,
            "ratio": ratio,
            "vs_linear": round(ratio / DECADE, 2) if ratio else None,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "metric": "sf10_probe",
                "decade": DECADE,
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
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
