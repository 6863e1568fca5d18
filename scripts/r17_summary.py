#!/usr/bin/env python
"""Round-17 before/after bench comparison table.

Reads the round-16 driver artifact (BENCH_r16.json parsed queries are only
the top-5, so the committed r16 BENCH_DETAIL is taken from git) and the
current BENCH_DETAIL.json, and prints a markdown table for every query the
round touched plus bucket totals — the evidence appendix of
OPTIMIZATION_r17.md.

    python scripts/r17_summary.py <r16_detail.json> [touched...]
"""

from __future__ import annotations

import json
import sys

TOUCHED = [
    "rel_agg_approx_pct",
    "src_table_stats_approx",
    "llm_chunk_retrieval_recall",
    "llm_chunk_overlap",
    "llm_chunk_dedup",
    "llm_cluster_purity",
    "llm_minhash_band_tune",
    "llm_line_dedup",
    "llm_dedup_substring",
    "llm_line_dedup_purge",
    "llm_dup_ngram_coverage",
    "llm_hll_portable",
    "llm_hard_negatives",
    "rel_concurrency",
    "llm_dedup_simhash_nn",
    "llm_multimodal_phash",
    "llm_multimodal_dedup",
    "llm_containment_lsh",
    "llm_dedup_minhash",
    "llm_boilerplate",
    "rel_q21_waiting",
]


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open("BENCH_DETAIL.json"))
    names = sys.argv[2:] or TOUCHED
    print("| query | r16 cold | r17 cold | r16 warm | r17 warm |")
    print("|---|---|---|---|---|")
    ow, nw = old.get("warm_medians", {}), new.get("warm_medians", {})
    for n in names:
        print(
            f"| {n} | {old['queries'].get(n, '-')} | "
            f"{new['queries'].get(n, '-')} | {ow.get(n, '-')} | "
            f"{nw.get(n, '-')} |"
        )
    print()
    for k in sorted(new):
        if k.endswith("_seconds") or k in (
            "value",
            "warm_headline_sec",
        ):
            print(f"- {k}: r16 {old.get(k)} -> r17 {new.get(k)}")


if __name__ == "__main__":
    main()
