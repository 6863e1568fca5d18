"""Query registry: the single source of truth for the operator inventory.

Each operator module registers its queries here with an optional DuckDB
oracle SQL string; ``__spark_entry__.py`` re-exports the registry as the
driver contract (``queries()`` / ``oracle_sql()``), so adding an operator is
one ``@register(...)`` decorator — nothing else to wire.

Registration order is import order of the modules in ``load_all()``; keys
are the SURVEY.md §2 contract names.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Operator modules that self-register queries on import.
_OPERATOR_MODULES = (
    "scala_reactivex_spark.operators.creation",
    "scala_reactivex_spark.operators.stateless",
    "scala_reactivex_spark.operators.stateful",
    "scala_reactivex_spark.operators.windows",
    "scala_reactivex_spark.operators.combinators",
    "scala_reactivex_spark.operators.aggregates",
    "scala_reactivex_spark.operators.relational",
    "scala_reactivex_spark.operators.tpch_suite",
    "scala_reactivex_spark.operators.timeseries",
    "scala_reactivex_spark.operators.llm_dedup",
    "scala_reactivex_spark.operators.llm_similarity",
    "scala_reactivex_spark.operators.llm_text",
    "scala_reactivex_spark.operators.llm_multimodal",
    "scala_reactivex_spark.operators.llm_pipeline",
    "scala_reactivex_spark.operators.llm_signals",
    "scala_reactivex_spark.operators.llm_cluster",
    "scala_reactivex_spark.operators.llm_retrieval",
    "scala_reactivex_spark.operators.llm_subdoc",
    "scala_reactivex_spark.operators.llm_graph",
    # llm_compose embeds other modules' registered oracles (peek) — must
    # stay AFTER every module it composes from.
    "scala_reactivex_spark.operators.llm_compose",
    # round-7 additions — last, so their registry order sits behind the
    # 47 round-6 keys the r07 grading window must bank first.
    "scala_reactivex_spark.operators.llm_extras",
    # round-11 salted escape hatches — reference base ops' oracles, so
    # must import after stateful/windows.
    "scala_reactivex_spark.operators.salted",
    # round-16 curation audits — the funnel composes llm_text/llm_dedup
    # helpers, so must import after both.
    "scala_reactivex_spark.operators.llm_curation",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # None → driver runs weaker rows-only check
    tier: str = "T1"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False

#: Grading-window rotation (see COVERAGE.md "Rotation policy").  The external
#: driver grades only the FIRST 50 registry entries in iteration order, so the
#: order is: (1) keys never hash-green in any round — new operators and fixes
#: land here automatically; (2) keys whose defining module was EDITED after
#: their latest grade and not since re-verified locally (plans/grade_fp.py —
#: round-12 verdict #7 made this priority explicit); (3) explicit
#: re-confirms; (4) banked greens, oldest grade first.  Keys outside the
#: window in a given round remain covered by scripts/verify_local.py (same
#: row-count + schema + value-hash protocol) and their banked
#: CORRECTNESS_r{N}.json rows — recorded here explicitly per ADVICE.md r2 so
#: the rotation is an auditable policy, not a silent reshuffle.
_R1_GREEN_ROTATE_LAST = (
    "src_scan_events", "src_interval",
    "op_map", "op_filter", "op_flatmap", "op_materialize",
    "op_error_return", "op_delay", "op_time_interval",
    "op_scan_running_sum", "op_reduce", "op_pairwise", "op_distinct",
    "op_distinct_until_changed", "op_take", "op_take_while",
    "op_first_last", "op_buffer_count", "op_collect_sorted",
    "op_stats_battery", "op_skip",
    "op_window_tumbling", "op_window_sliding", "op_window_session",
    "op_debounce", "op_throttle_first", "op_sample", "op_timeout_flag",
    "op_merge", "op_concat", "op_zip", "op_combine_latest",
    "op_with_latest_from", "op_take_until", "op_amb", "op_switch",
    "op_interval_join",
    "op_agg_basic", "op_group_by", "op_bool", "op_sequence_equal",
    "op_default_if_empty",
    "rel_q1_pricing", "rel_join_inner", "rel_join_semi_anti",
    "rel_join_range", "rel_window_rank", "rel_rollup", "rel_topk",
)


#: Keys first hash-green in round 2 (CORRECTNESS_r02.json) — not already in
#: the round-1 list above.
_R2_GREEN = (
    "src_range", "rel_setops", "rel_agg_distinct", "rel_scalar_battery",
    "op_udf_textlen", "rel_subquery_corr", "rel_cube", "rel_window_range",
    "rel_pivot", "llm_dedup_exact", "llm_dedup_near", "llm_dedup_shingle",
    "llm_dedup_embed", "llm_dedup_cluster", "llm_boilerplate",
    "llm_similarity_topk", "llm_ann_ivf", "llm_text_tokens",
    "llm_text_stats", "llm_quality_score", "llm_doc_fingerprint",
    "llm_text_clean", "llm_doc_sample", "llm_vocab_coverage",
    "llm_multimodal_join", "llm_multimodal_features",
    "llm_multimodal_resize", "llm_multimodal_frames",
    "llm_doc_split", "llm_pack_sequences", "llm_stratified_sample",
    "llm_decontaminate",
)

#: Keys first hash-green in rounds 3–5 (CORRECTNESS_r03..r05.json).  Banked
#: behind the never-green front group but ahead of the older banks, so they
#: re-confirm while window slots remain.  Round 6: the front group is the
#: 29 round-5 keys never externally graded + rel_agg_approx (re-pinned
#: error-band oracle) + the 7 round-6 retrieval/subdoc/layout additions =
#: 37 keys, all inside the 50-slot window; 13 of these banked keys fill
#: the remainder.  Keys outside the window stay covered by
#: scripts/verify_local.py (all 148, same hash protocol) per the
#: rotation policy above.
_R345_GREEN = (
    "rel_topk_window", "rel_grouping_sets", "rel_q6_forecast",
    "rel_window_funcs", "rel_percentiles", "rel_q3_shipping",
    "rel_q18_large_orders", "rel_q5_volume", "rel_join_asof",
    "rel_cdc_upsert", "rel_scd2", "rel_funnel", "rel_skew_agg",
    "llm_dedup_minhash", "llm_dedup_simhash", "llm_dedup_embed_lsh",
    "llm_dedup_containment", "llm_lang_id", "llm_pii_scrub",
    "llm_seq_len_hist", "llm_embed_quantize", "llm_repetition_score",
    "llm_token_entropy", "llm_unigram_lm", "llm_cdc_chunks",
    "llm_embed_norm_stats", "llm_tfidf", "llm_embed_centroid",
    "llm_domain_mix", "llm_winnowing",
)

#: Keys graded at their declared rows-only maximum (no oracle by design,
#: reasons in each @register doc) — a window slot cannot improve their grade.
#: Round 6: empty — rel_agg_approx (the last oracle-less entry) now pins its
#: HLL estimate to a deterministic ±3% error-band boolean, so it is
#: hash-gradeable and moves to the front of the window.
_ROWS_ONLY_GRADED: tuple[str, ...] = ()

#: Banked-green keys the last verdict asked to RE-CONFIRM in the next
#: window's spare slots.  Empty for round 8: the r07 verdict's three
#: re-confirms all banked in CORRECTNESS_r07.json, and the r08 plan is
#: never-green-first + OLDEST banked greens in the spare slots (their
#: grades are the most stale).
_RECONFIRM_NEXT: tuple[str, ...] = ()

#: Keys to HOLD out of this round's window (sorted LAST; used in r7 to
#: keep the window exactly the 47 ungraded round-6 keys, re-used in r13
#: for the three round-13 additions so the window stays the r8 cohort +
#: oldest r9 greens per the r12 verdict #8).  Held keys are verified by
#: the identical local protocol (scripts/verify_local.py) in their birth
#: round and become the never-green front of the NEXT round's window
#: automatically once this tuple is cleared.
#:
#: CLEARED for round 14 (r13 verdict #1): the three held data-selection
#: keys (llm_reservoir_sample / llm_rho_select / llm_eval_affinity) now
#: lead the window as never-driver-green keys so the driver banks them
#: in CORRECTNESS_r14.json.  Steady-state policy: this tuple stays empty.
_HOLD_NEXT_ROUND: tuple[str, ...] = ()


def _externally_green() -> dict[str, int]:
    """name → latest round with an all-match CORRECTNESS_r{N}.json row.

    Reading the driver's own artifacts makes the rotation SELF-
    MAINTAINING: a key that goes externally hash-green is banked
    automatically next session, and a new/changed key (absent from every
    artifact) floats to the front of the 50-slot window without anyone
    editing a tuple (the round-4 verdict's stale-rotation defect class,
    eliminated structurally)."""
    import json
    from pathlib import Path

    out: dict[str, int] = {}
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(str(p.stem).rsplit("_r", 1)[-1])
            data = json.loads(p.read_text())
        except (ValueError, OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _grade_order(names):
    """Grading-window ordering: (1) keys with no external hash-green row
    lead (they can improve their grade); (2) EDITED-SINCE-GRADE keys —
    defining module changed after the latest driver grade with no local
    re-verification at the current source (plans/grade_fp.py, round-12
    verdict #7: stale greens must not hide behind window-size
    construction); (3) explicit re-confirms; (4) banked greens, OLDEST
    round first (an r08 grade is the most stale, so it re-confirms while
    window slots remain — r07 verdict "Next round" #1).  Falls back to
    the hardcoded round-1..5 tuples when no CORRECTNESS artifacts are
    readable (e.g. a bare checkout)."""
    green = _externally_green()
    if green:
        from scala_reactivex_spark.plans import grade_fp

        held = set(_HOLD_NEXT_ROUND)
        front = [n for n in names if n not in green and n not in held]
        # Rotation priority #2 (right behind never-green — round-12
        # verdict #7): keys whose DEFINING MODULE changed after their
        # latest driver grade and whose current source no local
        # verify_local run has re-confirmed.  Their green grade is
        # stale evidence; front-load so the driver re-proves them
        # before the banked cohorts re-confirm.  Oldest grade first.
        edited = sorted(
            (
                n
                for n in names
                if n in green
                and n not in held
                and grade_fp.edited_unverified(
                    n, _REGISTRY[n].fn.__module__, green[n]
                )
            ),
            key=lambda n: (green[n], n),
        )
        reconfirm = [n for n in _RECONFIRM_NEXT if n in green and n in set(names)]
        new_held = [n for n in names if n in held and n not in green]
        rest = set(front) | set(edited) | set(reconfirm) | set(new_held)
        back = sorted(
            (n for n in names if n not in rest), key=lambda n: (green[n], n)
        )
        # Held keys sort LAST: their birth-round coverage is the local
        # verify log; they lead the next round's window as never-green
        # once the hold is cleared.
        return front + edited + reconfirm + back + new_held
    rank = {}
    for group, base in (
        (_R345_GREEN, 500_000),
        (_R2_GREEN, 1_000_000),
        (_ROWS_ONLY_GRADED, 2_000_000),
        (_R1_GREEN_ROTATE_LAST, 3_000_000),
    ):
        for i, n in enumerate(group):
            rank[n] = base + i
    front = [n for n in names if n not in rank]
    back = sorted((n for n in names if n in rank), key=rank.__getitem__)
    return front + back


def register(
    name: str,
    oracle: str | None = None,
    tier: str = "T1",
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tier=tier, doc=doc or (fn.__doc__ or ""),
            tags=tags,
        )
        return fn

    return deco


def load_all() -> None:
    """Import every operator module exactly once (populates the registry)."""
    global _LOADED
    if _LOADED:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def registry() -> dict[str, QuerySpec]:
    load_all()
    return {n: _REGISTRY[n] for n in _grade_order(_REGISTRY)}


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]


def peek(name: str) -> QuerySpec:
    """Like :func:`get` but WITHOUT triggering load_all — for operator
    modules that compose another module's registered oracle at import
    time (importing the dependency module directly, then peeking, avoids
    the load_all re-entrancy a get() would cause mid-load)."""
    return _REGISTRY[name]


def all_queries() -> dict[str, QueryFn]:
    """Driver contract: name -> (spark, sf_dir) -> DataFrame."""
    return {name: spec.fn for name, spec in registry().items()}


def all_oracles() -> dict[str, str]:
    """Driver contract: name -> DuckDB SQL (only queries that declare one)."""
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle
    }
