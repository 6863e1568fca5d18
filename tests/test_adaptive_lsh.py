"""Corpus-adaptive sign-LSH (llm_dedup_embed_lsh_adaptive): the
bucket-space knob the round-11 sf100 probe showed the fixed config
needs.  Laws: the integer rows rule; superset of the fixed config's
verified pairs at equal rows (more bands can only add candidates, and
the exact-cosine verify filters identically); exactness of every
emitted pair."""

from __future__ import annotations

from scala_reactivex_spark.operators.llm_dedup import (
    ADAPTIVE_MAX_ROWS,
    ADAPTIVE_MIN_ROWS,
    ADAPTIVE_TARGET_LOAD,
    adaptive_lsh_rows,
)


def test_adaptive_rows_rule():
    assert adaptive_lsh_rows(0) == ADAPTIVE_MIN_ROWS
    assert adaptive_lsh_rows(ADAPTIVE_TARGET_LOAD << 8) == 8
    assert adaptive_lsh_rows((ADAPTIVE_TARGET_LOAD << 8) + 1) == 9
    assert adaptive_lsh_rows(2_000_000) == 20  # the sf100 probe's corpus
    assert adaptive_lsh_rows(10**18) == ADAPTIVE_MAX_ROWS
    # Monotone non-decreasing in n.
    vals = [adaptive_lsh_rows(n) for n in range(1, 10**7, 999_983)]
    assert vals == sorted(vals)


def test_adaptive_pairs_superset_of_fixed_at_fixture(spark, sf_dir):
    """At fixture scale the adaptive rule picks the minimum rows (8 —
    same bucket width as the fixed config) but spreads 12 bands over
    more planes; candidates can only grow, and the exact-cosine
    verify is identical, so verified pairs must be a superset."""
    from scala_reactivex_spark.operators.llm_dedup import (
        llm_dedup_embed_lsh,
        llm_dedup_embed_lsh_adaptive,
    )

    fixed = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in llm_dedup_embed_lsh(spark, sf_dir).collect()
    }
    adaptive = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in llm_dedup_embed_lsh_adaptive(spark, sf_dir).collect()
    }
    assert adaptive and fixed <= adaptive


def test_adaptive_pairs_are_exact_cosine_matches(spark, sf_dir):
    """Every emitted pair's cos_sim equals the brute-force double
    cosine of the two vectors (the verify is exact, LSH only gates
    candidates)."""
    import math

    from scala_reactivex_spark.operators.llm_dedup import (
        EMBED_T,
        llm_dedup_embed_lsh_adaptive,
    )
    from scala_reactivex_spark.sources.catalog import table

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in table(spark, sf_dir, "embeddings").collect()
    }
    out = llm_dedup_embed_lsh_adaptive(spark, sf_dir).collect()
    assert out
    for r in out:
        a, b = vecs[r["vec_a"]], vecs[r["vec_b"]]
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(y) ** 2 for y in b))
        want = round(dot / (na * nb), 4)
        assert abs(r["cos_sim"] - want) < 1e-9
        assert r["cos_sim"] >= EMBED_T
