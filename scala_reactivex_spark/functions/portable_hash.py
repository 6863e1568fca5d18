"""Cross-engine-portable integer hashing (Spark ⇄ DuckDB).

The engine's sketch-based scale paths (MinHash LSH, SimHash, sign-LSH)
need pseudo-random hashes that BOTH engines can recompute bit-for-bit so
the DuckDB oracle can grade the full pipeline, not just row counts.
Spark's ``xxhash64`` has no DuckDB twin; instead everything derives from
one Karp-Rabin polynomial fold over the token's characters

    h(token) = fold over chars: acc <- (acc * 257 + codepoint) mod (2^31-1)

plus a family of affine "permutations" ``g_i(h) = (a_i*h + b_i) mod p``
with fixed LCG-generated coefficients shared by both engines.  Every
intermediate stays below 2^62, so plain BIGINT columns carry the math
exactly in Spark AND DuckDB — no HUGEINT, no float, no UDF.

The same Karp-Rabin shape at 64-bit width is already oracle-proven by
``llm_doc_fingerprint`` (Mersenne 2^61-1 fold, HUGEINT on the DuckDB
side); this 31-bit variant keeps products inside int64 so the affine
step runs as whole-stage-codegen column math in Spark and plain BIGINT
SQL in DuckDB.  On the ASCII fixture corpus Spark ``ascii()`` ≡ DuckDB
``ord()`` ≡ the UTF-8 byte (asserted in tests/test_multimodal.py).
"""

from __future__ import annotations

#: Mersenne prime 2^31 - 1: max product a*h < 2^62 fits signed int64.
P31 = (1 << 31) - 1
#: Karp-Rabin radix (first prime above the byte alphabet).
KR_BASE = 257
#: Radix for folding several 31-bit values into one bucket id.
FOLD_BASE = 1_000_003


def kr31_spark_expr(col: str) -> str:
    """Spark SQL expression: Karp-Rabin fold of ``col`` mod 2^31-1.

    JVM-side higher-order ``aggregate`` — no Python in the loop.  The
    empty-string guard matches DuckDB, whose ``range(1, 1)`` is empty
    (Spark's ``sequence(1, 0)`` would count DOWN instead).
    """
    return (
        f"CASE WHEN length({col}) = 0 THEN 0L ELSE "
        f"aggregate(sequence(1, length({col})), 0L, "
        f"(acc, i) -> (acc * {KR_BASE} + ascii(substring({col}, i, 1)))"
        f" % {P31}) END"
    )


def kr31_duck_expr(col: str) -> str:
    """DuckDB expression computing the identical fold in BIGINT."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({col}) + 1), "
        f"i -> CAST(ord(substring({col}, i, 1)) AS BIGINT))), "
        f"(acc, b) -> (acc * {KR_BASE} + b) % {P31})"
    )


def affine_seeds(k: int, *, seed: int = 20260813) -> list[tuple[int, int]]:
    """k fixed (a, b) pairs for g_i(h) = (a*h + b) mod P31, from a glibc
    LCG so both the Spark plan and the interpolated oracle SQL see the
    same literals.  a is never 0; both fit in 31 bits."""
    x = seed
    out: list[tuple[int, int]] = []
    for _ in range(k):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = 1 + x % (P31 - 1)
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % P31
        out.append((a, b))
    return out


def fold31(cols):
    """Spark column fold of several 31-bit values into one bucket id:
    acc <- (acc * FOLD_BASE + v) mod P31.  Call only with an active
    SparkSession (builds Column expressions)."""
    from pyspark.sql import functions as F

    acc = F.lit(0).cast("long")
    for c in cols:
        acc = (acc * FOLD_BASE + c) % P31
    return acc


def fold31_duck(list_expr: str) -> str:
    """DuckDB twin of :func:`fold31` over a list expression."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {list_expr}), "
        f"(acc, v) -> (acc * {FOLD_BASE} + v) % {P31})"
    )


#: Fixed coefficients for the 31-bit avalanche finalizer (mix31_*) —
#: from the shared LCG family so both engines see the same literals.
MIX31_SEEDS = affine_seeds(2)


def mix31_spark_expr(col: str) -> str:
    """Spark SQL: murmur-style avalanche finalizer over a 31-bit hash —
    xor-shift + affine, twice, all inside int64.

    The raw Karp-Rabin fold does NOT avalanche on short inputs (a
    k-digit numeric string folds to a value whose BIT LENGTH tracks k,
    so leading-zero ranks cluster at a few values — measured round 16:
    the rank histogram of kr31 over l_orderkey strings had mass only at
    {1, 2, 10, 18, 26}, wrecking any HLL built on it).  Consumers that
    read the hash's HIGH bits as uniform (HLL rank) must mix through
    this finalizer; consumers that only need equality or modular
    spread (MinHash, LSH buckets, sampling) stay on the raw fold.
    Composition of two affines is one affine, so the nonlinearity
    comes from the interleaved xor-shifts.  Shifts are spelled as
    integer division by a power of two (inputs are non-negative 31-bit
    values) so the text needs no ``>>``, which Spark SQL cannot parse —
    keeping the oracle form mechanically rewritable (``//`` → DIV,
    ``xor()`` → ``^``, plans/sql_corpus.spark_dialect)."""
    (a, b), (a2, b2) = MIX31_SEEDS
    g = f"(({a} * (({col}) ^ (({col}) DIV 32768)) + {b}) % {P31})"
    return f"(({a2} * ({g} ^ ({g} DIV 8192)) + {b2}) % {P31})"


def mix31_duck_expr(col: str) -> str:
    """DuckDB twin of :func:`mix31_spark_expr` (xor(a,b), // spelling)."""
    (a, b), (a2, b2) = MIX31_SEEDS
    g = f"(({a} * xor(({col}), ({col}) // 32768) + {b}) % {P31})"
    return f"(({a2} * xor({g}, {g} // 8192) + {b2}) % {P31})"


def kr31_pandas_udf():
    """Vectorized Arrow-batched twin of :func:`kr31_spark_expr` for LONG
    strings (whole documents).

    Identical pinned arithmetic — the fold runs position-wise over a
    masked int64 accumulator, with characters decoded via UTF-32 so each
    element is the CODEPOINT, exactly what Spark ``ascii()`` and DuckDB
    ``ord()`` yield (bit-equality with the Catalyst fold is
    pytest-asserted, tests/test_portable_hash_swap.py).  Measured at
    sf0.1 (round 8): ~211 ns/char vs ~1100 ns/char for the interpreted
    ``aggregate()`` fold on whole-document inputs — a ~5× win where the
    per-character interpreter cost dominates.  On SHORT strings (tokens,
    W-grams) the Arrow transfer dominates instead and the Catalyst fold
    is faster — keep :func:`kr31_spark_expr` there (measured: 0.51 s vs
    0.83 s on the per-token workload).  Used by ``llm_hll_portable`` and
    its streaming twin; every token/gram-level sharer stays on the
    JVM-side fold.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    # Non-decorator form: `from __future__ import annotations` turns the
    # pd.Series hints into strings that pandas_udf's eval-type inference
    # cannot resolve from this closure, so the eval type is passed
    # explicitly instead.
    # Dense-padding budget: the masked fold pads a chunk to
    # (rows × max_len) int64 cells.  2^24 cells = 128 MB — one very long
    # document in a 10k-row Arrow batch can no longer balloon the matrix
    # to gigabytes (round-8 ADVICE): rows are length-sorted and folded in
    # chunks that each respect the budget, so a skewed batch degrades to
    # more (small) chunks instead of one huge allocation.
    cell_budget = 1 << 24

    def _fold_chunk(arrs, lens, idx, np):
        ml = max(int(lens[idx].max()), 1)
        mat = np.zeros((len(idx), ml), dtype=np.int64)
        for r, i0 in enumerate(idx):
            a = arrs.iloc[int(i0)]
            mat[r, : len(a)] = a
        sub = np.zeros(len(idx), dtype=np.int64)
        sublens = lens[idx]
        for j in range(ml):
            m = sublens > j
            sub[m] = (sub[m] * KR_BASE + mat[m, j]) % P31
        return sub

    def kr31(s):
        nulls = s.isna()
        arrs = s.fillna("").apply(
            lambda x: np.frombuffer(
                x.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
        )
        lens = arrs.apply(len).to_numpy()
        n = len(s)
        acc = np.zeros(n, dtype=np.int64)
        if n:
            ml_all = int(lens.max())
            if n * max(ml_all, 1) <= cell_budget:
                # Common case: whole batch fits the budget — one matrix.
                acc = _fold_chunk(arrs, lens, np.arange(n), np)
            else:
                order = np.argsort(lens, kind="stable")
                start = 0
                while start < n:
                    end = start + 1
                    ml = int(lens[order[start]])
                    # Ascending lengths: the candidate's length IS the
                    # chunk max, so the budget check is exact.
                    while (
                        end < n
                        and max(ml, int(lens[order[end]]))
                        * (end - start + 1)
                        <= cell_budget
                    ):
                        ml = max(ml, int(lens[order[end]]))
                        end += 1
                    idx = order[start:end]
                    acc[idx] = _fold_chunk(arrs, lens, idx, np)
                    start = end
        out = pd.Series(acc, index=s.index, dtype="Int64")
        out[nulls] = pd.NA
        return out

    return F.pandas_udf(kr31, LongType())
