"""Portable deterministic hashing for dedup / MinHash / SimHash.

Spark's ``hash``/``xxhash64`` have no DuckDB twin, so every dedup
operator that must be oracle-checkable hashes through md5 instead:
both engines agree byte-for-byte on ``md5(utf8(string))``, and the
first 15 hex chars parse into a non-negative int64 (60 bits) on both
sides.  All MinHash/SimHash constants are generated here from a fixed
LCG so the Spark plan and the generated DuckDB oracle SQL share them.

At 100 TB this path stays fully vectorized JVM-side (md5/conv are
codegen'd); md5 is ~2× slower than xxhash64 but only the oracle-checked
variants pay it — `portable=False` switches to xxhash64 for production.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus small enough that a*h+b never overflows int64 (a,b < 2^31,
# h < P < 2^31  =>  a*h+b < 2^62).
MINHASH_P = 1_000_000_007

# Shingle hashing: Horner base/modulus over per-token hashes.  P is the
# smallest prime > 2^32, so acc*BASE + h stays < 2^40 — no int64
# overflow on either engine (Spark ANSI mode would make overflow fatal).
SHINGLE_BASE = 131
SHINGLE_P = 4_294_967_311


def hashed_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word-n-gram shingle hashes (array<long>) via Horner
    combination of per-token portable hashes — shingle *strings* are
    never materialized.  Building ``slice``+``array_join`` strings and
    md5-ing each one was the dominant cost of every shingle-based dedup
    op (~3.7 s of a 5 s query at sf0.1); one md5 per token plus long
    arithmetic per shingle is ~4× cheaper and has an exact DuckDB twin
    (:func:`hashed_shingles_sql`).

    Tokens past the end of short docs hash as 0 (coalesce), mirroring
    the reference semantics of "shingle = whatever tokens remain".

    The token-hash array is *let-bound* by wrapping it in a one-element
    ``transform(array(th), h -> ...)``: Spark expressions have no
    let-binding, and referencing the raw ``th`` expression from inside
    the per-index lambda re-evaluates every token's md5 for every
    shingle index — O(L²) hashing per document, measured as an ~18×
    slowdown of the whole pipeline at sf0.1.  The lambda variable ``h``
    is evaluated once per row.
    """
    return F.array_distinct(positional_shingles(tokens, n))


def positional_shingles(tokens: Column, n: int = 3) -> Column:
    """Per-position word-n-gram shingle hashes (array<long>, one entry
    per start position, duplicates KEPT in document order) — the
    positional substrate :func:`hashed_shingles` distincts away, needed
    by winnowing (fingerprints are (position, hash) pairs).  Same
    Horner combination, let-binding trick, and coalesce-to-0 tail
    semantics — see :func:`hashed_shingles`."""
    th = F.transform(tokens, lambda t: F.pmod(portable_hash64(t), F.lit(SHINGLE_P)))

    def _over(h: Column) -> Column:
        def _shingle(i: Column) -> Column:
            acc = F.coalesce(F.get(h, i), F.lit(0))
            for k in range(1, n):
                acc = F.pmod(acc * SHINGLE_BASE + F.coalesce(F.get(h, i + k), F.lit(0)), F.lit(SHINGLE_P))
            return acc

        idx = F.sequence(F.lit(0), F.greatest(F.size(h) - n, F.lit(0)))
        return F.transform(idx, _shingle)

    return F.get(F.transform(F.array(th), _over), 0)


def token_hashes_sql(tokens_expr: str) -> str:
    """DuckDB twin of the per-token hash list feeding
    :func:`hashed_shingles`; alias it ``h`` in a CTE and pass ``"h"``
    to :func:`hashed_shingles_sql`."""
    return f"list_transform({tokens_expr}, t -> ({portable_hash64_sql('t')}) % {SHINGLE_P})"


def hashed_shingles_sql(h: str = "h", n: int = 3) -> str:
    """DuckDB twin of :func:`hashed_shingles` over a precomputed token-
    hash list column ``h`` (1-based list indexing)."""
    return f"list_distinct({positional_shingles_sql(h, n)})"


def positional_shingles_sql(h: str = "h", n: int = 3) -> str:
    """DuckDB twin of :func:`positional_shingles` (duplicates kept,
    document order)."""
    acc = f"coalesce({h}[i + 1], 0)"
    for k in range(1, n):
        acc = f"(({acc}) * {SHINGLE_BASE} + coalesce({h}[i + 1 + {k}], 0)) % {SHINGLE_P}"
    return (
        f"list_transform("
        f"range(0, greatest(len({h}) - {n}, 0) + 1), "
        f"i -> {acc})"
    )


def _lcg(seed: int):
    state = seed
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        yield state


def minhash_coeffs(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs shared by Spark plan and oracle SQL."""
    gen = _lcg(seed)
    out = []
    for _ in range(num_hashes):
        a = next(gen) % (MINHASH_P - 1) + 1
        b = next(gen) % MINHASH_P
        out.append((a, b))
    return out


def portable_hash64(col: Column | str) -> Column:
    """Non-negative int64 hash identical in Spark and DuckDB.

    Spark:  conv(substr(md5(x),1,15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash64` (takes a SQL expression)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


