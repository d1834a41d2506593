"""Portable approximate-distinct sketches.

The reference engine exposes no sketches (aprs2influxdb __main__.py is
row-at-a-time serialization); these are part of the LLM-data-pipeline
surface.  Engine-native HLL (``F.approx_count_distinct``) remains the
production fast path (tested for error bounds in
tests/test_robustness.py), but its sketch is engine-specific so it can
never be oracle-checked.  The KMV (k-minimum-values / bottom-k) sketch
here is *cross-engine deterministic*: both Spark and DuckDB hash keys
through the shared md5-based :func:`portable_hash64`, keep the k
smallest distinct hash values per group, and apply the same IEEE-double
estimator — identical results bit-for-bit, so the driver's value-hash
gate passes while the semantics stay genuinely approximate
(error ~ 1/sqrt(k-2)).

Scale shape (100 TB): the ``row_number() <= k`` rank filter triggers
Spark's WindowGroupLimit pushdown (partial bottom-k per map task before
the shuffle), so each group moves at most k rows per input partition —
no per-group full sort materializes.  One shuffle for the distinct, one
for the window; the final groupBy reuses the window's hash partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aprs2influxdb_spark.functions.hashing import portable_hash64, portable_hash64_sql

# portable_hash64 yields 15 hex chars = 60 bits; the KMV estimator
# normalizes the k-th smallest hash by this hash-space size.
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key_col: str = "user_id",
    group_cols: Sequence[str] = ("event_type",),
    k: int = 64,
    out_col: str = "approx_users",
) -> DataFrame:
    """Approximate distinct ``key_col`` per group via a bottom-k sketch.

    Estimator: with fewer than k distinct hashes the count is exact;
    otherwise ``floor((k-1) * 2^60 / kth_smallest_hash)``.  All
    arithmetic is IEEE-double in a fixed order, so DuckDB running
    :func:`kmv_distinct_sql` produces identical values.
    """
    groups = list(group_cols)
    h = portable_hash64(F.col(key_col).cast("string"))
    distinct = df.select(*groups, h.alias("h")).distinct()
    w = Window.partitionBy(*groups).orderBy(F.col("h").asc())
    bottom_k = distinct.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    est: Column = (
        F.when(F.count("*") < k, F.count("*"))
        .otherwise(
            F.floor(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.max("h").cast("double")).cast("long")
        )
        .alias(out_col)
    )
    return bottom_k.groupBy(*groups).agg(est)


def kmv_distinct_sql(
    table: str = "events",
    key_expr: str = "user_id::VARCHAR",
    group_cols: Sequence[str] = ("event_type",),
    k: int = 64,
    out_col: str = "approx_users",
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same estimator)."""
    groups = ", ".join(group_cols)
    return f"""
WITH kmv_hashes AS (
  SELECT DISTINCT {groups}, {portable_hash64_sql(key_expr)} AS h
  FROM {table}
), kmv_ranked AS (
  SELECT {groups}, h,
         row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
  FROM kmv_hashes
)
SELECT {groups},
       CASE WHEN count(*) < {k} THEN count(*)
            ELSE CAST(floor({float(k - 1)!r} * {HASH_SPACE!r} / CAST(max(h) AS DOUBLE)) AS BIGINT)
       END AS {out_col}
FROM kmv_ranked
WHERE rn <= {k}
GROUP BY {groups}
"""


def hll_distinct(
    df: DataFrame,
    key_col: str = "user_id",
    group_cols: Sequence[str] = ("event_type",),
    rsd: float = 0.01,
    out_col: str = "approx_users",
) -> DataFrame:
    """Engine-native HyperLogLog++ distinct — the production fast path
    (no md5, denser sketch).  Not oracle-checkable: DuckDB's
    approx_count_distinct uses a different sketch, so values
    legitimately differ; error bounds are pinned in
    tests/test_robustness.py instead."""
    return (
        df.groupBy(*group_cols)
        .agg(F.approx_count_distinct(key_col, rsd).alias(out_col))
    )


def sampled_percentiles(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "event_id",
    group_cols: Sequence[str] = ("event_type",),
    k: int = 256,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate per-group percentiles from a DETERMINISTIC uniform
    sample: the bottom-``k`` rows by portable hash of the (unique) row
    key form the sample — reproducible across runs, engines, and
    retries, unlike ``rand()``- or t-digest-based sketches — and each
    requested quantile is the exact lower-rank order statistic of the
    sampled values (no interpolation arithmetic, so the emitted value
    is a REAL data point both engines select identically).

    Scale shape: identical to :func:`kmv_distinct` — the rank filter
    triggers WindowGroupLimit partial bottom-k per map task, so at
    most k rows per group per input partition cross the wire; the
    per-group sample (≤ k doubles) then aggregates in one pass.
    Sampling error ~ O(1/sqrt(k)) on quantile rank."""
    groups = list(group_cols)
    h = portable_hash64(F.col(key_col).cast("string"))
    w = Window.partitionBy(*groups).orderBy(F.col("h").asc())
    sampled = (
        df.select(*groups, F.col(value_col).alias("v"), h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    agg = sampled.groupBy(*groups).agg(
        F.sort_array(F.collect_list("v")).alias("vals"),
        F.count("*").alias("n_sample"),
    )
    cols = [F.col(c) for c in groups] + [F.col("n_sample")]
    for p in probs:
        idx = (F.floor((F.col("n_sample") - 1) * F.lit(p)).cast("int") + 1)
        cols.append(F.element_at("vals", idx).alias(f"p{int(p * 100)}"))
    return agg.select(*cols)


def sampled_percentiles_sql(
    table: str = "events",
    value_col: str = "value",
    key_expr: str = "event_id::VARCHAR",
    group_cols: Sequence[str] = ("event_type",),
    k: int = 256,
    probs: Sequence[float] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB twin of :func:`sampled_percentiles` (same hash-sample,
    same order statistics)."""
    groups = ", ".join(group_cols)
    picks = ",\n       ".join(
        f"vals[CAST(floor((n_sample - 1) * {p}) AS INT) + 1] AS p{int(p * 100)}"
        for p in probs
    )
    return f"""
WITH hashed AS (
  SELECT {groups}, {value_col} AS v, {portable_hash64_sql(key_expr)} AS h
  FROM {table}
), ranked AS (
  SELECT {groups}, v,
         row_number() OVER (PARTITION BY {groups} ORDER BY h) AS rn
  FROM hashed
), agg AS (
  SELECT {groups}, list(v ORDER BY v) AS vals, count(*) AS n_sample
  FROM ranked WHERE rn <= {k} GROUP BY {groups}
)
SELECT {groups}, n_sample,
       {picks}
FROM agg
"""
