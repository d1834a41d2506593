"""Skew-safe aggregation (SURVEY §4 scale discipline as an operator).

A straight ``groupBy(key).count()`` over a power-law key sends every
row of the heaviest key through ONE reducer — at 100 TB a single
hot key (the empty referer, the null user, the boilerplate shingle)
serializes the stage however many executors exist.  Salting is the
standard fix: shard each key into ``n_salts`` sub-keys, partially
aggregate the (key, salt) shards — at most ``n_salts`` rows per key
cross the second shuffle — then fold the shards.  AQE's skew-join
splitting does this for JOINS automatically; for aggregations the
partial-agg map-side combine usually suffices, but a combine-hostile
aggregate (exact distinct, collect_list) or an extreme key still
needs the explicit shard stage, which is what this operator provides.

The salt derives from the portable content hash of the WHOLE ROW's
identity column, not ``rand()`` — deterministic across engines,
retries, and resubmissions (the ``sampling.hash_split`` discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aprs2influxdb_spark.functions.hashing import portable_hash64


def salted_counts(
    df: DataFrame, key_col: str, id_col: str, n_salts: int = 32,
    salt_tag: str = "salt",
) -> DataFrame:
    """Per-key row counts through an explicit two-phase salted plan:
    shard on ``pmod(hash(tag || id), n_salts)``, count per
    (key, salt), then sum shards per key.  Result is EXACTLY
    ``groupBy(key).count()`` (the oracle runs the plain GROUP BY);
    the value is the plan shape — the second shuffle carries at most
    ``n_salts`` rows per key however skewed the data, pinned by the
    plan gate in tests/test_plans.py."""
    salt = F.pmod(
        portable_hash64(F.concat(F.lit(salt_tag + "_"), F.col(id_col).cast("string"))),
        F.lit(n_salts),
    )
    shards = (
        df.select(F.col(key_col), salt.alias("_salt"))
        .groupBy(key_col, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return shards.groupBy(key_col).agg(F.sum("_c").alias("n"))
