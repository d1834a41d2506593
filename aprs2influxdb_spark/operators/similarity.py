"""Similarity search over embedding columns (north star).

``embeddings.embedding`` is ``array<float>``.  Brute-force cosine
top-k is the exactness baseline: a broadcast of the (small) query set
against the corpus — the corpus is never shuffled, the per-row work is
a codegen'd fold over the array, and top-k is a per-query window.  At
100 TB the scale path is ``lsh_bucketed_topk``: sign-random-projection
buckets cut the candidate set per query to its bucket's cohort, at
recall cost bounded by the number of hyperplanes; probing adjacent
buckets (Hamming-1) recovers most of it.  Hyperplane components are
derived from the portable md5 hash so the bucketing is deterministic
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aprs2influxdb_spark.functions.rounding import rhu

from aprs2influxdb_spark.functions.hashing import MINHASH_P


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    """Cosine similarity of two array<numeric> columns (JVM-side fold,
    no UDF)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for the given query ids: broadcast the query
    rows, score corpus-side, rank per query.

    Output: (query_id, neighbor_id, cos_sim) — k rows per query,
    deterministic tie-break on neighbor id.
    """
    from pyspark.sql import Window

    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", rhu(cosine(F.col("qv").cast("array<double>"), F.col("nv").cast("array<double>")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def hyperplane_component(plane: int, dim_idx, seed: int = 7):
    """Deterministic pseudo-random component in [-1, 1): derived from
    md5(plane||'_'||dim||'_'||seed) so DuckDB computes the identical
    hyperplane.  Column-valued in ``dim_idx``."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("_", F.lit(plane), dim_idx.cast("string"), F.lit(seed))), 1, 15), 16, 10
    ).cast("long")
    return (F.pmod(h, F.lit(2_000_000)) - F.lit(1_000_000)) / F.lit(1_000_000.0)


def srp_bucket(vec, n_planes: int = 8, seed: int = 7):
    """Sign-random-projection bucket id (0..2^n_planes-1) of an
    array<numeric> column — the LSH for cosine distance."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.transform(vec, lambda x, i: x.cast("double") * hyperplane_component(p, i, seed)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucketed_topk(
    emb: DataFrame, query_ids: list[int], k: int = 10, n_planes: int = 6,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
) -> DataFrame:
    """ANN top-k: score only corpus vectors in the query's SRP bucket.

    The corpus is bucketed once (narrow), the join key is the bucket
    id, and ranking stays per-query.  Recall < 1 by construction —
    this is the 100 TB path where brute force is the wrong plan.
    """
    from pyspark.sql import Window

    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), srp_bucket(F.col(vec_col), n_planes, seed).alias("bucket")
    )
    q = bucketed.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(bucketed.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", rhu(cosine(F.col("qv").cast("array<double>"), F.col("nv").cast("array<double>")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )
