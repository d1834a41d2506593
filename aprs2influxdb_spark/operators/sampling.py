"""Deterministic sampling / splitting for training-data pipelines
(north star; no analog in the reference — SURVEY §2.9).

Random sampling at 100 TB must be reproducible, resumable, and
shuffle-free — which rules out ``rand()`` (nondeterministic across
retries and executors).  Both operators key off the portable content
hash instead: the same row lands in the same split/sample on every
engine, every run, every retry, and adding new rows never reassigns
existing ones (the property that keeps train/val splits stable as a
corpus grows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aprs2influxdb_spark.functions.hashing import portable_hash64


def hash_split(
    df: DataFrame, id_col: str = "doc_id",
    splits: tuple = (("train", 95), ("val", 5)), salt: str = "split",
) -> DataFrame:
    """Assign each row to a named split by bucketing
    ``hash(salt || id) % total_weight`` — the standard deterministic
    train/val/test split.  Narrow projection, zero shuffles; split
    ratios hold in expectation per the hash's uniformity.

    ``splits`` is ((name, weight), ...) in priority order; ``salt``
    decorrelates independent splits of the same corpus.
    """
    total = sum(w for _name, w in splits)
    bucket = F.pmod(portable_hash64(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))), F.lit(total))
    edge = 0
    expr = None
    for name, w in splits:
        edge += w
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, n_per_group: int, group_col: str,
    id_col: str = "doc_id", salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified sample: the ``n_per_group`` rows with
    the smallest salted id-hash within each group — fixed-size
    per-stratum sampling (per language, per source, per label) that is
    reproducible and growth-stable like :func:`uniform_sample`.

    One shuffle on the group key, then a per-group ordered rank.  A
    hot stratum sorts ``its`` rows on one partition's spill path —
    at extreme skew, pre-filter with an approximate per-group hash
    threshold first so the window only ranks ~n_per_group survivors.
    """
    from pyspark.sql import Window

    h = portable_hash64(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("_h", h)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_h", "_rk")
    )


def uniform_sample(
    df: DataFrame, n: int, id_col: str = "doc_id", salt: str = "sample",
) -> DataFrame:
    """Deterministic uniform sample without replacement: the ``n``
    rows with the smallest salted id-hash.  Equivalent in distribution
    to a uniform draw, but reproducible and engine-portable.

    Physical plan is TakeOrderedAndProject (per-partition top-n, then
    a driver-side merge of n·partitions candidates) — no global sort,
    no full shuffle, which is what makes "sample 10k of 100 B rows"
    a cheap operation.
    """
    h = portable_hash64(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
    return df.withColumn("_h", h).orderBy(F.col("_h").asc(), F.col(id_col).asc()).limit(n).drop("_h")


def pack_sequences(
    df: DataFrame, target_tokens: int = 512, n_buckets: int = 8,
    group_col: str = "lang", id_col: str = "doc_id", text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chop sequence packing: lay documents end-to-end in a
    deterministic order and assign each to the fixed-size training
    window (``seq_id``) where it starts — the packing pass that turns
    a document corpus into equal-length training sequences.

    Scale shape: packing is a running sum, and a running sum over ONE
    global order is a single-partition window — so the corpus is first
    split into ``(group, bucket)`` lanes by salted content hash, and
    each lane packs independently.  Lanes are embarrassingly parallel,
    deterministic under retries (hash bucketing, no ``rand()``), and
    training-equivalent: any fixed document order is as good as any
    other.  ``start_tok``/``seq_id`` are exact-integer window math, so
    the oracle matches bit-for-bit."""
    from pyspark.sql import Window

    from aprs2influxdb_spark.operators.dedup import tokens_col

    bucket = F.pmod(
        portable_hash64(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))),
        F.lit(n_buckets),
    )
    w = (
        Window.partitionBy(group_col, "bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.select(
            F.col(id_col), F.col(group_col),
            bucket.alias("bucket"),
            F.size(tokens_col(text_col)).alias("n_tokens"),
        )
        .withColumn("start_tok", start)
        .withColumn("seq_id", F.floor(F.col("start_tok") / target_tokens).cast("long"))
    )


def lang_balance_sample(
    df: DataFrame, group_col: str = "lang", id_col: str = "doc_id",
    salt: str = "bal",
) -> DataFrame:
    """Temperature-balanced downsampling across groups (the
    multilingual rebalancing pass of a training-data pipeline):
    each group keeps rows at rate ``sqrt(n_min / n_group)`` — the
    T=2 temperature flattening of the group distribution, keeping
    the smallest group whole and square-root-damping the head.

    The keep decision is ``hash(salt || id) % 1e6 < floor(rate *
    1e6)`` — deterministic under retries, stable as the corpus grows,
    and exactly reproducible on the oracle engine: the rate is built
    only from exact integer group counts via IEEE-correctly-rounded
    ``/`` and ``sqrt`` (no cross-group float summation whose order
    could differ between engines).

    Plan shape: one tiny count aggregate (|groups| rows), broadcast
    back, then a narrow filter — the 100 TB cost is one scan plus a
    map-side-combined count shuffle of group keys only.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_g"))
    n_min = counts.agg(F.min("n_g").alias("n_min"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .select(
            group_col,
            F.floor(F.sqrt(F.col("n_min") / F.col("n_g")) * 1_000_000)
            .cast("long")
            .alias("keep_ppm"),
        )
    )
    h = F.pmod(
        portable_hash64(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))),
        F.lit(1_000_000),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(h < F.col("keep_ppm"))
        .select(F.col(id_col), F.col(group_col), F.col("keep_ppm"))
    )


def gumbel_topk_resample(
    scored: DataFrame, n: int = 100, weight_col: str = "dsir_w",
    id_col: str = "doc_id", salt: str = "gumbel",
) -> DataFrame:
    """Gumbel-top-k importance resampling — the SELECTION half of
    DSIR (Xie et al. 2023; composing with
    :func:`~aprs2influxdb_spark.operators.textanalysis.dsir_weights`
    completes the paper's pipeline): drawing k items WITHOUT
    replacement with probability ∝ exp(w) equals taking the top-k of
    ``w + Gumbel(0,1)`` (the Gumbel-max trick) — a global top-k, no
    sequential draw state, which is what makes importance sampling
    distributable at all.

    Determinism discipline: the Gumbel noise derives from the portable
    content hash (``u = (hash(salt||id) % 1e6 + 0.5) / 1e6``,
    ``g = -ln(-ln(u))``), so every engine/retry draws the identical
    noise — the :func:`hash_split` property — and the perturbed score
    is INTEGERIZED to micro-nats before ranking (ties broken on id),
    so cross-engine ordering is exact.  ``weight_col`` is already in
    micro-nats (dsir_w's convention).

    Scale shape: one narrow projection + one global top-n — and the
    rank filter is a WindowGroupLimit (partial top-n per map task
    crosses the wire, not the corpus)."""
    from pyspark.sql import Window

    u = (
        F.pmod(portable_hash64(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))), F.lit(1_000_000))
        .cast("double") + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    g_micro = F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5)).cast("long")
    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    return (
        scored.select(id_col, weight_col)
        .withColumn("score_micro", F.col(weight_col) + g_micro)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .select(id_col, "score_micro", "rk")
    )
