"""Compute-density partitioning helpers.

Spark sizes scan partitions by BYTES (``spark.sql.files.
maxPartitionBytes``, splittable only at parquet row-group boundaries).
That is the right model for IO-bound stages, but stages whose cost is
per-ROW CPU — an md5 per token, higher-order-function folds over
arrays, regex chains, a Levenshtein DP — inherit that byte-based
parallelism: a corpus that is small in bytes but expensive per row
lands on one or two cores while the rest of the cluster idles.  At
sf0.1 every documents/embeddings scan is a single row group, so every
signature/score/quality stage ran SERIALLY (measured: the SRP-bucket
pair stage of ``cosine_near_dup`` on one core of 32).

``spread_for_compute`` is the explicit fix: round-robin the narrow
input of a compute-dense stage to the cluster's core count.  It is a
no-op whenever the upstream already has that much parallelism — on a
1000-executor cluster reading 100 TB the scan arrives with thousands
of partitions and no shuffle is added; on a byte-small input the
shuffle moves only the projected columns the stage actually needs.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


_SUFFIXES = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}


def _parse_bytes(v: str) -> int:
    """Spark byte-config strings: bare bytes ('134217728'), bare-b
    ('134217728b' — what Spark's own defaultValueString emits), and
    k/m/g/t/p with optional trailing b ('128m', '1gb')."""
    v = v.strip().lower()
    if v.endswith("b"):
        v = v[:-1]
    if v and v[-1] in _SUFFIXES:
        return int(float(v[:-1])) * _SUFFIXES[v[-1]]
    return int(v)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Scan-partition estimate from the plan's input files — a cheap
    (~20 ms) logical-plan walk, vs ~100 ms of RDD conversion for
    ``df.rdd.getNumPartitions()``.  ``None`` when the plan has no
    statable file inputs (in-memory fixtures, checkpoints, remote
    object stores).

    Mirrors Spark's own packing model (FilePartition): small files are
    PACKED together, each padded by ``openCostInBytes`` — 100 × 1 MB
    files are ~4 scan partitions, not 100, so ``max(len(files), …)``
    would wrongly skip the spread in exactly the many-small-files
    layout it exists for."""
    files = df.inputFiles()
    if not files:
        return None
    total = 0
    for f in files:
        path = urlparse(f).path if "://" in f else f
        total += os.path.getsize(path)  # OSError -> caller's fallback
    conf = df.sparkSession.conf
    maxpb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    par = df.sparkSession.sparkContext.defaultParallelism
    padded = total + len(files) * open_cost
    # Spark's maxSplitBytes: fill the cores unless that would drop
    # below openCost or exceed maxPartitionBytes
    max_split = min(maxpb, max(open_cost, padded // max(par, 1)))
    return max(1, -(-padded // max_split))


def spread_for_grouped_compute(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition on the group keys to ``defaultParallelism`` with
    an EXPLICIT partition count, immediately before
    ``groupBy(keys).applyInPandas``: the grouped exchange is elided
    (the child's HashPartitioning already satisfies the clustered
    distribution) and an explicit user repartition is exempt from AQE
    partition coalescing.  Without this, a byte-small shuffle collapses
    to 1–2 post-AQE partitions and every Python group runs SERIALLY
    through one Arrow worker (measured: a noop applyInPandas over 600k
    rows / 150 groups took 6.3 s on 2 of 32 cores; ~1 s spread).  On a
    real cluster defaultParallelism is the cluster core count, and the
    repartition replaces — not adds to — the groupBy's own exchange."""
    from pyspark.sql import functions as F

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, *[F.col(k) for k in keys])


def spread_stream_for_compute(df: DataFrame) -> DataFrame:
    """Streaming twin of :func:`spread_for_compute` (round 11): round-
    robin the NARROW projection feeding a per-row-expensive stream
    stage (MinHash signatures, SRP projections, codec decodes) to the
    cluster's core count.  A file-source micro-batch inherits the same
    byte-based split model as a batch scan, so a single-file table
    (one row group) arrives as ONE partition and the signature stage
    of every ingest gate ran serially (measured: the LSH gate spent
    ~2.5 s of its 3.9 s in the one-core signature stage at sf0.1).

    Unconditional, unlike the batch helper: a stream's per-batch
    partitioning is not statable from the driver (``inputFiles``/
    ``rdd`` are batch-only).  The exchange this adds carries only the
    projected columns — O(micro-batch bytes) — and on a real cluster
    ``defaultParallelism`` is the cluster core count, so the shuffle
    is the cheap proxy move that lets the expensive stage use every
    core (guide §2.3 "shuffle keys and metadata instead of payloads").
    Call it on the narrowest projection the stage needs."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` IF its current plan
    yields fewer partitions — call on the narrow projection feeding a
    per-row-expensive stage, after selecting only the columns that
    stage needs (the shuffle then carries the minimum bytes)."""
    if df.isStreaming:
        # no-op on streams: inputFiles()/rdd are batch-only, and
        # micro-batch parallelism is the source's concern — this keeps
        # every pure-projection operator streaming-transparent
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        est = _estimated_scan_partitions(df)
    except Exception:
        est = None
    if est is None:
        est = df.rdd.getNumPartitions()
    if est >= par:
        return df
    return df.repartition(par)
