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


def _parse_bytes(v: str) -> int:
    v = v.strip().lower()
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(suffix + "b") or v.endswith(suffix):
            return int(float(v.rstrip("b").rstrip(suffix))) * mult
    return int(v)


def _estimated_scan_partitions(df: DataFrame) -> int | None:
    """Scan-partition estimate from the plan's input files — a cheap
    (~20 ms) logical-plan walk, vs ~100 ms of RDD conversion for
    ``df.rdd.getNumPartitions()``.  ``None`` when the plan has no
    statable file inputs (in-memory fixtures, checkpoints, remote
    object stores)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        path = urlparse(f).path if "://" in f else f
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    maxpb = _parse_bytes(df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    # each file contributes >= 1 partition; large files split by bytes
    # (an over-estimate when row groups are coarse, which only ever
    # SKIPS the repartition — never adds one a real cluster wouldn't)
    return max(len(files), -(-total // maxpb))


def spread_for_compute(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` IF its current plan
    yields fewer partitions — call on the narrow projection feeding a
    per-row-expensive stage, after selecting only the columns that
    stage needs (the shuffle then carries the minimum bytes)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    est = _estimated_scan_partitions(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est >= par:
        return df
    return df.repartition(par)
