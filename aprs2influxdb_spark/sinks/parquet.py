"""Exactly-once parquet sink for streaming pipelines.

Structured Streaming guarantees at-least-once delivery to
``foreachBatch``: after a crash the SAME micro-batch (same
``batch_id``) is replayed.  A plain ``mode("append")`` writer would
duplicate the replayed rows — the classic streaming-sink bug.  This
sink makes the write IDEMPOTENT instead: each micro-batch lands in
its own ``batch_id=N`` partition directory with ``mode("overwrite")``,
so a replay replaces its own partial output byte-for-byte and the
(checkpointed) batch id never commits twice.

This is the recipe Spark's own docs prescribe for exactly-once
``foreachBatch`` sinks (idempotent write keyed by batchId +
checkpointed offsets); the partition layout keeps the result a plain
readable parquet table (``batch_id`` surfaces as a partition column,
prunable like any other).

Scale notes: one directory per micro-batch is the natural unit for
downstream compaction (``storage.compact_packets``); the overwrite is
scoped to the single batch partition — never the table root — so
concurrent historical batches are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_batch_idempotent(batch_df: DataFrame, batch_id: int, path: str) -> None:
    """The foreachBatch body: scoped overwrite of this batch's own
    partition directory.  Safe to call any number of times with the
    same (batch_id, data) — the outcome is identical."""
    batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")


def parquet_sink(df: DataFrame, path: str, checkpoint: str, query_name: str = "parquet_sink"):
    """Attach the idempotent parquet sink to a streaming DataFrame.
    Returns the started StreamingQuery (caller awaits/steers it)."""
    return (
        df.writeStream.foreachBatch(
            lambda bdf, bid: write_batch_idempotent(bdf, bid, path)
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
