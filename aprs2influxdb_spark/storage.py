"""Packet table storage layout (SURVEY.md §4 "Predicate pushdown").

The reference's only indexed dimension is the ``format`` tag (:242,
:447-448 — tagging by sender was considered and rejected), and every
downstream query filters by tag + time range.  The engine's layout
makes both predicates *partition* predicates:

    packets/ingest_date=YYYY-MM-DD/format=<f>/part-*.parquet

- date first: time-range queries prune whole days before listing;
- format second: the 10-way tag filter prunes files, not rows;
- within files, rows are sorted by ``from_call`` so per-sender
  queries and the calibration window read clustered data and parquet
  min/max row-group stats prune senders.

At 100 TB this is the difference between a metadata operation and a
full scan.  ``format`` has 10 values and date is bounded, so the
partition count stays sane (10 × days) — no small-file explosion; the
``repartition`` before write bounds files per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_packets(packets: DataFrame, path: str, files_per_partition: int = 4) -> None:
    """Write the canonical packet table partitioned for pruning."""
    (
        packets.withColumn("ingest_date", F.to_date("ingest_ts"))
        .repartition(files_per_partition, "ingest_date", "format", "from_call")
        .sortWithinPartitions("from_call", "ingest_ts")
        .write.partitionBy("ingest_date", "format")
        .mode("overwrite")
        .parquet(path)
    )


def read_packets(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
