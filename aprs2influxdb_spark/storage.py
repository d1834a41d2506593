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
    """Write the canonical packet table partitioned for pruning.

    Shuffle keys are (date, format, salt(from_call)): every
    (date, format) directory receives at most ``files_per_partition``
    files — one per salt bucket — while the shuffle itself spreads over
    the full ``spark.sql.shuffle.partitions`` width (passing a *number*
    to ``repartition`` would cap the whole write at that many tasks —
    4 tasks for 100 TB).  The within-partition sort leads with the
    partition columns: the dynamic-partition writer requires that
    prefix, and omitting it makes Spark insert its own sort on just
    (date, format), which survives small in-memory runs by TimSort
    stability but destroys the from_call clustering once the sort
    spills and merges runs.
    """
    salt = F.pmod(F.xxhash64("from_call"), F.lit(files_per_partition))
    (
        packets.withColumn("ingest_date", F.to_date("ingest_ts"))
        .repartition(F.col("ingest_date"), F.col("format"), salt)
        .sortWithinPartitions("ingest_date", "format", "from_call", "ingest_ts")
        .write.partitionBy("ingest_date", "format")
        .mode("overwrite")
        .parquet(path)
    )


def read_packets(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
