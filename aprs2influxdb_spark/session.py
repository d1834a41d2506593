"""SparkSession factory tuned for the engine.

Local testing runs on ``local[N]`` but every knob here is chosen for the
100 TB / 1000-executor target: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), modest shuffle-partition default that
AQE coalesces down locally and scales up on a cluster, and Arrow enabled
so any Pandas-UDF path (multimodal decode, streaming state) is batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "aprs2influxdb_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # the two-stage line-protocol serializer stages ~50 field columns
        # beside the ~45 packet columns; the default maxFields=100 would
        # silently drop that projection out of whole-stage codegen
        .config("spark.sql.codegen.maxFields", "400")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()


def create_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> list[str]:
    """Register the tables as temp views (normalized like
    :func:`load_tables`) so the whole engine surface is reachable from
    ``spark.sql`` — the SQL-first face of the DataFrame API.  Returns
    the view names."""
    frames = load_tables(spark, sf_dir, tables)
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
    return sorted(frames)


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict:
    """Load the driver's parquet tables as DataFrames keyed by name,
    with the same ``events.ts`` normalization the query layer uses."""
    from aprs2influxdb_spark.queries import _t

    names = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {t: _t(spark, sf_dir, t) for t in names}
