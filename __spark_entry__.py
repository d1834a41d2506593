"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 and
the north-star set; ``oracle_sql()`` provides the DuckDB twins.
Implementation lives in ``aprs2influxdb_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aprs2influxdb_spark.queries import q_time_bucket_agg, registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tumbling time-bucket aggregation over the event
    stream table (the InfluxDB-style query model the reference's
    pipeline existed to serve, SURVEY.md §1.3)."""
    return q_time_bucket_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: builder for name, (builder, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_builder, sql) in registry().items() if sql is not None}
