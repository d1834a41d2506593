"""Physical-plan quality gates (SURVEY.md §4): these tests pin the
*plan shape*, not just results — pushdown reaching the parquet scan,
column pruning, broadcast strategy on dim joins, partial aggregation,
whole-stage codegen, partition pruning on the packet table layout.
A regression here is a 100 TB incident, not a wrong answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aprs2influxdb_spark.queries import (
    q_pricing_summary,
    q_region_revenue,
    q_token_counts,
    q_cosine_topk,
)
from aprs2influxdb_spark.operators.projections import to_line_protocol
from aprs2influxdb_spark.sources.fixtures import fixture_packets
from aprs2influxdb_spark.storage import read_packets, write_packets


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestScanQuality:
    def test_filter_pushdown_reaches_parquet(self, spark, sf_dir):
        plan = _plan(q_pricing_summary(spark, sf_dir))
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan

    def test_column_pruning(self, spark, sf_dir):
        plan = _plan(q_token_counts(spark, sf_dir))
        # only the two needed columns reach the scan
        assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan

    def test_aggregation_is_partial_then_final(self, spark, sf_dir):
        plan = _plan(q_pricing_summary(spark, sf_dir))
        assert plan.count("HashAggregate") >= 2  # map-side combine present

    def test_whole_stage_codegen_on_serializer(self, spark, tmp_path):
        # a LocalTableScan (createDataFrame) skips codegen; the real path
        # is parquet-backed, so assert over that
        path = str(tmp_path / "pk")
        fixture_packets(spark).write.parquet(path)
        plan = _plan(to_line_protocol(spark.read.parquet(path)))
        # executedPlan toString marks codegen stages with "*(n)"; the
        # serializer Project must carry one (array_compact would rewrite
        # to a higher-order ArrayFilter and lose it)
        assert plan.startswith("*(")


class TestJoinStrategy:
    def test_dims_broadcast_in_q5(self, spark, sf_dir):
        plan = _plan(q_region_revenue(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_topk_broadcasts_queries_not_corpus(self, spark, sf_dir):
        plan = _plan(q_cosine_topk(spark, sf_dir))
        # the corpus is never shuffled for scoring; queries ride broadcast
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestPacketTableLayout:
    @pytest.fixture(scope="class")
    def packet_path(self, spark, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("pk") / "packets")
        write_packets(fixture_packets(spark), path)
        return path

    def test_partition_pruning_by_format(self, spark, packet_path):
        df = read_packets(spark, packet_path).filter(F.col("format") == "wx")
        plan = _plan(df)
        assert "PartitionFilters: [isnotnull(format" in plan
        assert df.count() == 1  # only the wx partition was read

    def test_partition_pruning_by_date(self, spark, packet_path):
        df = read_packets(spark, packet_path).filter(
            F.col("ingest_date") == "2024-01-01"
        )
        assert "PartitionFilters: [isnotnull(ingest_date" in _plan(df)

    def test_roundtrip_preserves_rows(self, spark, packet_path):
        assert read_packets(spark, packet_path).count() == 15
