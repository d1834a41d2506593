"""Pointer-jumping connected components — the log-round convergence
property the oracle gate can't express, plus the cross-paradigm
equality of graph sessionization against the window sessionizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aprs2influxdb_spark.operators.graph import connected_components, session_components


class TestConnectedComponents:
    def test_chain_converges_in_log_rounds(self, spark):
        """A 100-vertex path graph has diameter 99: plain min-label
        propagation needs 99 rounds; pointer jumping must label the
        whole chain with vertex 0 within 9 rounds (spread distance at
        least doubles per round)."""
        verts = spark.range(100).withColumnRenamed("id", "vid")
        edges = (
            spark.range(99)
            .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        )
        out = connected_components(verts, edges, max_iter=9).collect()
        assert len(out) == 100
        assert all(r["component_id"] == 0 for r in out)

    def test_raises_when_rounds_exhausted(self, spark):
        """Non-convergence must be loud: with max_iter=2 a 100-chain
        cannot finish (2 rounds reach spread ~4), and silent partial
        labels would split the component."""
        verts = spark.range(100).withColumnRenamed("id", "vid")
        edges = spark.range(99).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(verts, edges, max_iter=2)

    def test_multiple_components_and_singletons(self, spark):
        """Two components plus isolated vertices: labels are each
        component's min id; singletons label themselves."""
        verts = spark.range(10).withColumnRenamed("id", "vid")
        # component {0,1,2} (triangle), component {5,6} — 3,4,7,8,9 isolated
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (5, 6)], "src long, dst long"
        )
        got = {
            r["vid"]: r["component_id"]
            for r in connected_components(verts, edges, max_iter=6).collect()
        }
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}

    def test_star_topology_one_round_family(self, spark):
        """A star (hub 0) converges fast regardless of size — the easy
        topology; guards against a regression that would penalize it."""
        verts = spark.range(50).withColumnRenamed("id", "vid")
        edges = spark.range(1, 50).select(
            F.lit(0).alias("src"), F.col("id").alias("dst")
        )
        out = connected_components(verts, edges, max_iter=3).collect()
        assert all(r["component_id"] == 0 for r in out)


class TestSessionComponents:
    def test_equals_window_sessionizer(self, spark, sf_dir):
        """Cross-paradigm check mirrored by the DuckDB oracle: CC over
        the gap graph == lag+running-sum sessionization, Spark-side."""
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = {
            (r["session_root"], r["n_events"])
            for r in session_components(events).collect()
        }
        w = "(PARTITION BY user_id ORDER BY ts, event_id)"
        want = {
            (r["session_root"], r["n_events"])
            for r in events.select(
                "event_id",
                "user_id",
                "ts",
                F.expr(
                    f"CASE WHEN ts - lag(ts) OVER {w} > INTERVAL '30' MINUTE "
                    "THEN 1 ELSE 0 END"
                ).alias("new_sess"),
            )
            .select(
                "event_id",
                "user_id",
                F.expr(
                    f"sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
                    "ROWS UNBOUNDED PRECEDING)"
                ).alias("grp"),
            )
            .groupBy("user_id", "grp")
            .agg(
                F.min("event_id").alias("session_root"),
                F.count("*").alias("n_events"),
            )
            .collect()
        }
        assert got == want

    def test_gap_boundary_is_exclusive(self, spark):
        """Exactly-30-minute gaps stay in ONE session on both engines
        (the sessionizer splits on strictly-greater)."""
        rows = [
            (1, 7, "2024-01-01 00:00:00"),
            (2, 7, "2024-01-01 00:30:00"),   # exactly 30 min: same session
            (3, 7, "2024-01-01 01:00:01"),   # 30 min 1 s: new session
        ]
        events = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            (r["session_root"], r["n_events"])
            for r in session_components(events).collect()
        }
        assert got == {(1, 2), (3, 1)}
