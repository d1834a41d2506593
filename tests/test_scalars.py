"""F1-F8 scalar function tests (SURVEY.md §2.4) incl. escape-order
fidelity (§7.4.1) and property tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aprs2influxdb_spark.functions.scalars import (
    aprs_passcode,
    escape_text,
    heartbeat_line,
    num_field,
    path_field,
    telemetry_poly,
    text_field,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _escape_py(s: str) -> str:
    s = "".join(ch if ord(ch) < 128 else "?" for ch in s)
    return s.replace("\\", "\\\\").replace("'", "\\'").replace('"', '\\"')


class TestEscapeText:
    def test_backslash_before_quotes(self, spark):
        # order is semantic (:1009-1012): escaping quotes first would
        # double-escape the backslashes added for quotes
        assert _one(spark, escape_text(F.lit('a"b'))) == 'a\\"b'
        assert _one(spark, escape_text(F.lit("a'b"))) == "a\\'b"
        assert _one(spark, escape_text(F.lit("a\\b"))) == "a\\\\b"
        assert _one(spark, escape_text(F.lit('\\"'))) == '\\\\\\"'

    def test_non_ascii_to_question_mark(self, spark):
        assert _one(spark, escape_text(F.lit("Zürich ☂"))) == "Z?rich ?"

    @settings(max_examples=25, deadline=None)
    @given(st.text(max_size=40))
    def test_matches_python_semantics(self, spark, s):
        assert _one(spark, escape_text(F.lit(s))) == _escape_py(s)


class TestFieldSerializers:
    def test_num_field(self, spark):
        df = spark.createDataFrame([(1.5,), (None,)], "x double")
        vals = [r["f"] for r in df.select(num_field("x", "x").alias("f")).collect()]
        assert vals == ["x=1.5", None]

    def test_text_field_plain_keeps_empty(self, spark):
        df = spark.createDataFrame([("",), ("hi",), (None,)], "x string")
        vals = [r["f"] for r in df.select(text_field("x", "x").alias("f")).collect()]
        assert vals == ['x=""', 'x="hi"', None]

    def test_text_field_escaped_suppresses_empty(self, spark):
        df = spark.createDataFrame([("",), ('a"b',), (None,)], "x string")
        vals = [r["f"] for r in df.select(text_field("x", "x", escape=True).alias("f")).collect()]
        assert vals == [None, 'x="a\\"b"', None]

    def test_path_field(self, spark):
        df = spark.createDataFrame([(["a", "b", "c"],), ([],), (None,)], "path array<string>")
        vals = [r["f"] for r in df.select(path_field("path").alias("f")).collect()]
        # empty present list emits path="" (parsePath called on presence)
        assert vals == ['path="a,b,c"', 'path=""', None]

    def test_path_not_escaped(self, spark):
        df = spark.createDataFrame([(['W"1', "W\\2"],)], "path array<string>")
        assert df.select(path_field("path").alias("f")).collect()[0]["f"] == 'path="W"1,W\\2"'


class TestPolynomialAndMisc:
    def test_telemetry_poly(self, spark):
        got = _one(spark, telemetry_poly(F.lit(5.0), F.lit(2.0), F.lit(0.0), F.lit(-1.0)))
        assert got == 49.0

    def test_heartbeat_line(self, spark):
        got = _one(spark, heartbeat_line("KB1LQC", F.lit(1704067200)))
        assert got == "KB1LQC>APRS,TCPIP*:>aprs2influxdb heartbeat 1704067200"

    def test_passcode_known_values(self):
        # public APRS-IS algorithm test vectors
        assert aprs_passcode("KB1LQC") == 22703
        assert aprs_passcode("kb1lqc-1") == 22703  # case/SSID insensitive
        assert aprs_passcode("N0CALL") == 13023


class TestDoubleStr:
    def test_large_integral_stays_plain(self, spark):
        from aprs2influxdb_spark.functions.scalars import double_str

        df = spark.createDataFrame([(4.0e7,), (25.0,), (100.5,), (-0.0,)], "v double")
        got = [r[0] for r in df.select(double_str(F.col("v")).alias("s")).collect()]
        # Java cast would emit "4.0E7"; Python str emits "40000000.0"
        assert got == ["40000000.0", "25.0", "100.5", "-0.0"]

    def test_int_columns_not_floatified(self, spark):
        from aprs2influxdb_spark.functions.scalars import num_field

        df = spark.createDataFrame([(0,)], "posambiguity int")
        got = df.select(num_field("posambiguity", "posambiguity").alias("s")).collect()[0][0]
        assert got == "posambiguity=0"  # reference: Python int str, no ".0"


class TestDtw:
    def test_reference_recurrence(self):
        from aprs2influxdb_spark.operators.similarity import dtw_distance_py

        # identical series -> 0; pure shift -> len * shift under L1
        assert dtw_distance_py([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]) == 0.0
        assert dtw_distance_py([0.0, 0.0], [1.0, 1.0]) == 2.0
        # classic elasticity: a phase-shifted bump aligns cheaply
        assert dtw_distance_py([0, 1, 0, 0], [0, 0, 1, 0]) == 0.0

    def test_spark_matches_reference_exactly(self, spark, sf_dir):
        """The Pandas-UDF operator (no SQL oracle possible) is pinned
        against the pure-Python DP driver-side: same profiles, same
        distances after identical rounding, same top-k ranking."""
        import math

        from aprs2influxdb_spark.operators.similarity import dtw_distance_py, dtw_topk
        from aprs2influxdb_spark.queries import hourly_profiles

        profiles = {
            r["user_id"]: list(r["profile"])
            for r in hourly_profiles(spark, sf_dir).collect()
        }
        got = {
            (r["query_id"], r["rk"]): (r["neighbor_id"], r["dtw_dist"])
            for r in dtw_topk(
                hourly_profiles(spark, sf_dir), [0, 1, 2], k=3,
                id_col="user_id", vec_col="profile",
            ).collect()
        }
        for qid in [0, 1, 2]:
            scored = sorted(
                (
                    (math.floor(dtw_distance_py(profiles[qid], v) * 1e6 + 0.5) / 1e6, nid)
                    for nid, v in profiles.items()
                    if nid != qid
                ),
            )[:3]
            for rk, (dist, nid) in enumerate(scored, start=1):
                assert got[(qid, rk)] == (nid, dist)


class TestLttb:
    def test_reference_properties(self):
        from aprs2influxdb_spark.operators.timeseries import lttb_indices_py

        ts = list(range(100))
        vs = [0.0] * 100
        vs[57] = 100.0  # lone spike must survive
        keep = lttb_indices_py(ts, vs, 10)
        assert len(keep) == 10 and keep[0] == 0 and keep[-1] == 99
        assert 57 in keep
        assert keep == sorted(set(keep))  # strictly increasing
        # short series pass through untouched
        assert lttb_indices_py(ts[:5], vs[:5], 10) == [0, 1, 2, 3, 4]

    def test_spark_matches_reference_exactly(self, spark, sf_dir):
        """applyInPandas LTTB pinned against the reference selection
        computed on the same Arrow-decoded values, with the same
        (ts, event_id) tie-break sort the operator applies."""
        import pandas as pd

        from aprs2influxdb_spark.operators.timeseries import (
            lttb_downsample,
            lttb_indices_py,
        )
        from aprs2influxdb_spark.queries import _t

        got = {
            (r["user_id"], r["ts"], r["value"])
            for r in lttb_downsample(_t(spark, sf_dir, "events"), n_out=20).collect()
        }
        pdf = (
            _t(spark, sf_dir, "events")
            .select("user_id", "event_id", "ts", "value")
            .toPandas()
        )
        exp = set()
        for uid, g in pdf.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
            ts_us = (g["ts"].astype("int64") // 1000).tolist()
            vs = g["value"].astype(float).tolist()
            for i in lttb_indices_py(ts_us, vs, 20):
                exp.add((uid, g["ts"][i].to_pydatetime(), float(g["value"][i])))
        assert got == exp


class TestZOrderKey:
    def test_interleave_matches_python_mirror(self, spark):
        """zorder_key must equal the textbook bit-interleave for every
        (a, b) — pinned against a pure-Python mirror over a grid +
        hypothesis-style randoms."""
        import random

        from aprs2influxdb_spark.storage import zorder_key

        def mirror(a, b, bits):
            z = 0
            for i in range(bits):
                z |= ((a >> i) & 1) << (2 * i)
                z |= ((b >> i) & 1) << (2 * i + 1)
            return z

        rng = random.Random(7)
        pts = [(a, b) for a in range(0, 8) for b in range(0, 8)]
        pts += [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(50)]
        df = spark.createDataFrame(pts, "a long, b long")
        got = {
            (r["a"], r["b"]): r["z"]
            for r in df.select("a", "b", zorder_key("a", "b", 16).alias("z")).collect()
        }
        for a, b in pts:
            assert got[(a, b)] == mirror(a, b, 16), (a, b)

    def test_locality_monotone_blocks(self, spark):
        """Aligned power-of-two blocks are CONTIGUOUS z-ranges: every
        key in block (a_hi, b_hi) of size 2^k × 2^k lies in one
        [lo, lo + 4^k) interval — the property file-level min/max
        pruning relies on."""
        from aprs2influxdb_spark.storage import zorder_key

        pts = [(a, b) for a in range(16) for b in range(16)]
        df = spark.createDataFrame(pts, "a long, b long")
        keys = {
            (r["a"], r["b"]): r["z"]
            for r in df.select("a", "b", zorder_key("a", "b", 4).alias("z")).collect()
        }
        k = 2  # 4x4 blocks
        for ba in range(4):
            for bb in range(4):
                block = [keys[(a, b)] for a in range(ba * 4, ba * 4 + 4)
                         for b in range(bb * 4, bb * 4 + 4)]
                assert max(block) - min(block) == 4 ** k - 1
                assert min(block) % (4 ** k) == 0


class TestSampledPercentiles:
    def test_quantiles_are_real_sample_points_and_ordered(self, spark, sf_dir):
        """Each emitted quantile must be an actual data value of its
        group, and p50 <= p90 <= p99."""
        from aprs2influxdb_spark.operators.sketches import sampled_percentiles

        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = sampled_percentiles(e).collect()
        assert out
        vals = {
            r["event_type"]: {float(x["value"]) for x in
                              e.filter(F.col("event_type") == r["event_type"])
                              .select("value").collect()}
            for r in out
        }
        for r in out:
            assert r["p50"] <= r["p90"] <= r["p99"]
            for p in ("p50", "p90", "p99"):
                assert float(r[p]) in vals[r["event_type"]]
