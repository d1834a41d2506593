"""P1-P9 / D1-D5 golden line-protocol tests (SURVEY.md §2.3, §5.2).

Every fixture row is compared byte-for-byte against the pure-Python
oracle, plus a few fully hand-typed goldens as an independent check.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aprs2influxdb_spark.operators.calibration import with_effective_equations
from aprs2influxdb_spark.operators.projections import to_line_protocol
from aprs2influxdb_spark.schema import OUTPUT_FORMATS
from aprs2influxdb_spark.sources.fixtures import fixture_packets, fixture_rows
from tests.reference_oracle import expected_line


@pytest.fixture(scope="module")
def lines_by_from(spark):
    df = with_effective_equations(fixture_packets(spark))
    out = to_line_protocol(df, eqns_col="eqns_effective")
    rows = out.select("from_call", "ingest_ts", "line").collect()
    return {(r["from_call"], r["ingest_ts"].second): r["line"] for r in rows}


def _channels_for(rows, idx):
    """latest prior tEQNS for rows[idx]'s sender, as {a,b,c} dicts."""
    me = rows[idx]
    eqns = None
    for r in rows[: idx + 1]:
        if r.get("from_call") == me.get("from_call") and r.get("tEQNS") is not None:
            eqns = r["tEQNS"]
    if eqns is None:
        return None
    return [{"a": e[0], "b": e[1], "c": e[2]} for e in eqns]


def test_dispatch_drops_unknown_and_telemetry_message(spark, lines_by_from):
    # D2 (:83-84) + telemetry-message no-emit (:1058)
    keys = set(lines_by_from)
    assert ("X1XXX", 14) not in keys
    assert ("K9IDL", 15) not in keys
    assert ("KC3DEF", 5) not in keys  # the telemetry-message row
    assert len(keys) == 12  # 15 fixtures - 2 telemetry-message - 1 unknown


def test_all_rows_match_python_oracle(lines_by_from):
    rows = fixture_rows()
    checked = 0
    for i, row in enumerate(rows):
        exp = expected_line(row, _channels_for(rows, i))
        if exp is None:
            continue
        got = lines_by_from[(row["from_call"], i + 1)]
        assert got == exp, f"row {i + 1} ({row['format']}): \n got {got!r}\n exp {exp!r}"
        checked += 1
    assert checked == 12


def test_handtyped_goldens(lines_by_from):
    assert lines_by_from[("KB1LQC", 1)] == (
        "packet,format=uncompressed "
        "latitude=42.287,longitude=-71.806,posambiguity=0,altitude=100.5,"
        'speed=25.0,course=180.0,from="KB1LQC",to="APRS",messagecapable="True",'
        'phg="5130",rng="20",via="WIDE1-1",path="WIDE1-1,WIDE2-2",'
        'comment="hello world",raw="KB1LQC>APRS:=4217.22N/07148.38W-test",'
        'symbol="-",symbol_table="/",raw_timestamp="092345z"'
    )
    assert lines_by_from[("W2GSB", 2)] == (
        "packet,format=beacon "
        'from="W2GSB",to="BEACON",via="WIDE2-1",path="WIDE2-1",'
        'text="back\\\\slash \\"quote\\" \\\'single\\\' Z?rich ?",'
        'raw="W2GSB>BEACON:>a\\\\b\\"c\\\'d"'
    )
    # empty-string handling: plain keys keep "", escaped fields drop, empty path emits
    assert lines_by_from[("N0CALL", 3)] == (
        'packet,format=uncompressed latitude=10.0,longitude=20.0,'
        'from="N0CALL",to="APRS",via="",path=""'
    )
    # identity scaling before equations arrive (:117-125)
    assert lines_by_from[("KC3DEF", 4)].endswith(
        "seq=5,bits=10101010,analog1=1.0,analog2=2.0,analog3=3.0,analog4=4.0,analog5=5.0"
    )
    # scaled by the eqns received in between (a*v^2+b*v+c, :129-133)
    assert lines_by_from[("KC3DEF", 6)].endswith(
        "seq=6,bits=10101010,analog1=6.0,analog2=2.0,analog3=3.0,analog4=4.0,analog5=49.0"
    )


def test_line_protocol_plan_is_narrow(spark):
    # the projection itself must not shuffle (SURVEY §4): only the
    # calibration window may introduce an exchange
    df = to_line_protocol(fixture_packets(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_every_output_format_covered():
    assert {r["format"] for r in fixture_rows()} - {"third-party", "telemetry-message"} == set(OUTPUT_FORMATS)


def test_short_equation_channel_dead_letters(spark):
    """A 1-coefficient calibration channel raised IndexError in the
    reference (:157-159) and dropped the packet — it must dead-letter,
    not emit a hybrid of sender-a and identity-b/c."""
    from aprs2influxdb_spark.operators.projections import malformed_predicate
    from pyspark.sql import functions as F

    rows = [
        ("uncompressed", [[2.0]] * 5, {"seq": 1, "bits": "1", "vals": [1.0] * 5}),
        ("uncompressed", [[0.0, 1.0, 0.0]] * 5, {"seq": 2, "bits": "1", "vals": [1.0] * 5}),
    ]
    df = spark.createDataFrame(
        rows,
        "format string, eq array<array<double>>, telemetry struct<seq:long,bits:string,vals:array<double>>",
    )
    flags = [r[0] for r in df.select(malformed_predicate(F.col("eq")).alias("m")).collect()]
    assert flags == [True, False]
