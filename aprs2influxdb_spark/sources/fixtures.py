"""Deterministic APRS packet fixtures (FIXTURES.md §1 edge cases).

The reference ships no tests (SURVEY.md §5), so golden expectations are
hand-derived from the cited parser code.  ``packets_df`` builds the
canonical wide DataFrame from plain dict rows, mirroring what a decode
stage (S2) would produce from aprslib-parsed JSON.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession

from aprs2influxdb_spark.schema import PACKET_COLUMNS, PACKET_SCHEMA


def _ts(i: int) -> _dt.datetime:
    return _dt.datetime(2024, 1, 1, 0, 0, i, tzinfo=_dt.timezone.utc)


def packets_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """dict rows (subset of PACKET_COLUMNS keys) -> wide packets DF."""
    tuples = [tuple(r.get(c) for c in PACKET_COLUMNS) for r in rows]
    return spark.createDataFrame(tuples, PACKET_SCHEMA)


def fixture_rows() -> list[dict]:
    """Edge-case rows per FIXTURES.md §1: every format, escaping, empty
    suppression, telemetry before/after equations, unknown format."""
    return [
        # 1: plain uncompressed, all common fields
        dict(format="uncompressed", from_call="KB1LQC", to_call="APRS", via="WIDE1-1",
             path=["WIDE1-1", "WIDE2-2"], raw="KB1LQC>APRS:=4217.22N/07148.38W-test",
             latitude=42.287, longitude=-71.806, posambiguity=0, altitude=100.5,
             speed=25.0, course=180.0, messagecapable=True, phg="5130", rng="20",
             comment="hello world", symbol="-", symbol_table="/",
             raw_timestamp="092345z", ingest_ts=_ts(1)),
        # 2: escaping: backslash first, quotes, non-ASCII -> '?'
        dict(format="beacon", from_call="W2GSB", to_call="BEACON", via="WIDE2-1",
             path=["WIDE2-1"], raw='W2GSB>BEACON:>a\\b"c\'d',
             text='back\\slash "quote" \'single\' Zürich ☂', ingest_ts=_ts(2)),
        # 3: empty strings suppressed on escaped fields, kept on plain text keys
        dict(format="uncompressed", from_call="N0CALL", to_call="APRS", via="",
             path=[], raw="", latitude=10.0, longitude=20.0, comment="", ingest_ts=_ts(3)),
        # 4: telemetry with NO prior equations -> identity scaling
        dict(format="uncompressed", from_call="KC3DEF", to_call="APRS", via="WIDE1-1",
             path=["WIDE1-1"], raw="KC3DEF>APRS:T#005,1,2,3,4,5",
             telemetry={"seq": 5, "bits": "10101010", "vals": [1.0, 2.0, 3.0, 4.0, 5.0]},
             ingest_ts=_ts(4)),
        # 5: equation update for KC3DEF (emits nothing itself)
        dict(format="telemetry-message", from_call="KC3DEF",
             tEQNS=[[1.0, 2.0, 3.0], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0], [2.0, 0.0, -1.0]],
             ingest_ts=_ts(5)),
        # 6: telemetry AFTER equations -> scaled by row 5's eqns
        dict(format="uncompressed", from_call="KC3DEF", to_call="APRS", via="WIDE1-1",
             path=["WIDE1-1"], raw="KC3DEF>APRS:T#006,1,2,3,4,5",
             telemetry={"seq": 6, "bits": "10101010", "vals": [1.0, 2.0, 3.0, 4.0, 5.0]},
             ingest_ts=_ts(6)),
        # 7: mic-e
        dict(format="mic-e", from_call="KD2GSB", to_call="T2SP0W", via="WIDE1-1",
             path=["WIDE1-1", "WIDE2-1"], raw="KD2GSB>T2SP0W:`c_Vl!Xv/`\"4A}",
             latitude=40.723, longitude=-73.987, posambiguity=0, altitude=20.0,
             speed=0.0, course=240.0, mbits=110, mtype="M0: Off Duty",
             daodatumbyte="W", comment="mic-e unit", symbol="v", symbol_table="/",
             ingest_ts=_ts(7)),
        # 8: object with timestamp
        dict(format="object", from_call="WB2OSZ", to_call="APRS", via="WIDE2-2",
             path=["WIDE2-2"], raw="WB2OSZ>APRS:;LEADER   *092345z4903.50N/07201.75W>",
             latitude=49.058, longitude=-72.029, posambiguity=0, speed=5.0, course=90.0,
             timestamp=1704067200, altitude=300.0, alive=True, object_format="uncompressed",
             object_name="LEADER", rng="10", daodatumbyte="", comment="on the move",
             symbol=">", symbol_table="/", raw_timestamp="092345z", ingest_ts=_ts(8)),
        # 9: status
        dict(format="status", from_call="KB2ICI", to_call="APRS", via="WIDE1-1",
             path=["WIDE1-1"], raw="KB2ICI>APRS:>Net Control Center",
             timestamp=1704067260, status="Net Control Center", raw_timestamp="092345z",
             ingest_ts=_ts(9)),
        # 10: compressed with weather subset
        dict(format="compressed", from_call="KF6HJO", to_call="APRS", via="WIDE2-1",
             path=["WIDE2-1"], raw="KF6HJO>APRS:=/5L!!<*e7>7P[",
             latitude=34.086, longitude=-118.149, gpsfixstatus=1, altitude=10.0,
             speed=36.2, course=88.0, timestamp=1704067320, messagecapable=False,
             phg="", comment="compressed pkt",
             weather={"temperature": 22.5, "humidity": 65.0, "pressure": 1013.2},
             symbol="[", symbol_table="/", ingest_ts=_ts(10)),
        # 11: wx with full weather
        dict(format="wx", from_call="CW0003", to_call="APRS", via="TCPIP*",
             path=["TCPIP*"], raw="CW0003>APRS:_10090556c220s004g005t077",
             comment="weather station", wx_raw_timestamp="10090556",
             weather={"humidity": 50.0, "pressure": 1010.1, "rain_1h": 0.0,
                      "rain_24h": 2.5, "rain_since_midnight": 1.0, "temperature": 25.0,
                      "wind_direction": 220.0, "wind_gust": 5.0, "wind_speed": 4.0},
             ingest_ts=_ts(11)),
        # 12: bulletin
        dict(format="bulletin", from_call="N8DEU", to_call="BLN3", via="WIDE2-2",
             path=["WIDE2-2"], raw="N8DEU>APRS::BLN3     :Snow expected",
             bid=3, message_text="Snow expected", identifier="BLN3", ingest_ts=_ts(12)),
        # 13: message with msgNo + addresse (sic)
        dict(format="message", from_call="WB4APR", to_call="APRS", via="WIDE1-1",
             path=["WIDE1-1"], raw="WB4APR>APRS::N0CALL   :Hello{001",
             msgNo=1, addresse="N0CALL", message_text="Hello", response="ack",
             ingest_ts=_ts(13)),
        # 14: unknown format -> dropped (D2)
        dict(format="third-party", from_call="X1XXX", raw="X1XXX>APRS:}...", ingest_ts=_ts(14)),
        # 15: telemetry-message for a sender that never sends data (state only)
        dict(format="telemetry-message", from_call="K9IDL",
             tEQNS=[[0.0, 5.0, 1.0]] * 5, ingest_ts=_ts(15)),
    ]


def fixture_packets(spark: SparkSession) -> DataFrame:
    return packets_df(spark, fixture_rows())
