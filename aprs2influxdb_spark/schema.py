"""Canonical wide APRS packet schema (SURVEY.md §1.1, FIXTURES.md §1).

The reference processes dynamically-keyed dicts with per-format key
whitelists (every access guarded by ``if key in jsonData``, e.g.
aprs2influxdb/__main__.py:253,262,266). The key space is closed — each
of the ten parsers enumerates its keys literally (:248-249 etc.) — so
the engine models optionality as a fixed StructType with nullable
columns, not a MapType. Nested ``telemetry`` (:105-133), ``weather``
(whitelist :181) and ``tEQNS`` (:150-160) keep their structure as
Spark nested types so Parquet nested-schema pruning applies.

``from``/``to`` are reserved-ish words; the engine names the columns
``from_call``/``to_call`` and maps them at the serializer boundary so
emitted line protocol still says ``from=``/``to=`` (parity with :249).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Dispatch targets, aprs2influxdb/__main__.py:42-81.  Anything else is
# dropped (D2, :83-84).
KNOWN_FORMATS = [
    "uncompressed",
    "mic-e",
    "object",
    "compressed",
    "status",
    "wx",
    "beacon",
    "bulletin",
    "message",
    "telemetry-message",
]

# Formats that produce an output row ("telemetry-message" only updates
# calibration state and emits nothing, :979-993 + guard :1058).
OUTPUT_FORMATS = [f for f in KNOWN_FORMATS if f != "telemetry-message"]

WEATHER_KEYS = [
    # whitelist at :181 (parseWeather), 9 numeric keys
    "humidity",
    "pressure",
    "rain_1h",
    "rain_24h",
    "rain_since_midnight",
    "temperature",
    "wind_direction",
    "wind_gust",
    "wind_speed",
]

TELEMETRY_TYPE = StructType(
    [
        StructField("seq", LongType(), True),       # :109
        StructField("bits", StringType(), True),    # :112
        StructField("vals", ArrayType(DoubleType()), True),  # :129-133, len 5
    ]
)

WEATHER_TYPE = StructType([StructField(k, DoubleType(), True) for k in WEATHER_KEYS])

# tEQNS: list of [a, b, c] numeric triples, one per telemetry channel (:150-160)
EQNS_TYPE = ArrayType(ArrayType(DoubleType()))

PACKET_SCHEMA = StructType(
    [
        StructField("format", StringType(), True),
        StructField("from_call", StringType(), True),   # "from" in reference (:249)
        StructField("to_call", StringType(), True),     # "to"
        StructField("via", StringType(), True),
        StructField("path", ArrayType(StringType()), True),  # :1040 (list of hops)
        StructField("raw", StringType(), True),
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
        StructField("posambiguity", IntegerType(), True),
        StructField("altitude", DoubleType(), True),
        StructField("speed", DoubleType(), True),
        StructField("course", DoubleType(), True),
        StructField("timestamp", LongType(), True),     # epoch s (:454, :542, :642)
        StructField("raw_timestamp", StringType(), True),
        StructField("wx_raw_timestamp", StringType(), True),
        StructField("messagecapable", BooleanType(), True),  # text field in reference (:249)
        StructField("symbol", StringType(), True),
        StructField("symbol_table", StringType(), True),
        StructField("phg", StringType(), True),
        StructField("rng", StringType(), True),
        StructField("comment", StringType(), True),
        StructField("gpsfixstatus", IntegerType(), True),  # :642
        StructField("mbits", IntegerType(), True),         # :351
        StructField("mtype", StringType(), True),
        StructField("daodatumbyte", StringType(), True),
        StructField("alive", BooleanType(), True),         # text field in reference (:455)
        StructField("object_format", StringType(), True),
        StructField("object_name", StringType(), True),
        StructField("status", StringType(), True),         # :563
        StructField("text", StringType(), True),           # :815 (beacon)
        StructField("message_text", StringType(), True),   # :882, :956
        StructField("bid", LongType(), True),              # :864
        StructField("identifier", StringType(), True),     # :888
        StructField("msgNo", LongType(), True),            # :938
        StructField("addresse", StringType(), True),       # sic, reference spelling :939
        StructField("response", StringType(), True),       # :962
        StructField("telemetry", TELEMETRY_TYPE, True),
        StructField("weather", WEATHER_TYPE, True),
        StructField("tEQNS", EQNS_TYPE, True),
        # engine-added: the reference emits no timestamp so InfluxDB stamps
        # server receive time (:305 has measurement+tags+fields only);
        # ingest_ts reproduces that, event time stays in `timestamp`.
        StructField("ingest_ts", TimestampType(), True),
    ]
)

PACKET_COLUMNS = [f.name for f in PACKET_SCHEMA.fields]
