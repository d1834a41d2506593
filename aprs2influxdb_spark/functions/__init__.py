from aprs2influxdb_spark.functions.scalars import (
    aprs_passcode,
    double_str,
    escape_text,
    heartbeat_line,
    num_field,
    path_field,
    telemetry_poly,
    text_field,
)
from aprs2influxdb_spark.functions.hashing import hashed_shingles, portable_hash64

__all__ = [
    "escape_text",
    "text_field",
    "num_field",
    "double_str",
    "path_field",
    "telemetry_poly",
    "heartbeat_line",
    "aprs_passcode",
    "portable_hash64",
    "hashed_shingles",
]
