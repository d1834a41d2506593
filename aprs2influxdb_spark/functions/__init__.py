from aprs2influxdb_spark.functions.scalars import (
    aprs_passcode,
    escape_text,
    heartbeat_line,
    num_field,
    path_field,
    telemetry_poly,
    text_field,
)
from aprs2influxdb_spark.functions.hashing import portable_hash64, minhash_expr

__all__ = [
    "escape_text",
    "text_field",
    "num_field",
    "path_field",
    "telemetry_poly",
    "heartbeat_line",
    "aprs_passcode",
    "portable_hash64",
    "minhash_expr",
]
