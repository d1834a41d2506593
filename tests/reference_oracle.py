"""Pure-Python oracle reproducing the reference's line-protocol output
for the wide-row fixture model (test-only; mirrors the semantics cited
in aprs2influxdb_spark.operators.projections, driven by the same
FORMAT_SPECS tables rather than nine copied parsers).

Used for byte-for-byte comparison against the Spark expression
pipeline over every fixture row.
"""

from __future__ import annotations

from aprs2influxdb_spark.operators.projections import _BOOL_COLS, _EMIT_NAME, FORMAT_SPECS
from aprs2influxdb_spark.schema import WEATHER_KEYS

IDENTITY = [{"a": 0.0, "b": 1.0, "c": 0.0} for _ in range(5)]


def _fmt_num(v) -> str:
    # Python str() of ints/floats — matches reference "{0}={1}".format
    return str(v)


def _escape(s: str) -> str:
    s = "".join(ch if ord(ch) < 128 else "?" for ch in s)
    s = s.replace("\\", "\\\\").replace("'", "\\'").replace('"', '\\"')
    return s


def _telemetry_fields(row: dict, channels) -> list[str]:
    out = []
    t = row.get("telemetry")
    if t is None:
        return out
    if t.get("seq") is not None:
        out.append("seq={0}".format(t["seq"]))
    if t.get("bits") is not None:
        out.append("bits={0}".format(t["bits"]))
    if t.get("vals") is not None:
        ch = channels if channels is not None else IDENTITY
        for i in range(5):
            v = t["vals"][i]
            val = ch[i]["a"] * v**2 + ch[i]["b"] * v + ch[i]["c"]
            out.append("analog{0}={1}".format(i + 1, float(val)))
    return out


def expected_line(row: dict, channels=None) -> str | None:
    """Line-protocol string for one wide fixture row, or None if the
    row emits nothing (unknown format / telemetry-message)."""
    fmt = row.get("format")
    spec = FORMAT_SPECS.get(fmt)
    if spec is None:
        return None
    fields: list[str] = []
    for k in spec.num_keys:
        if row.get(k) is not None:
            fields.append("{0}={1}".format(_EMIT_NAME.get(k, k), _fmt_num(row[k])))
    for k in spec.text_keys:
        if row.get(k) is not None:
            v = str(row[k]) if k in _BOOL_COLS else row[k]
            fields.append('{0}="{1}"'.format(_EMIT_NAME.get(k, k), v))
    if row.get("path") is not None:
        fields.append('path="{0}"'.format(",".join(row["path"])))
    for entry in spec.tail:
        if entry == "telemetry":
            fields.extend(_telemetry_fields(row, channels))
        elif entry == "weather":
            w = row.get("weather")
            if w is not None:
                for k in WEATHER_KEYS:
                    if w.get(k) is not None:
                        fields.append("{0}={1}".format(k, w[k]))
        else:
            _, k = entry
            v = row.get(k)
            if v is not None and len(v) > 0:
                fields.append('{0}="{1}"'.format(k, _escape(v)))
    return "packet,format=" + fmt + " " + ",".join(fields)
