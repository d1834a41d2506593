"""Scalar function library (SURVEY.md §2.4, F1-F8).

Every function returns a Spark ``Column`` built from native expressions
only — zero Python UDFs — so the whole serializer path stays inside
whole-stage codegen (SURVEY §4).  Citations are into
``/root/reference/aprs2influxdb/__main__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def escape_text(col: Column | str) -> Column:
    """F1 ``parseTextString`` core (:996-1029) as an expression.

    Semantics reproduced:
      1. ASCII transliteration — each non-ASCII character becomes ``?``
         (Py2 ``encode('ascii','replace')``, README.md:17).
      2. Escape ``\\`` -> ``\\\\`` FIRST, then ``'`` -> ``\\'``, then
         ``"`` -> ``\\"`` (order is semantic, :1009-1012 — escaping
         quotes first would double-escape the added backslashes).

    Divergence (documented, SURVEY §7.4.4): the reference's
    UnicodeError path has a latent NameError (:1017-1024, unbound
    ``textStr``); the engine never raises — the regexp transliteration
    is total.  Null/empty input passes through unchanged (callers gate
    on length, D4).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[^\x00-\x7F]", "?")
    # F.replace is literal (no regex/replacement-string escaping pitfalls)
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit("'"), F.lit("\\'"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    return c


def text_field(name: str, col: Column | str, escape: bool = False) -> Column:
    """F4/F1 wrap: ``name="value"`` (:257-259), null when value is null
    or empty (D4 empty-string suppression, :268 etc.).

    Only F1-routed fields (comment/status/text/message_text/raw …) are
    escaped AND empty-suppressed (``if len(...) > 0``, :268 etc.);
    plain text-key fields are emitted verbatim and presence-gated only
    (``if key in jsonData``, :257-259 — an empty string still emits
    ``key=""``).  Parity quirks preserved.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    if escape:
        return F.when(F.length(c) > 0, F.concat(F.lit(name + '="'), escape_text(c), F.lit('"')))
    return F.when(c.isNotNull(), F.concat(F.lit(name + '="'), c, F.lit('"')))


def double_str(c: Column) -> Column:
    """Python-``str``-compatible rendering of a double column.

    Java's double→string switches to scientific notation at |v| ≥ 1e7
    ("4.0E7") where Python prints plain digits up to 1e16
    ("40000000.0") — and calibrated analogs (a·v²) reach that range.
    Integral doubles below 1e16 (Python's own plain/scientific cutoff;
    doubles are integer-exact to 2^53 ≈ 9e15) format via ``%.1f``;
    everything else uses the native shortest-digits cast, which matches
    Python in the normal range.  Residual divergence (non-integral
    |v| ≥ 1e7 or < 1e-3, anything ≥ 1e16) is accepted — APRS field
    values don't live there.
    """
    integral = (c == F.floor(c)) & (F.abs(c) < F.lit(1e16))
    return F.when(integral, F.format_string("%.1f", c)).otherwise(c.cast("string"))


def num_field(name: str, col: Column | str, double: bool = False) -> Column:
    """F3 numeric serializer ``name=value`` (:252-254).

    The reference emits numbers verbatim with no ``i`` suffix, so every
    number lands in InfluxDB as a float (SURVEY §1.3).  The engine keeps
    native numeric types until this serializer.  Null propagates (key
    absent ⇒ field absent, D5).  Pass ``double=True`` for double-typed
    columns so large integral values render Python-style (see
    :func:`double_str`); int/long columns cast plainly ("0", not "0.0",
    matching Python int str).
    """
    c = F.col(col) if isinstance(col, str) else col
    s = double_str(c) if double else c.cast("string")
    return F.when(c.isNotNull(), F.concat(F.lit(name + "="), s))


def bool_text_field(name: str, col: Column | str) -> Column:
    """Booleans serialized as *text* fields (messagecapable :249,
    alive :455) — ``name="True"`` / ``name="False"`` with Python
    capitalization for byte parity with str(bool)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.when(c == True, "True").when(c == False, "False")  # noqa: E712
    return F.when(c.isNotNull(), F.concat(F.lit(name + '="'), s, F.lit('"')))


def path_field(col: Column | str = "path") -> Column:
    """F2 ``parsePath`` (:1032-1044): digipeater hop list comma-joined,
    wrapped ``path="a,b,c"``.  Deliberately NOT routed through F1
    escaping, and NOT empty-suppressed — an empty present list emits
    ``path=""`` (parsePath is called unconditionally on key presence,
    :268-269 analog; parity quirks, SURVEY §7.4.4).  Null ⇒ absent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.concat(F.lit('path="'), F.array_join(c, ","), F.lit('"')))


def telemetry_poly(val: Column, a: Column, b: Column, c: Column) -> Column:
    """F7 telemetry polynomial ``a*v^2 + b*v + c`` (:130-133)."""
    return a * val * val + b * val + c


def heartbeat_line(callsign: Column | str, ts: Column) -> Column:
    """F6 heartbeat status formatter (:1113-1117):
    ``{call}>APRS,TCPIP*:>aprs2influxdb heartbeat {unix_ts}``."""
    call = F.lit(callsign) if isinstance(callsign, str) else callsign
    return F.concat(call, F.lit(">APRS,TCPIP*:>aprs2influxdb heartbeat "), ts.cast("long").cast("string"))


def aprs_passcode(callsign: str) -> int:
    """F8 APRS-IS passcode (:1178 delegates to aprslib.passcode).

    Public APRS-IS algorithm: 15-bit XOR hash over the uppercased base
    callsign.  Plain Python — only the live connector needs it, never a
    row-wise operation.
    """
    base = callsign.split("-")[0].upper()
    code = 0x73E2
    for i, ch in enumerate(base):
        if i % 2 == 0:
            code ^= ord(ch) << 8
        else:
            code ^= ord(ch)
    return code & 0x7FFF
