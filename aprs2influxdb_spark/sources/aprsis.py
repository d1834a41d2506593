"""APRS-IS streaming source (SURVEY.md §2.1 S1/S2, §2.7 K2).

Reference: ``aprslib.IS`` TCP login + immortal consumer thread
(:1088-1098, :1178-1196) delivering parsed dicts; a second thread
sends a heartbeat status packet upstream every ``interval`` minutes
(:1101-1121).  Engine: a PySpark Python Data Source
(``spark.readStream.format("aprsis")``) whose simple stream reader

- connects and logs in with ``user CALL pass PASSCODE vers ...``
  (passcode from functions.scalars.aprs_passcode, F8),
- consumes raw frames (server comment lines starting '#' skipped),
- reconnects on socket errors (the reference's ``immortal=True``),
- sends the F6-format heartbeat on its own timer thread — keep-alive
  belongs to the connection, not the data plane (SURVEY §3.3),
- emits (raw, ingest_ts) rows; decode to the wide packet schema is a
  separate stage (S2 below), mirroring the reference's aprslib
  library boundary.

Frame decode implements the public APRS 1.01 grammar for all ten
reference formats — status '>' (± timestamp), message/bulletin/
telemetry-definition ':', uncompressed '!'/'='/'/' /'@' (± timestamp,
course/speed, PHG/RNG, /A= altitude, !DAO!), base-91 compressed,
Mic-E '`'/''', object ';', positionless weather '_', telemetry data
'T#', third-party '}' (tagged for the D2 drop), anything else ->
beacon — so the live feed exercises every projection without
aprslib; unparsable frames dead-letter.
"""

from __future__ import annotations

import datetime as _dt
import re
import socket
import threading
import time
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from aprs2influxdb_spark.functions.scalars import aprs_passcode
from aprs2influxdb_spark.schema import PACKET_SCHEMA

RAW_SCHEMA = "raw string, ingest_ts timestamp"


class AprsISStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.host = options.get("host", "rotate.aprs.net")
        self.port = int(options.get("port", 10152))  # full feed (README.md:52,61)
        self.callsign = options.get("callsign", "NOCALL")
        self.interval_s = float(options.get("heartbeat_seconds", 15 * 60))  # :23
        self.max_batch = int(options.get("max_frames_per_batch", 10000))
        self._sock: socket.socket | None = None
        self._buf = bytearray()
        self._lock = threading.Lock()
        self._hb: threading.Thread | None = None

    def __getstate__(self) -> dict:
        # the reader is pickled to executors for offset replay; live
        # connection objects stay driver-side (replay returns nothing
        # anyway — see readBetweenOffsets)
        state = self.__dict__.copy()
        state.update(_sock=None, _buf=bytearray(), _lock=None, _hb=None)
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        self._lock = threading.Lock()

    # -- connection management (immortal reconnect, :1098) ------------
    def _connect(self) -> None:
        self._close()
        s = socket.create_connection((self.host, self.port), timeout=30)
        passcode = aprs_passcode(self.callsign)
        s.sendall(f"user {self.callsign} pass {passcode} vers aprs2influxdb-spark 0.1\r\n".encode())
        # short read timeout bounds each recv so the micro-batch
        # deadline holds; reading goes through an explicit byte buffer
        # (NOT socket.makefile — its internal buffer is documented to go
        # inconsistent when a timeout fires mid-read, dropping partial
        # frames)
        s.settimeout(1.0)
        self._sock = s
        self._buf = bytearray()
        if self._hb is None:
            self._hb = threading.Thread(target=self._heartbeat_loop, daemon=True)
            self._hb.start()

    def _close(self) -> None:
        try:
            if self._sock is not None:
                self._sock.close()
        except OSError:
            pass
        self._sock = None
        self._buf = bytearray()

    def _readline(self) -> bytes:
        """One CRLF-terminated frame from the buffer, recv-ing as
        needed.  TimeoutError propagates with the partial frame intact
        in the buffer; empty recv means the peer closed (EOF)."""
        while b"\n" not in self._buf:
            data = self._sock.recv(4096)
            if not data:
                raise OSError("EOF from APRS-IS")
            self._buf.extend(data)
        line, _, rest = bytes(self._buf).partition(b"\n")
        self._buf = bytearray(rest)
        return line

    def _heartbeat_loop(self) -> None:
        # F6 formatter (:1113-1117); fire-and-forget like the reference
        while True:
            time.sleep(self.interval_s)
            with self._lock:
                sock = self._sock
            if sock is None:
                continue
            try:
                ts = int(time.time())
                line = f"{self.callsign}>APRS,TCPIP*:>aprs2influxdb heartbeat {ts}\r\n"
                # sendall on the raw socket: the buffered file object is
                # not safe against the consumer's blocking readline
                sock.sendall(line.encode())
            except OSError:
                pass  # next read() reconnects

    # -- SimpleDataSourceStreamReader contract -------------------------
    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows: list[tuple] = []
        deadline = time.time() + 1.0
        while len(rows) < self.max_batch and time.time() < deadline:
            try:
                if self._sock is None:
                    self._connect()
                raw = self._readline()
                text = raw.decode("utf-8", errors="replace").rstrip("\r\n")
                if not text or text.startswith("#"):
                    continue  # server comments / login ack
                rows.append((text, _dt.datetime.now(_dt.timezone.utc)))
            except TimeoutError:
                # idle feed is NOT a dead connection: keep it (tearing
                # down on idle is a reconnect storm against the APRS-IS
                # server) and re-check the batch deadline
                continue
            except OSError:
                self._close()
                time.sleep(0.2)  # immortal: retry within budget
        return iter(rows), {"n": start["n"] + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay unsupported for a live socket (reference is at-most-
        # once here too); exactly-once applies downstream of the source
        return iter(())

    def commit(self, end: dict) -> None:
        pass


class AprsISDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "aprsis"

    def schema(self) -> str:
        return RAW_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> AprsISStreamReader:
        return AprsISStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(AprsISDataSource)


# ---------------------------------------------------------------------
# S2: frame decode (public APRS 1.01 grammar, all 10 reference formats)
# ---------------------------------------------------------------------
# The reference delegates decode to aprslib (`__main__.py:1098`,
# raw=False) and only ever reads the dict keys its parsers whitelist
# (SURVEY §1.1); these decoders implement the same public APRS 1.01
# grammar for those keys, with aprslib's unit conventions: speed km/h
# (knots × 1.852), altitude m (feet × 0.3048), temperature °C,
# wind m/s (mph × 0.44704), rain mm (0.01 in × 0.254), pressure mbar.

_HEADER = re.compile(r"^([A-Za-z0-9\-]{1,9})>([^,:]+)((?:,[^,:]+)*):(.*)$", re.DOTALL)
_POS = re.compile(
    r"^(\d{2}[\d ]{2}\.[\d ]{2})([NS])(.)([\d ]{5}\.[\d ]{2})([EW])(.)(.*)$", re.DOTALL
)
_DAO = re.compile(r"!([A-Za-z])([0-9\x21-\x7b])([0-9\x21-\x7b])!")

# mic-e destination-field decode (APRS 1.01 chapter 10): per char,
# (digit, message-bit, set) where set tags standard/custom message bits
_MICE_STD = "PQRSTUVWXY"
_MICE_CUSTOM = "ABCDEFGHIJ"
_MICE_MTYPES = {
    # standard (M) and custom (C) message-type tables; 000 is Emergency
    "111": ("M0: Off Duty", "C0: Custom-0"),
    "110": ("M1: En Route", "C1: Custom-1"),
    "101": ("M2: In Service", "C2: Custom-2"),
    "100": ("M3: Returning", "C3: Custom-3"),
    "011": ("M4: Committed", "C4: Custom-4"),
    "010": ("M5: Special", "C5: Custom-5"),
    "001": ("M6: Priority", "C6: Custom-6"),
    "000": ("Emergency", "Emergency"),
}


def _parse_aprs_timestamp(ts7: str, now: _dt.datetime | None) -> int | None:
    """7-char APRS timestamp -> epoch seconds.  'z'/'/' = day-hour-min
    (this month, rolled back one month if in the future), 'h' =
    hour-min-sec today (rolled back one day if in the future) —
    aprslib's resolution rule.  ``now`` pins the reference clock for
    deterministic tests; None = current UTC time."""
    if len(ts7) != 7 or not ts7[:6].isdigit():
        return None
    now = now or _dt.datetime.now(_dt.timezone.utc)
    kind = ts7[6]
    try:
        if kind in "z/":
            day, hour, minute = int(ts7[0:2]), int(ts7[2:4]), int(ts7[4:6])
            t = now.replace(day=day, hour=hour, minute=minute, second=0, microsecond=0)
            if t > now:
                prev = (now.replace(day=1) - _dt.timedelta(days=1))
                t = t.replace(year=prev.year, month=prev.month)
        elif kind == "h":
            hour, minute, sec = int(ts7[0:2]), int(ts7[2:4]), int(ts7[4:6])
            t = now.replace(hour=hour, minute=minute, second=sec, microsecond=0)
            if t > now:
                t -= _dt.timedelta(days=1)
        else:
            return None
    except ValueError:
        return None
    return int(t.timestamp())


def _strip_dao(out: dict, comment: str) -> str:
    """Extract a !DAO! datum/precision token (APRS 1.01 addendum):
    daodatumbyte + one extra digit of lat/lon precision (base-10 for
    upper-case datums, base-91 for lower-case), removed from the
    comment."""
    m = _DAO.search(comment)
    if not m:
        return comment
    d, a, o = m.groups()
    out["daodatumbyte"] = d.upper()
    if d.isupper() and a.isdigit() and o.isdigit():
        extra_lat, extra_lon = int(a) / 1000.0, int(o) / 1000.0
    elif d.islower():
        extra_lat = (ord(a) - 33) / 91.0 * 0.01
        extra_lon = (ord(o) - 33) / 91.0 * 0.01
    else:
        return comment[: m.start()] + comment[m.end():]
    if "latitude" in out:
        sign = 1 if out["latitude"] >= 0 else -1
        out["latitude"] = round(out["latitude"] + sign * extra_lat / 60.0, 6)
    if "longitude" in out:
        sign = 1 if out["longitude"] >= 0 else -1
        out["longitude"] = round(out["longitude"] + sign * extra_lon / 60.0, 6)
    return comment[: m.start()] + comment[m.end():]


def _parse_comment_extras(out: dict, comment: str) -> str:
    """Course/speed, PHG, RNG, /A= altitude and !DAO! riding in a
    position comment (aprslib's uncompressed/object extras)."""
    m = re.match(r"^(\d{3})/(\d{3})", comment)
    if m:
        out["course"] = float(int(m.group(1)))
        out["speed"] = round(int(m.group(2)) * 1.852, 2)  # knots -> km/h
        comment = comment[7:]
    m = re.match(r"^PHG(\d{4})", comment)
    if m:
        out["phg"] = m.group(1)
        comment = comment[7:]
    m = re.match(r"^RNG(\d{4})", comment)
    if m:
        out["rng"] = str(int(m.group(1)))  # miles, leading zeros dropped
        comment = comment[7:]
    m = re.search(r"/A=(-?\d{6})", comment)
    if m:
        out["altitude"] = round(int(m.group(1)) * 0.3048, 2)  # feet -> m
        comment = comment[: m.start()] + comment[m.end():]
    return _strip_dao(out, comment)


def _parse_uncompressed(base: dict, body: str, messagecapable: bool) -> dict | None:
    p = _POS.match(body)
    if not p:
        return None
    lat_s, ns, sym_t, lon_s, ew, sym, comment = p.groups()
    amb = lat_s.count(" ")
    lat_s, lon_s = lat_s.replace(" ", "0"), lon_s.replace(" ", "0")
    lat = int(lat_s[:2]) + float(lat_s[2:]) / 60.0
    lon = int(lon_s[:3]) + float(lon_s[3:]) / 60.0
    out = {
        **base,
        "format": "uncompressed",
        "latitude": round(lat if ns == "N" else -lat, 6),
        "longitude": round(lon if ew == "E" else -lon, 6),
        "symbol_table": sym_t,
        "symbol": sym,
        "messagecapable": messagecapable,
        "posambiguity": amb,
    }
    out["comment"] = _parse_comment_extras(out, comment)
    return out


def _parse_compressed(base: dict, body: str, messagecapable: bool) -> dict | None:
    """APRS 1.01 chapter 9 base-91 compressed position."""
    if len(body) < 13:
        return None
    sym_t, lat4, lon4, sym = body[0], body[1:5], body[5:9], body[9]
    c1, s1, tbyte = body[10], body[11], body[12]
    if sym_t not in "/\\" and not ("A" <= sym_t <= "Z") and not sym_t.isdigit():
        return None
    if any(not (33 <= ord(ch) <= 123) for ch in lat4 + lon4):
        return None
    latv = sum((ord(ch) - 33) * 91 ** (3 - i) for i, ch in enumerate(lat4))
    lonv = sum((ord(ch) - 33) * 91 ** (3 - i) for i, ch in enumerate(lon4))
    out = {
        **base,
        "format": "compressed",
        "latitude": round(90.0 - latv / 380926.0, 6),
        "longitude": round(-180.0 + lonv / 190463.0, 6),
        "symbol_table": sym_t,
        "symbol": sym,
        "messagecapable": messagecapable,
    }
    if c1 != " ":
        if (ord(tbyte) - 33) & 0x18 == 0x10:
            # NMEA GGA source: cs is altitude, 1.002^v feet
            v = (ord(c1) - 33) * 91 + (ord(s1) - 33)
            out["altitude"] = round((1.002 ** v) * 0.3048, 2)
        elif c1 == "{":
            out["rng"] = str(round(2 * 1.08 ** (ord(s1) - 33)))
        elif 33 <= ord(c1) <= 122:
            out["course"] = float((ord(c1) - 33) * 4 % 360)
            out["speed"] = round((1.08 ** (ord(s1) - 33) - 1) * 1.852, 2)
        if tbyte != " ":
            out["gpsfixstatus"] = 1 if (ord(tbyte) - 33) & 0x20 else 0
    out["comment"] = _strip_dao(out, body[13:])
    return out


def _parse_mice(base: dict, dest: str, body: str) -> dict | None:
    """APRS 1.01 chapter 10 Mic-E: latitude, message bits, lon offset
    and E/W ride in the DESTINATION field; the info field packs lon,
    speed and course at 28-offset bytes."""
    dest6 = dest.split("-")[0]
    if len(dest6) != 6 or len(body) < 8:
        return None
    digits, bits, sets = [], [], set()
    for ch in dest6[:3]:
        if ch.isdigit():
            digits.append(ch); bits.append("0")
        elif ch == "L":
            digits.append(" "); bits.append("0")
        elif ch in _MICE_CUSTOM:
            digits.append(str(_MICE_CUSTOM.index(ch))); bits.append("1"); sets.add("custom")
        elif ch == "K":
            digits.append(" "); bits.append("1"); sets.add("custom")
        elif ch in _MICE_STD:
            digits.append(str(_MICE_STD.index(ch))); bits.append("1"); sets.add("std")
        elif ch == "Z":
            digits.append(" "); bits.append("1"); sets.add("std")
        else:
            return None
    for ch in dest6[3:]:
        if ch.isdigit():
            digits.append(ch)
        elif ch == "L":
            digits.append(" ")
        elif ch in _MICE_STD:
            digits.append(str(_MICE_STD.index(ch)))
        elif ch == "Z":
            digits.append(" ")
        else:
            return None
    north = dest6[3] in _MICE_STD + "Z"
    lon_offset = 100 if dest6[4] in _MICE_STD + "Z" else 0
    west = dest6[5] in _MICE_STD + "Z"
    lat_s = "".join(digits)
    amb = lat_s.count(" ")
    lat_s = lat_s.replace(" ", "0")
    lat = int(lat_s[:2]) + float(lat_s[2:4] + "." + lat_s[4:6]) / 60.0
    d = ord(body[0]) - 28 + lon_offset
    if 180 <= d <= 189:
        d -= 80
    elif 190 <= d <= 199:
        d -= 190
    m = ord(body[1]) - 28
    if m >= 60:
        m -= 60
    h = ord(body[2]) - 28
    lon = d + m / 60.0 + h / 6000.0
    sp, dc, se = ord(body[3]) - 28, ord(body[4]) - 28, ord(body[5]) - 28
    speed = sp * 10 + dc // 10
    course = (dc % 10) * 100 + se
    if speed >= 800:
        speed -= 800
    if course >= 400:
        course -= 400
    bits_s = "".join(bits)
    mtype_std, mtype_custom = _MICE_MTYPES[bits_s]
    out = {
        **base,
        "format": "mic-e",
        "latitude": round(lat if north else -lat, 6),
        "longitude": round(-lon if west else lon, 6),
        "posambiguity": amb,
        "speed": round(speed * 1.852, 2),  # knots -> km/h
        "course": float(course),
        # reference renders mbits numerically (:351): int('011') -> 11,
        # the leading-zero loss is the reference's own quirk
        "mbits": int(bits_s),
        "mtype": mtype_custom if sets == {"custom"} else mtype_std,
        "symbol": body[6],
        "symbol_table": body[7],
    }
    rest = body[8:]
    if len(rest) >= 4 and rest[3] == "}" and all(33 <= ord(c) <= 127 for c in rest[:3]):
        v = (ord(rest[0]) - 33) * 91 * 91 + (ord(rest[1]) - 33) * 91 + (ord(rest[2]) - 33)
        out["altitude"] = float(v - 10000)  # meters by spec
        rest = rest[4:]
    out["comment"] = _strip_dao(out, rest)
    return out


def _parse_object(base: dict, body: str, now: _dt.datetime | None) -> dict | None:
    """';' object report: 9-char name, alive flag, timestamp, then an
    uncompressed or compressed position."""
    if len(body) < 18:
        return None
    name, alive_c, ts7, pos = body[:9], body[9], body[10:17], body[17:]
    if alive_c not in "*_":
        return None
    ts = _parse_aprs_timestamp(ts7, now)
    inner = (
        _parse_uncompressed(base, pos, False)
        if pos[:1].isdigit() or pos[:1] == " "
        else _parse_compressed(base, pos, False)
    )
    if inner is None:
        return None
    inner.pop("messagecapable", None)
    out = {
        **inner,
        "format": "object",
        "object_name": name.rstrip(),
        "object_format": "uncompressed" if pos[:1].isdigit() or pos[:1] == " " else "compressed",
        "alive": alive_c == "*",
        "raw_timestamp": ts7,
    }
    if ts is not None:
        out["timestamp"] = ts
    return out


_WX_GROUPS = {
    # token -> (weather key, converter); aprslib unit conventions
    "c": ("wind_direction", lambda v: float(v)),
    "s": ("wind_speed", lambda v: round(v * 0.44704, 2)),      # mph -> m/s
    "g": ("wind_gust", lambda v: round(v * 0.44704, 2)),       # mph -> m/s
    "t": ("temperature", lambda v: round((v - 32) * 5 / 9, 2)),  # F -> C
    "r": ("rain_1h", lambda v: round(v * 0.254, 2)),           # 0.01in -> mm
    "p": ("rain_24h", lambda v: round(v * 0.254, 2)),
    "P": ("rain_since_midnight", lambda v: round(v * 0.254, 2)),
    "h": ("humidity", lambda v: 100.0 if v == 0 else float(v)),
    "b": ("pressure", lambda v: round(v / 10.0, 2)),           # 0.1mb -> mb
}


def _parse_wx(base: dict, body: str) -> dict | None:
    """'_' positionless weather report: MMDDHHMM timestamp then
    single-letter measurement groups; unparsed tail is the comment."""
    m = re.match(r"^(\d{8})", body)
    if not m:
        return None
    out = {**base, "format": "wx", "wx_raw_timestamp": m.group(1)}
    rest = body[8:]
    weather: dict = {}
    while rest:
        g = re.match(r"^([csgtrpPhb])(-?\d+|\.{2,5})", rest)
        if not g:
            break
        tok, val = g.groups()
        key, conv = _WX_GROUPS[tok]
        if not val.startswith("."):  # '...' = sensor absent
            weather[key] = conv(int(val))
        rest = rest[g.end():]
    if not weather:
        return None
    out["weather"] = weather
    if rest:
        out["comment"] = rest
    return out


def _parse_telemetry_data(base: dict, body: str) -> dict | None:
    """'T#' telemetry data frame: sequence, 5 analog channels, digital
    bits.  Routed through the 'uncompressed' projection, whose spec
    includes the telemetry tail — the reference's own tables carry
    telemetry only inside position/status formats (parseTelemetry is a
    sub-parser, :92-136, not a dispatch target), so standalone readings
    ride the same path."""
    m = re.match(r"^#(?:MIC)?0*(\d+),", body)
    if not m:
        return None
    parts = body[body.index(",") + 1:].split(",")
    if len(parts) < 5:
        return None
    try:
        vals = [float(p) for p in parts[:5]]
    except ValueError:
        return None
    tele = {"seq": int(m.group(1)), "vals": vals}
    if len(parts) > 5 and re.fullmatch(r"[01]{8}", parts[5].strip()):
        tele["bits"] = parts[5].strip()
    return {**base, "format": "uncompressed", "telemetry": tele}


def _parse_telemetry_message(base: dict, text: str) -> dict | None:
    """Telemetry definition messages (EQNS./PARM./UNIT./BITS.) ->
    'telemetry-message' (J2 state updates, no output row).  Only EQNS
    carries calibration the engine consumes (:144-160): 15 comma-
    separated coefficients -> 5 [a,b,c] triples, absent entries 0."""
    kind = text[:5]
    if kind not in ("EQNS.", "PARM.", "UNIT.", "BITS."):
        return None
    out = {**base, "format": "telemetry-message"}
    if kind == "EQNS.":
        nums = []
        for p in text[5:].split(","):
            try:
                nums.append(float(p.strip()))
            except ValueError:
                nums.append(0.0)
        nums = (nums + [0.0] * 15)[:15]
        out["tEQNS"] = [nums[i * 3 : i * 3 + 3] for i in range(5)]
    return out


def parse_frame(raw: str, now: _dt.datetime | None = None) -> dict | None:
    """Raw TNC2 frame -> wide-schema dict (None = undecodable).  All 10
    reference formats decode from the wire; ``now`` pins the clock used
    to resolve day-hour-minute timestamps (tests pass a fixed instant,
    the live source uses real time)."""
    m = _HEADER.match(raw)
    if not m:
        return None
    src, dest, path_s, payload = m.groups()
    path = [p for p in path_s.split(",") if p]
    via = path[-1].rstrip("*") if path else ""
    base = {"from_call": src, "to_call": dest, "via": via, "path": path, "raw": raw}
    if not payload:
        return None
    lead, body = payload[0], payload[1:]
    if lead == ">":
        out = {**base, "format": "status"}
        ts = _parse_aprs_timestamp(body[:7], now) if len(body) >= 7 else None
        if ts is not None:
            out["timestamp"] = ts
            out["raw_timestamp"] = body[:7]
            body = body[7:]
        out["status"] = body
        return out
    if lead == ":":
        # :ADDRESSEE :text{msgNo
        if len(body) >= 10 and body[9] == ":":
            addressee, text = body[:9].strip(), body[10:]
            tm = _parse_telemetry_message(base, text)
            if tm is not None:
                return tm
            msg = {**base, "format": "message", "addresse": addressee}
            # ack/rej responses (APRS 1.01: body is exactly 'ackNNNNN' /
            # 'rejNNNNN') — without this, the response column is never
            # populated and stream-stream ack matching finds nothing
            m_ack = re.fullmatch(r"(ack|rej)([A-Za-z0-9]{1,5})", text)
            if m_ack:
                msg["response"] = m_ack.group(1)
                if m_ack.group(2).isdigit():
                    msg["msgNo"] = int(m_ack.group(2))
                return msg
            # strip only an APRS-1.01-valid trailing {msgNo (1-5
            # alphanumerics at end-of-text) — rpartition on any '{'
            # would corrupt message bodies that merely contain one
            m_no = re.search(r"\{([A-Za-z0-9]{1,5})$", text)
            if m_no:
                text = text[: m_no.start()]
                if m_no.group(1).isdigit():
                    msg["msgNo"] = int(m_no.group(1))
            msg["message_text"] = text
            if addressee.upper().startswith("BLN"):
                msg["format"] = "bulletin"
                msg["identifier"] = addressee.upper()
                bid = addressee[3:4]
                if bid.isdigit():
                    msg["bid"] = int(bid)
            return msg
        return None
    if lead in "!=":
        return (
            _parse_uncompressed(base, body, lead == "=")
            or _parse_compressed(base, body, lead == "=")
        )
    if lead in "/@":
        # recognized-but-truncated timestamped position frames must
        # dead-letter like their '!'/'=' twins, not fall through to
        # the beacon catch-all as live rows
        if len(body) < 8:
            return None
        ts7, rest = body[:7], body[7:]
        out = _parse_uncompressed(base, rest, lead == "@") or _parse_compressed(
            base, rest, lead == "@"
        )
        if out is None:
            return None
        ts = _parse_aprs_timestamp(ts7, now)
        if ts is not None:
            out["timestamp"] = ts
            out["raw_timestamp"] = ts7
        return out
    if lead in "`'":
        return _parse_mice(base, dest, body) or {**base, "format": "beacon", "text": payload}
    if lead == ";":
        return _parse_object(base, body, now)
    if lead == "_":
        return _parse_wx(base, body)
    if lead == "T":
        out = _parse_telemetry_data(base, body)
        if out is not None:
            return out
    if lead == "}":
        # third-party traffic: not a dispatch target in the reference
        # (:42-81) — tag it so the D2 unknown-format filter drops it
        return {**base, "format": "third-party"}
    # unrecognized data type indicator -> beacon text (aprslib-like)
    return {**base, "format": "beacon", "text": payload}


def decode_frames(raw_df: DataFrame, now: _dt.datetime | None = None) -> DataFrame:
    """S2 decode stage: (raw, ingest_ts) -> wide packet rows.

    Arrow-batched ``mapInPandas`` (no per-row Python round trips);
    frames the grammar rejects become null-format rows ->
    ``dead_letters`` (D2/D3).  ``now`` pins timestamp resolution for
    deterministic tests (None = wall clock, the live-source behavior).
    """
    import pandas as pd

    def _decode(batches):
        for pdf in batches:
            recs = []
            for r, ts in zip(pdf["raw"], pdf["ingest_ts"]):
                d = parse_frame(r, now) if r is not None else {}
                d = d or {}
                d["ingest_ts"] = ts
                if r is not None:
                    # dead-lettered frames keep their raw text — a
                    # null-format row with null raw would be
                    # undiagnosable and unreplayable
                    d.setdefault("raw", r)
                recs.append({f.name: d.get(f.name) for f in PACKET_SCHEMA.fields})
            yield pd.DataFrame(recs, columns=[f.name for f in PACKET_SCHEMA.fields])

    return raw_df.mapInPandas(_decode, PACKET_SCHEMA)
