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

Frame decode implements the public APRS 1.01 grammar for a useful
subset (status '>', message ':', uncompressed position '!'/'=',
object ';', everything else -> beacon), enough to run the full
pipeline end-to-end without aprslib; unparsable frames dead-letter.
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
# S2: frame decode (public APRS 1.01 grammar subset)
# ---------------------------------------------------------------------

_HEADER = re.compile(r"^([A-Za-z0-9\-]{1,9})>([^,:]+)((?:,[^,:]+)*):(.*)$", re.DOTALL)
_POS = re.compile(
    r"^(\d{4}\.\d{2})([NS])(.)(\d{5}\.\d{2})([EW])(.)(.*)$", re.DOTALL
)


def parse_frame(raw: str) -> dict | None:
    """Raw TNC2 frame -> wide-schema dict (None = undecodable)."""
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
        return {**base, "format": "status", "status": body}
    if lead == ":":
        # :ADDRESSEE :text{msgNo
        if len(body) >= 10 and body[9] == ":":
            addressee, text = body[:9].strip(), body[10:]
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
        p = _POS.match(body)
        if not p:
            return None
        lat_s, ns, sym_t, lon_s, ew, sym, comment = p.groups()
        lat = int(lat_s[:2]) + float(lat_s[2:]) / 60.0
        lon = int(lon_s[:3]) + float(lon_s[3:]) / 60.0
        return {
            **base,
            "format": "uncompressed",
            "latitude": round(lat if ns == "N" else -lat, 6),
            "longitude": round(lon if ew == "E" else -lon, 6),
            "symbol_table": sym_t,
            "symbol": sym,
            "comment": comment,
            "messagecapable": lead == "=",
            "posambiguity": 0,
        }
    # unrecognized data type indicator -> beacon text (aprslib-like)
    return {**base, "format": "beacon", "text": payload}


def decode_frames(raw_df: DataFrame) -> DataFrame:
    """S2 decode stage: (raw, ingest_ts) -> wide packet rows.

    Arrow-batched ``mapInPandas`` (no per-row Python round trips);
    frames the grammar rejects become null-format rows ->
    ``dead_letters`` (D2/D3).
    """
    import pandas as pd

    def _decode(batches):
        for pdf in batches:
            recs = []
            for r, ts in zip(pdf["raw"], pdf["ingest_ts"]):
                d = parse_frame(r) if r is not None else {}
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
