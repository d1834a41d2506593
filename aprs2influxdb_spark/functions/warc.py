"""WARC (ISO 28500) reader/writer over multi-member gzip, pure
stdlib — the INGEST format of real crawled corpora (round 7: the
multimodal/codec surface covered images/audio/video, but a training
pipeline's TEXT arrives as .warc.gz; Common Crawl's convention is one
gzip MEMBER per WARC record so readers can seek by member).

- writer: each record = WARC/1.0 header block (WARC-Type,
  WARC-Record-ID, WARC-Date, WARC-Target-URI, Content-Length) +
  CRLF CRLF + payload + CRLF CRLF, individually gzip-compressed and
  concatenated (the multi-member layout);
- reader: walks gzip members with a streaming zlib decompressor
  (``unused_data`` marks each member boundary), parses headers,
  validates Content-Length, and returns (headers, payload) per
  record.  Every malformed stream raises ``ValueError`` with a
  ``WARC:`` message (the codec-family dead-letter contract).

Reference parity note: the reference (aprs2influxdb) has no file
ingest at all; this serves SURVEY's LLM-pipeline north star.
"""

from __future__ import annotations

import gzip
import zlib

_CRLF = b"\r\n"


def write_warc_gz(records: list[tuple[dict, bytes]]) -> bytes:
    """Serialize ``records`` — (header dict, payload bytes) pairs —
    as multi-member gzip WARC.  ``WARC-Type`` is required in each
    header dict; ``Content-Length`` is computed, never trusted."""
    out = bytearray()
    for headers, payload in records:
        if "WARC-Type" not in headers:
            raise ValueError("write_warc_gz: WARC-Type header required")
        lines = [b"WARC/1.0"]
        for k, v in headers.items():
            if "\r" in str(v) or "\n" in str(v):
                raise ValueError(f"write_warc_gz: header value with newline: {k}")
            lines.append(f"{k}: {v}".encode())
        lines.append(f"Content-Length: {len(payload)}".encode())
        rec = _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        # mtime=0 keeps the writer deterministic (oracle fixtures)
        out += gzip.compress(rec, mtime=0)
    return bytes(out)


def parse_warc_gz(blob: bytes) -> list[tuple[dict, bytes]]:
    """Walk the gzip members and parse each WARC record →
    [(headers, payload)].  Rejects: a non-gzip stream, a member
    without the WARC/1.0 magic, truncated/overlong payloads vs the
    declared Content-Length, and headers without a colon."""
    if blob[:2] != b"\x1f\x8b":
        raise ValueError("WARC: not a gzip stream")
    records: list[tuple[dict, bytes]] = []
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)  # one gzip member
        try:
            raw = d.decompress(blob[pos:])
        except zlib.error as e:
            raise ValueError(f"WARC: corrupt gzip member ({e})") from None
        if not d.eof:
            raise ValueError("WARC: truncated gzip member")
        consumed = len(blob) - pos - len(d.unused_data)
        pos += consumed
        records.append(_parse_record(raw))
    if not records:
        raise ValueError("WARC: empty stream")
    return records


def _parse_record(raw: bytes) -> tuple[dict, bytes]:
    if not raw.startswith(b"WARC/1.0") and not raw.startswith(b"WARC/1.1"):
        raise ValueError("WARC: member does not start with a WARC version line")
    try:
        head, rest = raw.split(_CRLF + _CRLF, 1)
    except ValueError:
        raise ValueError("WARC: missing header terminator") from None
    headers: dict = {}
    for line in head.split(_CRLF)[1:]:
        if b":" not in line:
            raise ValueError("WARC: malformed header line")
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin1")] = v.strip().decode("latin1")
    try:
        n = int(headers.get("Content-Length", ""))
    except ValueError:
        raise ValueError("WARC: missing or non-numeric Content-Length") from None
    payload = rest[:n]
    if len(payload) < n:
        raise ValueError("WARC: payload shorter than Content-Length")
    if rest[n : n + 4] != _CRLF + _CRLF:
        raise ValueError("WARC: record not terminated by CRLFCRLF")
    if "WARC-Type" not in headers:
        raise ValueError("WARC: record without WARC-Type")
    return headers, payload


def is_warc_gz(blob: bytes) -> bool:
    return len(blob) >= 2 and blob[:2] == b"\x1f\x8b"
