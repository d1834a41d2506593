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
  (``unused_data`` marks each member boundary, decode bounded by
  ``MAX_MEMBER_BYTES`` so a gzip bomb dead-letters instead of
  OOM-killing the executor), parses headers, validates
  Content-Length, and returns (headers, payload) per record.  A
  member carrying SEVERAL concatenated records (file-level
  compression — also legal ISO 28500) parses fully.  Every malformed
  stream raises ``ValueError`` with a ``WARC:`` message (the
  codec-family dead-letter contract).

Reference parity note: the reference (aprs2influxdb) has no file
ingest at all; this serves SURVEY's LLM-pipeline north star.
"""

from __future__ import annotations

import gzip
import zlib

_CRLF = b"\r\n"

# in-memory decode bound per gzip member: a crafted ~1 MB bomb member
# expanding to tens of GB must dead-letter (ValueError), never
# MemoryError the executor (review r7 — the same class the MP4
# sample-table guards close)
MAX_MEMBER_BYTES = 1 << 28  # 256 MB


def write_warc_gz(records: list[tuple[dict, bytes]]) -> bytes:
    """Serialize ``records`` — (header dict, payload bytes) pairs —
    as multi-member gzip WARC.  ``WARC-Type`` is required in each
    header dict; ``Content-Length`` is computed, never trusted (a
    caller-supplied one is rejected — two length headers would be a
    grammar violation an external reader could misparse)."""
    out = bytearray()
    for headers, payload in records:
        if "WARC-Type" not in headers:
            raise ValueError("write_warc_gz: WARC-Type header required")
        lines = [b"WARC/1.0"]
        for k, v in headers.items():
            ks, vs = str(k), str(v)
            if ks.lower() == "content-length":
                raise ValueError(
                    "write_warc_gz: Content-Length is computed, not supplied"
                )
            # CR/LF in a KEY would inject forged header lines; a colon
            # in a key corrupts the key/value split (review r7)
            if any(c in ks for c in "\r\n:") or "\r" in vs or "\n" in vs:
                raise ValueError(f"write_warc_gz: malformed header {ks!r}")
            lines.append(f"{ks}: {vs}".encode())
        lines.append(f"Content-Length: {len(payload)}".encode())
        rec = _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        # mtime=0 keeps the writer deterministic (oracle fixtures)
        out += gzip.compress(rec, mtime=0)
    return bytes(out)


def parse_warc_gz(blob: bytes) -> list[tuple[dict, bytes]]:
    """Walk the gzip members, parse every WARC record in each →
    [(headers, payload)].  Rejects: a non-gzip stream, a member
    without the WARC/1.0 magic, a member past ``MAX_MEMBER_BYTES``,
    truncated/negative/overlong payloads vs the declared
    Content-Length, trailing garbage inside a member, and headers
    without a colon."""
    if blob[:2] != b"\x1f\x8b":
        raise ValueError("WARC: not a gzip stream")
    records: list[tuple[dict, bytes]] = []
    mv = memoryview(blob)  # zero-copy member slices (review r7)
    pos = 0
    while pos < len(blob):
        # feed the decompressor in bounded, GROWING chunks: handing it
        # the whole remaining buffer makes ``d.unused_data`` a COPY of
        # the tail after every member — O(n²) bytes for a many-member
        # shard file (a Common Crawl-style shard holds ~60k members;
        # round 8).  Starting small keeps the per-member tail copy
        # ≤ 64 KB for typical members; doubling reaches a 256 MB
        # member in ~12 feeds.
        d = zlib.decompressobj(wbits=31)  # one gzip member
        parts: list[bytes] = []
        total = 0
        fed = pos
        chunk_sz = 1 << 16
        try:
            while not d.eof and fed < len(blob):
                chunk = mv[fed : fed + chunk_sz]
                out = d.decompress(chunk, MAX_MEMBER_BYTES + 1 - total)
                total += len(out)
                parts.append(out)
                if total > MAX_MEMBER_BYTES:
                    raise ValueError(
                        "WARC: member exceeds the in-memory decode bound"
                    )
                fed += len(chunk)
                chunk_sz = min(chunk_sz * 2, 1 << 24)
        except zlib.error as e:
            raise ValueError(f"WARC: corrupt gzip member ({e})") from None
        if not d.eof:
            raise ValueError("WARC: truncated gzip member")
        raw = b"".join(parts)
        pos = fed - len(d.unused_data)
        # a member may carry SEVERAL concatenated records (file-level
        # compression is legal ISO 28500) — parse them all; silently
        # dropping the tail would be data loss (review r7)
        off = 0
        while off < len(raw):
            headers, payload, end = _parse_record(raw, off)
            records.append((headers, payload))
            off = end
    if not records:
        raise ValueError("WARC: empty stream")
    return records


def _parse_record(raw: bytes, off: int = 0) -> tuple[dict, bytes, int]:
    """Parse one record at ``raw[off:]`` WITHOUT copying the member
    tail (a many-record member would otherwise pay O(n²) bytes copied
    — ADVICE r7); returns (headers, payload, end_offset) where
    ``end_offset`` is absolute in ``raw``."""
    if not raw.startswith(b"WARC/1.0", off) and not raw.startswith(b"WARC/1.1", off):
        raise ValueError("WARC: member does not start with a WARC version line")
    head_end = raw.find(_CRLF + _CRLF, off)
    if head_end == -1:
        raise ValueError("WARC: missing header terminator")
    headers: dict = {}
    for line in raw[off:head_end].split(_CRLF)[1:]:
        if b":" not in line:
            raise ValueError("WARC: malformed header line")
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin1")] = v.strip().decode("latin1")
    try:
        n = int(headers.get("Content-Length", ""))
    except ValueError:
        raise ValueError("WARC: missing or non-numeric Content-Length") from None
    if n < 0:
        raise ValueError("WARC: negative Content-Length")
    body = head_end + 4
    payload = raw[body : body + n]
    if len(payload) < n:
        raise ValueError("WARC: payload shorter than Content-Length")
    if raw[body + n : body + n + 4] != _CRLF + _CRLF:
        raise ValueError("WARC: record not terminated by CRLFCRLF")
    if "WARC-Type" not in headers:
        raise ValueError("WARC: record without WARC-Type")
    return headers, payload, body + n + 4


def is_warc_gz(blob: bytes) -> bool:
    return len(blob) >= 2 and blob[:2] == b"\x1f\x8b"
