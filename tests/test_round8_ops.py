"""Round 8 operator tests.

Opens with the three ADVICE-r7 regression fixes (many-record WARC
member linearity, mdhd v1 length guard, html_extract whitespace
normalization); the round's new operators (crawl composition,
persisted-blob ingest, PDF extraction, URL/domain ops) append below.
"""
import struct

import pytest


def test_warc_many_record_member_parses_linear():
    """ADVICE r7: _parse_record used to copy the member tail per
    record (O(n²) bytes for a many-record member).  The indexed
    rewrite must still parse a member holding MANY records exactly —
    and fast enough that a quadratic regression would time out."""
    import gzip
    import time

    from aprs2influxdb_spark.functions.warc import parse_warc_gz

    n = 2000
    payload = b"x" * 200
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )
    blob = gzip.compress(rec * n, mtime=0)
    t0 = time.monotonic()
    got = parse_warc_gz(blob)
    elapsed = time.monotonic() - t0
    assert len(got) == n
    assert all(p == payload for _, p in got)
    assert all(h["WARC-Type"] == "response" for h, _ in got)
    # quadratic tail-copying at n=2000 × 230B records copies ~460 MB;
    # linear parsing finishes this in well under a second
    assert elapsed < 10.0


def test_mp4_mdhd_v1_short_body_specific_error():
    """ADVICE r7: a version-1 mdhd needs 24 bytes to reach the
    timescale; a 20-23 byte v1 body must raise the SPECIFIC mdhd
    message, not fall through to struct.error / generic malformed."""
    from aprs2influxdb_spark.functions.mp4 import parse_mp4

    def wrap(mdhd_body: bytes) -> bytes:
        trak_kids = struct.pack(">I", 8 + len(mdhd_body)) + b"mdhd" + mdhd_body
        mdia = struct.pack(">I", 8 + len(trak_kids)) + b"mdia" + trak_kids
        trak = struct.pack(">I", 8 + len(mdia)) + b"trak" + mdia
        mvhd_body = struct.pack(">B3x", 0) + struct.pack(">III", 0, 0, 1000) + b"\x00" * 80
        mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
        moov = struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
        ftyp = struct.pack(">I", 24) + b"ftyp" + b"isom" + struct.pack(">I", 0) + b"isomiso2"
        return ftyp + moov

    # v1 marker byte, then only 19 more bytes: 20 total — enough for
    # v0 (timescale at 12..16) but NOT v1 (timescale at 20..24)
    short_v1 = struct.pack(">B3x", 1) + b"\x00" * 16
    assert len(short_v1) == 20
    with pytest.raises(ValueError, match="mdhd body too short"):
        parse_mp4(wrap(short_v1))
    # a full v1 mdhd (timescale at offset 20) still parses
    ok_v1 = struct.pack(">B3x", 1) + struct.pack(">QQI", 0, 0, 1000) + struct.pack(">Q", 0)
    assert parse_mp4(wrap(ok_v1))["n_tracks"] == 1
    # sub-20-byte bodies keep the guard for both versions
    with pytest.raises(ValueError, match="mdhd body too short"):
        parse_mp4(wrap(struct.pack(">B3x", 0) + b"\x00" * 8))


def test_html_extract_handles_irregular_whitespace(spark):
    """ADVICE r7: q_html_extract's hard assert crashed on documents
    whose text carries consecutive/trailing spaces (split produced
    empty words → whitespace-only chunks the extractor drops but the
    expectation kept).  The normalized chunking must run such docs
    clean, matching the SQL oracle's list_filter."""
    import duckdb
    import pandas as pd

    from aprs2influxdb_spark.queries import SQL_HTML_EXTRACT, q_html_extract

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha  beta   gamma ",          # consecutive + trailing
            " lead trail  ",                  # leading + trailing
            "  ",                             # whitespace-only → no chunks
            " ".join(f"w{i}" for i in range(40)) + "  tail",
        ],
    })
    sdf = spark.createDataFrame(docs)
    sdf.createOrReplaceTempView("documents")
    import aprs2influxdb_spark.queries as Q

    orig = Q._t
    Q._t = lambda sp, sf, name: sp.table(name)
    try:
        got = q_html_extract(spark, "unused").toPandas()
    finally:
        Q._t = orig
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(SQL_HTML_EXTRACT).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert got["body_len"].astype(int).tolist() == want["body_len"].astype(int).tolist()
    assert got["n_chunks"].astype(int).tolist() == want["n_chunks"].astype(int).tolist()
