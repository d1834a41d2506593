"""Progressive JPEG (SOF2, T.81 Annex G) — round 7, verdict-r6 item 1.

The decoder must handle any mix of spectral-selection and
successive-approximation scans; the in-repo progressive encoder
quantizes identically to the baseline encoder, so the load-bearing
equivalence everywhere below is

    decode(progressive(img)) == decode(baseline(img))   bit-for-bit

— if any scan loses or misplaces a single coefficient bit, the IDCT
outputs diverge.  The hand-assembled fixture at the bottom checks the
decoder against a bitstream written by THIS TEST (fixed-length
huffman tables, bits computed from the spec's scan grammar, not via
the codec's writer) so the decoder is pinned independently of the
encoder.

Reference parity note: the reference (aprs2influxdb) has no image
path (README.md:4); this extends the engine's multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aprs2influxdb_spark.functions.jpeg import (
    decode_jpeg_color,
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_gray,
    encode_jpeg_progressive_color,
    encode_jpeg_progressive_gray,
)


def test_progressive_gray_equals_baseline_decode_random_images():
    rng = np.random.default_rng(42)
    for h, w in [(8, 8), (16, 24), (32, 32), (24, 40)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        base = decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), w, h))
        prog = decode_jpeg_gray(encode_jpeg_progressive_gray(img.tobytes(), w, h))
        assert base == prog, f"{w}x{h}"


def test_progressive_color_444_and_420_equal_baseline_decode():
    rng = np.random.default_rng(11)
    for side in (16, 32, 48):
        img = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            base = decode_jpeg_color(
                encode_jpeg_color(img.tobytes(), side, side, subsampling=sub)
            )
            prog = decode_jpeg_color(
                encode_jpeg_progressive_color(img.tobytes(), side, side, subsampling=sub)
            )
            assert base == prog, f"{sub} {side}"


def test_progressive_sparse_and_flat_exercise_eob_runs():
    """A mostly-flat image makes every AC scan a long END-OF-BAND run
    (EOBn codes with n>1), and the refinement scans pure correction
    streams; a fully flat image is EOB runs only."""
    img = np.full((64, 64), 128, dtype=np.uint8)
    img[5, 7], img[40, 40], img[63, 1] = 255, 0, 17
    assert decode_jpeg_gray(
        encode_jpeg_progressive_gray(img.tobytes(), 64, 64)
    ) == decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), 64, 64))
    flat = np.full((128, 128), 200, dtype=np.uint8)
    assert decode_jpeg_gray(
        encode_jpeg_progressive_gray(flat.tobytes(), 128, 128)
    ) == decode_jpeg_gray(encode_jpeg_gray(flat.tobytes(), 128, 128))


def test_progressive_custom_scan_scripts():
    """Deep successive-approximation chains (Al 3→0) and
    spectral-selection-only scripts both reconstruct exactly —
    the decoder must not assume the default script."""
    rng = np.random.default_rng(7)
    deep = [
        ((0,), 0, 0, 0, 3), ((0,), 0, 0, 3, 2), ((0,), 0, 0, 2, 1), ((0,), 0, 0, 1, 0),
        ((0,), 1, 2, 0, 3), ((0,), 3, 9, 0, 3), ((0,), 10, 63, 0, 3),
        ((0,), 1, 63, 3, 2), ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
    ]
    spectral_only = [
        ((0,), 0, 0, 0, 0), ((0,), 1, 5, 0, 0), ((0,), 6, 20, 0, 0), ((0,), 21, 63, 0, 0),
    ]
    for script in (deep, spectral_only):
        img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
        assert decode_jpeg_gray(
            encode_jpeg_progressive_gray(img.tobytes(), 40, 32, scan_script=script)
        ) == decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), 40, 32))


def test_progressive_restart_intervals_reset_predictors_and_eob_runs():
    """DRI in a progressive stream: RSTn markers byte-align each scan
    segment and reset both the DC predictors and the EOB run — a flat
    image makes the EOB-run reset load-bearing (a run crossing a
    restart boundary would desync the very first segment)."""
    rng = np.random.default_rng(3)
    noisy = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    flat = np.full((32, 64), 99, dtype=np.uint8)
    for img, (h, w) in [(noisy, (24, 32)), (flat, (32, 64))]:
        for ri in (1, 3):
            blob = encode_jpeg_progressive_gray(img.tobytes(), w, h, restart_interval=ri)
            assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))
            assert decode_jpeg_gray(blob) == decode_jpeg_gray(
                encode_jpeg_gray(img.tobytes(), w, h)
            )


def test_progressive_nonunit_quant_matches_baseline_lossy_decode():
    q = list(range(1, 65))
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    assert decode_jpeg_gray(
        encode_jpeg_progressive_gray(img.tobytes(), 16, 16, quant=q)
    ) == decode_jpeg_gray(encode_jpeg_gray(img.tobytes(), 16, 16, quant=q))


def test_progressive_flat_blocks_pixel_exact():
    """The oracle contract: per-8×8-constant blocks + unit quant have
    only a DC coefficient, which every scan-script slicing transmits
    exactly — the decode equals the SOURCE pixels, which is what lets
    DuckDB recompute decoded features in closed form."""
    vals = [13, 250, 128, 7]
    img = np.zeros((16, 16), dtype=np.uint8)
    for b, v in enumerate(vals):
        by, bx = divmod(b, 2)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    w, h, px = decode_jpeg_gray(encode_jpeg_progressive_gray(img.tobytes(), 16, 16))
    assert (w, h) == (16, 16) and px == img.tobytes()


def test_progressive_decoder_against_hand_assembled_fixture():
    """Decoder vs an INDEPENDENTLY constructed multi-scan bitstream:
    one 8×8 block, coefficients DC=24, zz1=-5, zz10=+3, zz20=+1, unit
    quant, four scans (DC first Al=1, DC refine, AC first Al=1, AC
    refine Al=0).  All entropy bits below are written by this test
    with FIXED-LENGTH huffman tables (DC: size s → 4-bit code s; AC:
    symbol (r<<4)|s → 8-bit code r*15+s), so the expected bit
    placement — including the refinement scan's ZRL with buffered
    correction bits and the newly-significant +1 at zz20 — comes from
    the T.81 Annex G grammar, not from the codec's writer."""
    from aprs2influxdb_spark.functions.jpeg import ZIGZAG

    # ---- tables: 12 DC codes of length 4, 240 AC codes of length 8
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_bits = [0] * 7 + [240] + [0] * 8
    ac_vals = [(r << 4) | s for r in range(16) for s in range(15)]

    class BW:  # minimal independent bit writer (with byte stuffing)
        def __init__(self):
            self.out = bytearray()
            self.acc, self.n = 0, 0

        def w(self, code, length):
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                self.n -= 8
                b = (self.acc >> self.n) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)

        def done(self):
            if self.n:
                pad = 8 - self.n
                self.w((1 << pad) - 1, pad)
            return bytes(self.out)

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(tc_th, bits, vals):
        return bytes([tc_th]) + bytes(bits) + bytes(vals)

    def ac_code(r, s):
        return (r * 15 + s, 8)

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, dht(0x00, dc_bits, dc_vals))
    out += seg(0xFFC4, dht(0x10, ac_bits, ac_vals))

    # scan 1 — DC first, Al=1: v = 24>>1 = 12, diff 12 → size 4,
    # amplitude 1100
    bw = BW()
    bw.w(4, 4)
    bw.w(12, 4)
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bw.done()

    # scan 2 — AC first, Ss=1 Se=63 Al=1: point-transformed band is
    # zz1 → -2 (r=0,s=2, amp -2+3=1), zz10 → +1 (r=8,s=1, amp 1),
    # zz20 → 0 (|1|>>1), tail all zero → EOB0 flushed at scan end
    bw = BW()
    c, ln = ac_code(0, 2); bw.w(c, ln); bw.w(1, 2)
    c, ln = ac_code(8, 1); bw.w(c, ln); bw.w(1, 1)
    c, ln = ac_code(0, 0); bw.w(c, ln)
    out += seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + bw.done()

    # scan 3 — AC refine, Ah=1 Al=0: zz1 (|−5|=5 → history 2,
    # correction bit 1) and zz10 (3 → history 1, correction 1) are
    # buffered; at zz20 (newly significant) the zero run is 17 → ZRL,
    # then the two buffered corrections, then code (1<<4|1) + sign 1;
    # the 43-zero tail folds into EOB0 (flushed at scan end)
    bw = BW()
    c, ln = ac_code(15, 0); bw.w(c, ln)   # ZRL
    bw.w(1, 1); bw.w(1, 1)                # buffered corrections zz1, zz10
    c, ln = ac_code(1, 1); bw.w(c, ln)    # newly significant, r=1
    bw.w(1, 1)                            # sign: positive
    c, ln = ac_code(0, 0); bw.w(c, ln)    # EOB for the tail
    out += seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + bw.done()

    # scan 4 — DC refine, Ah=1 Al=0: bit0 of 24 is 0
    bw = BW()
    bw.w(0, 1)
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bw.done()
    out += b"\xff\xd9"

    w, h, px = decode_jpeg_gray(bytes(out))
    assert (w, h) == (8, 8)

    # expected pixels via an explicitly-summed reference IDCT
    zz = [0] * 64
    zz[0], zz[1], zz[10], zz[20] = 24, -5, 3, 1
    F = np.zeros((8, 8))
    for k in range(64):
        F.flat[ZIGZAG[k]] = zz[k]

    def c(u):
        return np.sqrt(0.5) if u == 0 else 1.0

    ref = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) * F[u, v]
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                    )
            ref[y, x] = s / 4.0
    exp = np.clip(np.floor(ref + 128.0 + 0.5), 0, 255).astype(np.uint8)
    assert px == exp.tobytes()


def test_progressive_malformed_streams_raise_jpeg_valueerror():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    good = encode_jpeg_progressive_gray(img.tobytes(), 16, 16)

    # truncation anywhere must dead-letter, never escape as
    # struct.error/IndexError (the codec-family contract)
    for cut in (4, 30, len(good) // 2, len(good) - 3):
        with pytest.raises(ValueError, match="JPEG"):
            decode_jpeg_gray(good[:cut])

    # a baseline stream relabeled SOF2 carries a baseline SOS header
    # (Ss=0, Se=63) — invalid for a progressive DC scan
    base = encode_jpeg_gray(img.tobytes(), 16, 16)
    sof = base.index(b"\xff\xc0")
    franken = base[:sof] + b"\xff\xc2" + base[sof + 2 :]
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg_gray(franken)

    # refinement scan promising Ah != Al+1
    sos = good.index(b"\xff\xda")
    hdr = bytearray(good)
    # last byte of the first SOS header is AhAl; corrupt it to 0x31
    ln = struct.unpack(">H", good[sos + 2 : sos + 4])[0]
    hdr[sos + 2 + ln - 1] = 0x31
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg_gray(bytes(hdr))


def test_progressive_component_count_contract():
    rng = np.random.default_rng(8)
    gray = encode_jpeg_progressive_gray(
        rng.integers(0, 256, (8, 8), dtype=np.uint8).tobytes(), 8, 8
    )
    color = encode_jpeg_progressive_color(
        rng.integers(0, 256, (8, 8, 3), dtype=np.uint8).tobytes(), 8, 8
    )
    with pytest.raises(ValueError, match="3-component"):
        decode_jpeg_color(gray)
    with pytest.raises(ValueError, match="grayscale"):
        decode_jpeg_gray(color)


def test_progressive_decodes_through_stdlib_dispatch(spark):
    """decode_image_stdlib (the D3 dead-letter mapper's decode path)
    now decodes progressive streams instead of dead-lettering them —
    and still dead-letters a TRUNCATED progressive stream with the
    JPEG: reason, through an actual Arrow-batched mapInPandas."""
    import pandas as pd

    from aprs2influxdb_spark.operators.multimodal import decode_image_stdlib

    img = bytes(range(64)) * 4
    prog = encode_jpeg_progressive_gray(img, 16, 16)
    feat = decode_image_stdlib(prog)
    base_feat = decode_image_stdlib(encode_jpeg_gray(img, 16, 16))
    assert feat["feat_mean"] == base_feat["feat_mean"]

    def _decode(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    f = decode_image_stdlib(bytes(payload))
                    rows.append((int(mid), f["feat_mean"], None))
                except ValueError as e:
                    rows.append((int(mid), None, str(e)))
            yield pd.DataFrame(rows, columns=["media_id", "feat_mean", "error"])

    df = spark.createDataFrame(
        [(0, bytearray(prog)), (1, bytearray(prog[: len(prog) // 2]))],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in df.mapInPandas(
            _decode, "media_id long, feat_mean long, error string"
        ).collect()
    }
    assert out[0]["error"] is None and out[0]["feat_mean"] == feat["feat_mean"]
    assert out[1]["feat_mean"] is None and "JPEG" in out[1]["error"]
