"""RIFF/WAVE PCM16 codec, pure stdlib — the audio leg of the
multimodal surface (round-5 sibling of ``functions.png`` and
``functions.jpeg``; round-4 verdict "What's missing #2" listed audio
decode as PIL/librosa-stubbed).

PCM is lossless, so unlike JPEG the WHOLE path is exact: encode →
decode reproduces every sample bit-identically, and any feature of the
samples (RMS energy, zero crossings, peak) is closed-form computable
by the DuckDB oracle from the same synthetic-waveform definition.

Scope: canonical RIFF little-endian, one ``fmt `` chunk (PCM,
16-bit), one ``data`` chunk, mono or interleaved multi-channel;
unknown chunks (LIST, fact, ...) are skipped on decode, as the spec
requires.  No compression formats — format codes other than 1 (PCM)
are rejected loudly.

Reference parity note: the reference (aprs2influxdb) has no audio
path; this serves SURVEY's north-star multimodal surface.
"""

from __future__ import annotations

import struct


def encode_wav_pcm16(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Encode int16 ``samples`` (interleaved if multi-channel) as a
    canonical RIFF/WAVE stream."""
    if channels < 1:
        raise ValueError("encode_wav_pcm16: channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("encode_wav_pcm16: sample count not a multiple of channels")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"encode_wav_pcm16: sample {s} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE PCM16 stream → (sample_rate, channels,
    samples interleaved).  Skips unknown chunks; rejects non-PCM
    format codes and non-16-bit widths."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("WAV: missing RIFF/WAVE header")
    pos = 12
    sample_rate = channels = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt_code, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_code != 1:
                raise ValueError(f"WAV: unsupported format code {fmt_code} (PCM only)")
            if bits != 16:
                raise ValueError(f"WAV: unsupported bit depth {bits} (16 only)")
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) & ~1]))
    return sample_rate, channels, samples


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
