"""Minimal RIFF/WAVE PCM codec — written from the public RIFF/WAVE spec
(Microsoft/IBM "Multimedia Programming Interface and Data Specification
1.0", 1991; WAVEFORMAT / 'fmt ' + 'data' chunks).

Supports uncompressed integer PCM (wFormatTag=1), 8-bit unsigned and
16-bit signed little-endian, any channel count.  This is the honest-codec
minimum for the audio column: at least one REAL audio container decodes
end-to-end in this dependency-free environment; compressed formats
(mp3/flac/aac) remain behind the clearly-marked NotImplementedError in
``operators/multimodal.decode_audio`` and slot in via a library on a real
cluster.

Reference parity: the reference engine has no audio path; this supports the
training-data multimodal suite (SURVEY.md LLM-pipeline operators).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, channels: int = 1
) -> bytes:
    """Encode samples as a 16-bit PCM WAVE file.

    ``samples``: float array in [-1, 1) (quantized here) or int16; shape
    (n,) for mono or (n, channels).
    """
    x = np.asarray(samples)
    if x.dtype != np.int16:
        x = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] != channels:
        raise ValueError(f"shape {x.shape} != {channels} channels")
    data = x.astype("<i2").tobytes()  # interleaved frames
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAVE file -> (float64 samples (n, channels) in [-1, 1],
    sample_rate).  Walks the chunk list (word-aligned, per spec) so extra
    chunks (LIST/INFO, fact, ...) are skipped, not fatal."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_info = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + size > len(payload):
            # declared size runs past the payload: corrupt/truncated file —
            # raise rather than silently decoding a short sample stream
            raise ValueError(
                f"truncated {cid!r} chunk: declares {size} bytes, "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"fmt chunk too short: {len(body)} < 16 bytes")
            fmt_info = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt_info
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM wFormatTag={audio_format}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:  # 8-bit WAVE is unsigned per spec
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    n = (len(x) // channels) * channels
    return x[:n].reshape(-1, channels), int(rate)
