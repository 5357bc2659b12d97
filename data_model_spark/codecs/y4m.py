"""Minimal YUV4MPEG2 (Y4M) video container codec — written from the public
format description (mjpegtools yuv4mpeg(5) man page): an ASCII stream
header ``YUV4MPEG2 W<w> H<h> F<n>:<d> ...`` followed by ``FRAME`` headers,
each with raw planar YCbCr data.

Supports C420jpeg/C420/C420mpeg2 (Y + quarter-size Cb,Cr) and Cmono
(Y only).  The engine treats video as grayscale frame stacks, so decode
returns the luma plane per frame; chroma is parsed (to advance correctly)
and discarded.  This is the honest-codec minimum for the video column —
one REAL video container decodes end-to-end without ffmpeg; compressed
codecs stay behind the NotImplementedError boundary in
``operators/multimodal.decode_video_frames``.
"""

from __future__ import annotations

import numpy as np


def encode_y4m_mono(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 luma frames -> Y4M Cmono stream."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M stream -> ((n, h, w) uint8 luma frames, (fps_n, fps_d)).

    Walks the real container: parses the stream-header parameter list,
    sizes planes from the colourspace tag, splits on per-frame headers
    (which may carry their own parameters — skipped to the newline).
    """
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = "C420jpeg"  # spec default when no C tag present
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = (int(num), int(den))
        elif tok[0] == "C":
            cs = tok
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    y_size = w * h
    if cs.startswith("C420"):
        frame_size = y_size + 2 * ((w // 2) * (h // 2))
    elif cs == "Cmono":
        frame_size = y_size
    elif cs.startswith("C422"):
        frame_size = y_size + 2 * ((w // 2) * h)
    elif cs.startswith("C444"):
        frame_size = 3 * y_size
    else:
        raise NotImplementedError(f"colourspace {cs}")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME header at byte {pos}")
        fnl = payload.index(b"\n", pos)  # frame params (if any) end here
        pos = fnl + 1
        plane = payload[pos : pos + y_size]
        if len(plane) < y_size:
            raise ValueError("truncated frame")
        frames.append(np.frombuffer(plane, dtype=np.uint8).reshape(h, w))
        pos += frame_size
    return (
        np.stack(frames) if frames else np.zeros((0, h, w), dtype=np.uint8),
        fps,
    )
