"""Baseline JFIF (JPEG) codec written from the public spec (ITU-T T.81).

No imaging library exists in this container, so — as with PNG (RFC 2083,
``png.py``) — the codec is implemented from the standard: 8x8 FDCT/IDCT,
Annex K.1 luminance quantization scaled IJG-style by quality, Annex K.3
standard Huffman tables, zigzag + (run, size) entropy coding, JFIF APP0,
0xFF byte stuffing.  Single-component (grayscale), no subsampling — a valid
baseline sequential stream any standard decoder reads.

Engineering for the Arrow batch path (no per-pixel Python):

* encoder — DCT/quantization via one ``einsum`` over all blocks; the
  entropy stage builds (code, length) arrays for every symbol with NumPy
  run-length arithmetic and packs bits with ``np.packbits``; byte stuffing
  is ``bytes.replace``.
* decoder — canonical-Huffman *16-bit peek table* (symbol + consumed bits
  per entry), so the only Python loop is per SYMBOL, not per bit; IDCT is
  one ``einsum`` over all blocks.

16-bit samples ride through an affine rescale to 8-bit (min/scale stored
in an APP4 segment) — the CF scale/offset packing idea (SURVEY §2 F6)
applied to the codec boundary.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (T.81 Annex K)
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# DC luminance (Annex K.3.1): BITS then HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# AC luminance (Annex K.3.2)
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 (canonical code assignment)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_CODE = _canonical_codes(DC_BITS, DC_VALS)
AC_CODE = _canonical_codes(AC_BITS, AC_VALS)


def _peek_table(bits: list[int], vals: list[int]) -> np.ndarray:
    """65536-entry decode table: top-16-bits -> (symbol << 8) | code length."""
    table = np.zeros(1 << 16, dtype=np.uint32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            table[lo:hi] = (vals[k] << 8) | length
            code += 1
            k += 1
        code <<= 1
    return table


DC_PEEK = _peek_table(DC_BITS, DC_VALS)
AC_PEEK = _peek_table(AC_BITS, AC_VALS)

# orthonormal DCT-II basis: F = C @ block @ C.T
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.where(
    _k[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex K.1 luminance table."""
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    t = (QUANT_LUMA * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _to_blocks(img8: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8, return (n, 8, 8) blocks."""
    h, w = img8.shape
    ph, pw = (-h) % 8, (-w) % 8
    a = np.pad(img8, ((0, ph), (0, pw)), mode="edge")
    bh, bw = a.shape[0] // 8, a.shape[1] // 8
    blocks = a.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, bh, bw


def _from_blocks(blocks: np.ndarray, bh: int, bw: int, h: int, w: int) -> np.ndarray:
    a = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return a[:h, :w]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_scan(zz: np.ndarray) -> bytes:
    """Entropy-code zigzagged quantized blocks (n, 64) -> stuffed scan bytes.

    Fully vectorized: every Huffman symbol and extra-bits field across all
    blocks becomes one row of a (value, length) array; bits are laid out by
    cumsum offsets and packed with np.packbits.
    """
    n = zz.shape[0]
    dc = zz[:, 0].astype(np.int64)
    diff = np.diff(dc, prepend=0)

    # DC: category size + extra bits
    mag = np.abs(diff)
    size = np.zeros(n, dtype=np.int64)
    nz = mag > 0
    size[nz] = np.floor(np.log2(mag[nz])).astype(np.int64) + 1
    extra = np.where(diff >= 0, diff, diff + (1 << size) - 1)

    dc_codes = np.array([DC_CODE[s][0] for s in range(12)], dtype=np.int64)
    dc_lens = np.array([DC_CODE[s][1] for s in range(12)], dtype=np.int64)
    ac_codes = np.zeros(256, dtype=np.int64)
    ac_lens = np.zeros(256, dtype=np.int64)
    for sym, (c, ln) in AC_CODE.items():
        ac_codes[sym], ac_lens[sym] = c, ln

    # AC: global run-length over the flattened (n, 63) coefficient stream.
    ac = zz[:, 1:].astype(np.int64)
    flat = ac.ravel()
    pos = np.flatnonzero(flat)  # nonzero coefficient positions
    blk = pos // 63
    idx = pos % 63
    # zero-run before each nonzero: distance to previous nonzero in-block
    prev_idx = np.full(len(pos), -1, dtype=np.int64)
    if len(pos):
        same_blk = np.zeros(len(pos), dtype=bool)
        same_blk[1:] = blk[1:] == blk[:-1]
        prev_idx[same_blk] = idx[np.flatnonzero(same_blk) - 1]
    run = idx - prev_idx - 1

    vals = flat[pos]
    vmag = np.abs(vals)
    vsize = np.floor(np.log2(vmag)).astype(np.int64) + 1
    vextra = np.where(vals >= 0, vals, vals + (1 << vsize) - 1)

    # emit per nonzero: ZRL * (run // 16), then (run % 16, size) + extra —
    # huffman code and extra bits MERGED into one <=26-bit field
    nzrl = run // 16
    rrun = run % 16
    sym = (rrun << 4) | vsize

    # EOB for blocks whose last nonzero isn't coefficient 63 (or empty blocks)
    last_nz_idx = np.full(n, -1, dtype=np.int64)
    if len(pos):
        # positions are sorted; last occurrence per block wins
        last_nz_idx[blk] = idx
    needs_eob = last_nz_idx != 62

    zrl_code, zrl_len = AC_CODE[0xF0]
    eob_code, eob_len = AC_CODE[0x00]

    # fields per nonzero: nzrl ZRL codes + 1 merged (code|extra) field;
    # per block: 1 merged DC field [+ 1 EOB]
    per_nz = 1 + nzrl
    nz_per_blk = np.bincount(blk, weights=per_nz, minlength=n).astype(np.int64)
    fields_per_blk = 1 + nz_per_blk + needs_eob.astype(np.int64)
    total_fields = int(fields_per_blk.sum())
    fvals = np.zeros(total_fields, dtype=np.int64)
    flens = np.zeros(total_fields, dtype=np.int64)

    blk_off = np.concatenate([[0], np.cumsum(fields_per_blk)[:-1]])
    # merged DC field (code << size | extra) at the head of each block
    fvals[blk_off] = (dc_codes[size] << size) | extra
    flens[blk_off] = dc_lens[size] + size
    # EOB at the tail of blocks that need it
    eob_at = blk_off + fields_per_blk - 1
    fvals[eob_at[needs_eob]] = eob_code
    flens[eob_at[needs_eob]] = eob_len
    # nonzero fields: position = block head + 1 + fields consumed by earlier
    # nonzeros of the same block
    if len(pos):
        csum = np.cumsum(per_nz)
        within = csum - per_nz  # fields consumed before this nz, global
        first_of_blk = np.ones(len(pos), dtype=bool)
        first_of_blk[1:] = blk[1:] != blk[:-1]
        # per-position: `within` at this block's first nonzero (within is
        # nondecreasing, so a running max over block-first snapshots works)
        blk_first = np.maximum.accumulate(np.where(first_of_blk, within, 0))
        local = within - blk_first
        base = blk_off[blk] + 1 + local
        max_zrl = int(nzrl.max()) if len(nzrl) else 0
        for j in range(max_zrl):
            sel = nzrl > j
            fvals[base[sel] + j] = zrl_code
            flens[base[sel] + j] = zrl_len
        fvals[base + nzrl] = (ac_codes[sym] << vsize) | vextra
        flens[base + nzrl] = ac_lens[sym] + vsize

    # append byte-boundary padding with 1-bits (T.81 F.1.2.3) as a field
    total_bits = int(flens.sum())
    pad = (-total_bits) % 8
    if pad:
        fvals = np.concatenate([fvals, [(1 << pad) - 1]])
        flens = np.concatenate([flens, [pad]])
        total_bits += pad

    # word-windowed bit packing: each field (<=27 bits) lands in a 64-bit
    # big-endian window over two 32-bit words — no per-bit arrays, so the
    # working set stays ~total_bits/8 bytes
    starts = np.cumsum(flens) - flens
    wi = starts >> 5
    off = starts & 31
    val64 = fvals.astype(np.uint64) << (64 - off - flens).astype(np.uint64)
    nwords = (total_bits + 31) // 32 + 1
    words = np.zeros(nwords, dtype=np.uint64)
    np.add.at(words, wi, val64 >> np.uint64(32))
    np.add.at(words, wi + 1, val64 & np.uint64(0xFFFFFFFF))
    scan = (
        words.astype(">u4").tobytes()[: (total_bits + 7) // 8]
    )
    return scan.replace(b"\xff", b"\xff\x00")  # byte stuffing


def _reconstruct_gray8(zz: np.ndarray, q: np.ndarray, bh: int, bw: int, h: int, w: int) -> np.ndarray:
    """Dequantize + IDCT of zigzagged quantized blocks — the exact pixel
    arithmetic of ``decode_jpeg_gray8`` (same dtypes, same einsum, same
    rounding), shared by the decoder and by ``encode_jpeg_gray8``'s
    ``return_decoded`` path (entropy coding is lossless, so the encoder's
    own ``zz`` equals what the decoder recovers from the stream)."""
    coeffs = zz[:, UNZIGZAG].reshape(-1, 8, 8) * q
    blocks = np.einsum("ji,njk,kl->nil", _C, coeffs.astype(np.float64), _C)
    img = _from_blocks(blocks, bh, bw, h, w) + 128.0
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def encode_jpeg_gray8(
    img8: np.ndarray,
    quality: int = 95,
    extra_app: bytes | None = None,
    return_decoded: bool = False,
):
    """Encode a (h, w) uint8 image as baseline JFIF, grayscale.

    ``extra_app``: optional payload written as an APP4 segment after APP0
    (application data per T.81 B.2.4.6 — standard decoders skip it).

    ``return_decoded=True`` additionally returns the decoded-pixel
    reconstruction ``(bytes, uint8 array)`` computed directly from the
    encoder's quantized coefficients — bit-identical to
    ``decode_jpeg_gray8(bytes)`` (asserted in tests) without paying the
    entropy-decode pass.
    """
    img8 = np.asarray(img8, dtype=np.uint8)
    h, w = img8.shape
    q = quant_table(quality)
    blocks, bh, bw = _to_blocks(img8)
    f = np.einsum("ij,njk,lk->nil", _C, blocks.astype(np.float64) - 128.0, _C)
    zz = np.round(f / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
    scan = _encode_scan(zz)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if extra_app:
        out += b"\xff\xe4" + struct.pack(">H", len(extra_app) + 2) + extra_app
    # DQT (table 0, 8-bit, zigzag order)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(int(v) for v in q.reshape(64)[ZIGZAG])
    # SOF0: 8-bit precision, 1 component, no subsampling
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    # DHT: DC table 0 + AC table 0
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        payload = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    if return_decoded:
        return bytes(out), _reconstruct_gray8(zz, q, bh, bw, h, w)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def read_app4(data: bytes) -> bytes | None:
    """Return the first APP4 segment payload, if any (marker walk only)."""
    i = 2
    while i < len(data) - 3 and data[i] == 0xFF:
        marker = data[i + 1]
        if marker in (0xD9, 0xDA):
            return None
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if marker == 0xE4:
            return data[i + 4 : i + 2 + ln]
        i += 2 + ln
    return None


def decode_jpeg_gray8(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF grayscale stream produced by any encoder
    (single component, tables as declared in the stream).

    Honest boundaries: progressive/extended SOFs, multi-component scans and
    restart intervals (DRI/RSTn) raise NotImplementedError rather than
    mis-decoding; 0xFF fill padding before markers is accepted.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    i = 2
    qt = {}
    dc_peek, ac_peek = {}, {}
    h = w = None
    dc_tid = ac_tid = 0
    scan = None
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1  # 0xFF fill bytes before a marker are legal padding
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0xDD:  # DRI: restart intervals
            raise NotImplementedError(
                "restart intervals (DRI/RSTn) not supported by this decoder"
            )
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers carry no length field; none are expected
            # outside entropy data in the streams we accept
            raise NotImplementedError(f"standalone marker 0x{marker:02x}")
        ln = struct.unpack(">H", data[i : i + 2])[0]
        seg = data[i + 2 : i + ln]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            p = 0
            while p < len(seg):
                tid = seg[p] & 0x0F
                prec = seg[p] >> 4
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tid] = tbl[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC0:  # SOF0 baseline
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if nc != 1:
                raise NotImplementedError("only single-component (grayscale) JPEG")
            qtid = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential (SOF0) JPEG")
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (dc_peek if cls == 0 else ac_peek)[tid] = _peek_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDA:  # SOS: [Ns, Cs1, Td<<4|Ta, Ss, Se, AhAl]
            dc_tid, ac_tid = seg[2] >> 4, seg[2] & 0x0F
            j = i + ln
            # entropy data runs to the next real marker (skip stuffed FF00):
            # jump FF-to-FF with bytes.find instead of walking every byte
            k = j
            while True:
                k = data.find(b"\xff", k)
                if k == -1 or k >= len(data) - 1:
                    k = len(data) - 1
                    break
                nxt = data[k + 1]
                if nxt == 0x00:
                    k += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:  # RSTn inside the scan
                    raise NotImplementedError(
                        "restart markers in entropy data not supported"
                    )
                break
            scan = data[j:k].replace(b"\xff\x00", b"\xff")
            i = k
            continue
        i += ln
    if scan is None or h is None:
        raise ValueError("truncated JPEG stream")

    q = qt[qtid]
    bh, bw = (h + 7) // 8, (w + 7) // 8
    n = bh * bw

    # native scan decode when the compiled helper is available (identical
    # algorithm, ~40x the symbol loop); nonzero return = malformed stream,
    # fall through to the python loop so error behavior is unchanged
    from . import _native

    if _native.decode_scan is not None:
        import ctypes

        coeffs = np.zeros(n * 64, dtype=np.int32)
        dc_t = np.ascontiguousarray(dc_peek[dc_tid], dtype=np.uint32)
        ac_t = np.ascontiguousarray(ac_peek[ac_tid], dtype=np.uint32)
        rc = _native.decode_scan(
            scan + b"\x00\x00\x00",
            len(scan),
            dc_t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ac_t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n,
            coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return _reconstruct_gray8(coeffs.reshape(n, 64), q, bh, bw, h, w)

    # symbol-level decode loop: plain-bytes indexing + list tables (numpy
    # scalar access is ~10x slower per op); one iteration per SYMBOL via the
    # 16-bit peek tables, never per bit
    tdc = dc_peek[dc_tid].tolist()
    tac = ac_peek[ac_tid].tolist()
    flat = [0] * (n * 64)
    buf = scan + b"\x00\x00\x00"
    pos = 0
    pred = 0
    for base in range(0, n * 64, 64):
        byte = pos >> 3
        peek = (
            ((buf[byte] << 16) | (buf[byte + 1] << 8) | buf[byte + 2])
            >> (8 - (pos & 7))
        ) & 0xFFFF
        e = tdc[peek]
        ln = e & 0xFF
        s = e >> 8
        pos += ln
        if s:
            byte = pos >> 3
            v = (
                ((buf[byte] << 16) | (buf[byte + 1] << 8) | buf[byte + 2])
                >> (24 - (pos & 7) - s)
            ) & ((1 << s) - 1)
            pos += s
            pred += v if v >= (1 << (s - 1)) else v - (1 << s) + 1
        flat[base] = pred
        k = 1
        while k < 64:
            byte = pos >> 3
            peek = (
                ((buf[byte] << 16) | (buf[byte + 1] << 8) | buf[byte + 2])
                >> (8 - (pos & 7))
            ) & 0xFFFF
            e = tac[peek]
            pos += e & 0xFF
            sym = e >> 8
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += sym >> 4
            s = sym & 0x0F
            byte = pos >> 3
            v = (
                ((buf[byte] << 16) | (buf[byte + 1] << 8) | buf[byte + 2])
                >> (24 - (pos & 7) - s)
            ) & ((1 << s) - 1)
            pos += s
            flat[base + k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            k += 1
    zz = np.array(flat, dtype=np.int32).reshape(n, 64)
    return _reconstruct_gray8(zz, q, bh, bw, h, w)
