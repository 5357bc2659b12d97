"""Optional C acceleration for the JPEG entropy-scan decode.

Compiles ``_huffman.c`` with the system C compiler once per machine (cached
as a shared object keyed by the source hash under ``~/.cache`` or
``/tmp``), loads it via ctypes, and exposes ``decode_scan``.  Everything is
best-effort: any failure (no compiler, read-only filesystem, load error)
leaves ``decode_scan = None`` and callers keep the pure-Python loop.

Concurrent first-use by many executor workers is safe: each process
compiles to a private temp name and atomically renames into place.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

decode_scan = None  # (buf, scan_len, dc_tbl, ac_tbl, n_blocks, out) -> int


def _build() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "_huffman.c")
    try:
        with open(src, "rb") as f:
            code = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(code).hexdigest()[:16]
    for base in (
        os.path.join(os.path.expanduser("~"), ".cache", "dms-codecs"),
        os.path.join(tempfile.gettempdir(), "dms-codecs"),
    ):
        so = os.path.join(base, f"_huffman-{tag}.so")
        if os.path.exists(so):
            return so
        try:
            os.makedirs(base, exist_ok=True)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=base)
            os.close(fd)
            r = subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                capture_output=True,
                timeout=60,
            )
            if r.returncode != 0:
                os.unlink(tmp)
                continue
            os.replace(tmp, so)  # atomic; concurrent builders converge
            return so
        except Exception:
            try:
                os.unlink(tmp)
            except Exception:
                pass
            continue
    return None


def _load() -> None:
    global decode_scan
    if os.environ.get("DMS_NO_NATIVE"):
        return
    so = _build()
    if so is None:
        return
    try:
        lib = ctypes.CDLL(so)
        fn = lib.decode_scan
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32),
        ]
        decode_scan = fn
    except Exception:
        decode_scan = None


_load()
