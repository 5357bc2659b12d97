"""Shared staging for file-stream drain harnesses.

The file streaming source reads top-level data files of the source
directory; it does not descend into a nested directory produced by a
Spark parquet write.  ``stage_parquet`` therefore symlinks either the
single file, or every part-file of a directory-shaped parquet dataset,
directly into the staged directory.

Ordering note: the source orders micro-batches by the modification time
``java.io.File.lastModified()`` reports, which FOLLOWS symlinks — so
backdating a symlink's own mtime does nothing.  Callers that need later
batches (flush sentinels) must date them after the staged data's real
target mtimes; ``stage_parquet`` returns the newest one.
"""

from __future__ import annotations

import os
import shutil


def stage_parquet(
    src_path: str,
    staged_dir: str,
    prefix: str = "a",
    copy: bool = False,
    mtime: float | None = None,
) -> tuple[float, int]:
    """Symlink the data file(s) of ``src_path`` into ``staged_dir``.

    ``src_path`` may be a single parquet file or a directory-shaped
    parquet dataset (part-files inside).  Returns (newest target mtime
    among the staged files, number of files staged).

    The file count matters for correctness, not just bookkeeping: a
    drain harness must set ``maxFilesPerTrigger`` to AT LEAST the number
    of data files of one logical input, so the whole input lands in one
    micro-batch.  Split across batches, the first batch's max event time
    advances the watermark and rows in later part-files that fall behind
    it are silently discarded as late data — breaking the
    streaming == batch oracle equality the harnesses exist to prove.

    ``copy=True`` materializes real copies instead of symlinks, and
    ``mtime`` forces their modification time — the only way to place a
    staged replica in a LATER micro-batch than the original, since
    symlinks share the target's mtime (``lastModified()`` follows them).
    """
    src = os.path.abspath(src_path)
    newest = 0.0
    if os.path.isfile(src):
        files = [src]
    else:
        files = sorted(
            os.path.join(src, f)
            for f in os.listdir(src)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if not files:
            raise FileNotFoundError(f"no parquet data files under {src}")
    for i, f in enumerate(files):
        dst = os.path.join(staged_dir, f"{prefix}{i:04d}_{os.path.basename(f)}")
        if copy:
            shutil.copyfile(f, dst)
            if mtime is not None:
                os.utime(dst, (mtime, mtime))
            newest = max(newest, os.path.getmtime(dst))
        else:
            os.symlink(f, dst)
            newest = max(newest, os.path.getmtime(f))
    return newest, len(files)
