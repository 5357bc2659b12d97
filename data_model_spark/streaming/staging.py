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


def stage_parquet(src_path: str, staged_dir: str, prefix: str = "a") -> float:
    """Symlink the data file(s) of ``src_path`` into ``staged_dir``.

    ``src_path`` may be a single parquet file or a directory-shaped
    parquet dataset (part-files inside).  Returns the newest target
    mtime among the staged files.
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
        os.symlink(f, os.path.join(staged_dir, f"{prefix}{i:04d}_{os.path.basename(f)}"))
        newest = max(newest, os.path.getmtime(f))
    return newest
