"""Path/storage-key functions (SURVEY §2 F8; reference
``conversion/fs_utils.py:110-181,246-268``).

Two surfaces:

* plain-Python helpers (driver-side config plumbing — ``is_s3_path``,
  ``parse_s3_path``, ``normalize_path``), mirroring the reference exactly;
* Spark ``Column`` expressions for the same operations over a distributed
  table of object-store keys (manifest tables at 10^12 objects are
  themselves big data) — pure JVM string functions, no UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# driver-side helpers (fs_utils.py twins)
# ---------------------------------------------------------------------------


def is_s3_path(path: str) -> bool:
    """fs_utils.py:142-157."""
    return path.startswith("s3://")


def normalize_s3_path(s3_path: str) -> str:
    """Drop empty segments (double slashes) but keep bucket/key structure
    (fs_utils.py:110-140)."""
    if not is_s3_path(s3_path):
        return s3_path
    parts = [p for p in s3_path[5:].split("/") if p]
    return "s3://" + "/".join(parts)


def parse_s3_path(s3_path: str) -> tuple[str, str]:
    """(bucket, key) of ``s3://bucket/key`` (fs_utils.py:160-181)."""
    if not is_s3_path(s3_path):
        raise ValueError(f"Invalid S3 path: {s3_path}")
    rest = s3_path[5:]
    bucket, _, key = rest.partition("/")
    return bucket, key.lstrip("/")


def normalize_path(path: str) -> str:
    """fs_utils.py:246-268: S3 normalization or os.path.normpath."""
    if is_s3_path(path):
        return normalize_s3_path(path)
    return os.path.normpath(path)


# ---------------------------------------------------------------------------
# Spark column expressions (distributed manifest tables)
# ---------------------------------------------------------------------------


def col_is_s3(path: Column) -> Column:
    return path.startswith("s3://")


def col_bucket(path: Column) -> Column:
    """Bucket of an s3:// path, NULL otherwise."""
    return F.when(col_is_s3(path), F.regexp_extract(path, r"^s3://([^/]*)", 1))


def col_key(path: Column) -> Column:
    """Key (sans leading slashes) of an s3:// path, NULL otherwise."""
    return F.when(
        col_is_s3(path),
        F.regexp_replace(F.regexp_extract(path, r"^s3://[^/]*(/.*)?$", 1), "^/+", ""),
    )


def col_normalize(path: Column) -> Column:
    """Double-slash removal: s3 scheme preserved, locals collapsed and
    right-stripped (the SQL-expressible core of normalize_path; ``..``
    resolution stays a driver-side concern)."""
    s3_norm = F.concat(
        F.lit("s3://"),
        F.array_join(
            F.filter(F.split(F.substring(path, 6, 1 << 20), "/"), lambda x: x != ""),
            "/",
        ),
    )
    local_norm = F.regexp_replace(
        F.regexp_replace(path, "/{2,}", "/"), "(.)/$", "$1"
    )
    return F.when(col_is_s3(path), s3_norm).otherwise(local_norm)
