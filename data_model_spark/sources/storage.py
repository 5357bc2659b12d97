"""Object-store configuration layer (reference: eopf_geozarr storage options).

The reference passes fsspec-style storage options (endpoint URL, anonymous
access, credentials) down to its zarr/s3fs stack when a store path is
``s3://`` (see reference ``cli.py`` ``--s3-endpoint``/``--s3-anon`` flags and
``data_api/store.py`` path handling).  Spark's equivalent surface is the
Hadoop S3A connector: the same options become ``fs.s3a.*`` keys on the
session's Hadoop configuration, and ``s3://`` URIs are rewritten to
``s3a://`` so every ``spark.read.parquet(...)`` / ``df.write`` routes through
the connector unchanged.

Scale defaults baked in (the 100 TB notes):

* **magic committer** — task commits become S3 multipart-complete calls, no
  rename-based commit (S3 has no atomic rename; the classic FileOutputCommitter
  v1/v2 either double-copies or is unsafe under speculative execution).
* **fast upload on heap-buffered multiparts** — writers stream 64 MB parts as
  they fill instead of staging whole files on local disk.
* **bounded connection pool sized to executor cores** — each S3A filesystem
  instance keeps ``threads.max``/``connection.maximum`` aligned with the
  task slots actually hitting it, so a 1000-executor job doesn't DDoS the
  endpoint or starve itself.
* **directory-marker keep** — avoids one DELETE per written object on
  deep prefixes (safe for any modern S3A reader).

Everything here only manipulates configuration; it is exercised by tests
against the live local session's Hadoop configuration (no bucket needed) and
by the path-routing unit tests.
"""

from __future__ import annotations

from typing import Mapping

from ..functions.paths import is_s3_path, normalize_s3_path

_S3A_PREFIX = "spark.hadoop.fs.s3a."

#: scale-safe defaults, overridable by caller options
S3A_DEFAULTS: dict[str, str] = {
    "committer.name": "magic",
    "committer.magic.enabled": "true",
    "fast.upload": "true",
    "fast.upload.buffer": "array",
    "multipart.size": "67108864",  # 64 MB parts
    "block.size": "134217728",  # 128 MB split hint for scans
    "connection.maximum": "96",
    "threads.max": "64",
    "directory.marker.retention": "keep",
    "experimental.input.fadvise": "random",  # parquet footer+column seeks
}

#: fsspec/boto-style option name -> fs.s3a.* suffix
_OPTION_MAP = {
    "endpoint_url": "endpoint",
    "endpoint": "endpoint",
    "key": "access.key",
    "access_key": "access.key",
    "secret": "secret.key",
    "secret_key": "secret.key",
    "token": "session.token",
    "session_token": "session.token",
    "region": "endpoint.region",
    "requester_pays": "requester.pays.enabled",
}


def s3a_options(
    storage_options: Mapping[str, object] | None = None,
    executor_cores: int | None = None,
) -> dict[str, str]:
    """fsspec-style options -> full ``spark.hadoop.fs.s3a.*`` key/value map.

    ``anon=True`` selects the AnonymousAWSCredentialsProvider (public
    buckets, the reference's ``--s3-anon`` mode).  ``executor_cores`` right-
    sizes the connection pool: 3 connections / 2 threads per task slot
    (parquet readers hold a footer + a column stream per task).
    """
    conf = dict(S3A_DEFAULTS)
    opts = dict(storage_options or {})
    if opts.pop("anon", False):
        conf["aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    user_keys: set[str] = set()
    for name, value in opts.items():
        suffix = _OPTION_MAP.get(name)
        if suffix is None:
            # passthrough: already an fs.s3a suffix ("endpoint", "paging.maximum", ...)
            suffix = name.replace("_", ".")
        conf[suffix] = str(value).lower() if isinstance(value, bool) else str(value)
        user_keys.add(suffix)
    if executor_cores:
        # sizing is a default — an explicitly passed connection.maximum /
        # threads.max in storage_options always wins
        if "connection.maximum" not in user_keys:
            conf["connection.maximum"] = str(max(32, executor_cores * 3))
        if "threads.max" not in user_keys:
            conf["threads.max"] = str(max(16, executor_cores * 2))
    if conf.get("endpoint", "").startswith("http://"):
        conf.setdefault("connection.ssl.enabled", "false")
        conf.setdefault("path.style.access", "true")  # MinIO-style endpoints
    return {_S3A_PREFIX + k: v for k, v in conf.items()}


def configure_storage(spark, storage_options=None, executor_cores=None) -> None:
    """Apply the S3A option map to a live session's Hadoop configuration.

    Session-level ``spark.hadoop.*`` keys only take effect at session build
    time; at runtime the same keys (minus the ``spark.hadoop.`` prefix) go on
    ``sc.hadoopConfiguration``, which newly-created S3A filesystem instances
    pick up.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in s3a_options(storage_options, executor_cores).items():
        hconf.set(k[len("spark.hadoop."):], v)


def spark_path(path: str) -> str:
    """Route a user path to the scheme Spark reads: s3:// -> s3a://."""
    if is_s3_path(path):
        return "s3a://" + normalize_s3_path(path)[len("s3://"):]
    return path
