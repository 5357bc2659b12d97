"""F8 path functions (reference fs_utils.py:110-181,246-268 semantics)."""

import pytest

from data_model_spark.functions import paths as P


def test_is_s3_path():
    assert P.is_s3_path("s3://b/k")
    assert not P.is_s3_path("/local/path")
    assert not P.is_s3_path("http://x")


def test_parse_s3_path():
    assert P.parse_s3_path("s3://bucket/key/x.tif") == ("bucket", "key/x.tif")
    assert P.parse_s3_path("s3://bucket") == ("bucket", "")
    assert P.parse_s3_path("s3://bucket//k") == ("bucket", "k")
    with pytest.raises(ValueError):
        P.parse_s3_path("/not/s3")


def test_normalize_matches_reference_cases():
    # fs_utils.normalize_s3_path drops empty segments, keeps bucket/key
    assert P.normalize_path("s3://b//scenes///x.tif") == "s3://b/scenes/x.tif"
    assert P.normalize_path("s3://b/") == "s3://b"
    # locals go through os.path.normpath (.. resolution included)
    assert P.normalize_path("/a//b/../c") == "/a/c"
    assert P.normalize_path("rel//x/") == "rel/x"


def test_spark_columns_match_python(spark):
    from pyspark.sql import functions as F

    from data_model_spark.sources.tables import local_df

    fixture = [
        "s3://bucket/a//b.tif",
        "s3://bucket",
        "/x//y/",
        "plain/rel//p",
    ]
    df = local_df(spark, [(x,) for x in fixture], "path string")
    got = df.select(
        "path",
        P.col_is_s3(F.col("path")).alias("is_s3"),
        P.col_bucket(F.col("path")).alias("bucket"),
        P.col_key(F.col("path")).alias("key"),
        P.col_normalize(F.col("path")).alias("norm"),
    ).collect()
    for r in got:
        assert r.is_s3 == P.is_s3_path(r.path)
        if r.is_s3:
            b, k = P.parse_s3_path(r.path)
            assert (r.bucket, r.key) == (b, k)
            assert r.norm == P.normalize_s3_path(r.path)
        else:
            assert r.bucket is None and r.key is None
