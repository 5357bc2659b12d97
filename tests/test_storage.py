"""S3A storage-configuration layer (sources/storage.py)."""

from data_model_spark.sources import storage


class TestS3AOptions:
    def test_fsspec_names_map_to_s3a_keys(self):
        conf = storage.s3a_options(
            {"endpoint_url": "https://s3.example.com", "key": "AK", "secret": "SK"}
        )
        assert conf["spark.hadoop.fs.s3a.endpoint"] == "https://s3.example.com"
        assert conf["spark.hadoop.fs.s3a.access.key"] == "AK"
        assert conf["spark.hadoop.fs.s3a.secret.key"] == "SK"

    def test_anon_selects_anonymous_provider(self):
        conf = storage.s3a_options({"anon": True})
        assert conf["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
            "AnonymousAWSCredentialsProvider"
        )

    def test_scale_defaults_present(self):
        conf = storage.s3a_options()
        assert conf["spark.hadoop.fs.s3a.committer.name"] == "magic"
        assert conf["spark.hadoop.fs.s3a.fast.upload"] == "true"
        assert conf["spark.hadoop.fs.s3a.experimental.input.fadvise"] == "random"

    def test_pool_sized_to_executor_cores(self):
        conf = storage.s3a_options(executor_cores=48)
        assert conf["spark.hadoop.fs.s3a.connection.maximum"] == "144"
        assert conf["spark.hadoop.fs.s3a.threads.max"] == "96"

    def test_http_endpoint_implies_path_style_no_ssl(self):
        conf = storage.s3a_options({"endpoint": "http://minio:9000"})
        assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
        assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"

    def test_bool_and_passthrough_options(self):
        conf = storage.s3a_options({"requester_pays": True, "paging_maximum": 1000})
        assert conf["spark.hadoop.fs.s3a.requester.pays.enabled"] == "true"
        assert conf["spark.hadoop.fs.s3a.paging.maximum"] == "1000"


class TestConfigureStorage:
    def test_applies_to_live_hadoop_conf(self, spark):
        storage.configure_storage(
            spark, {"endpoint": "https://eodata.example", "anon": True}
        )
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        assert hconf.get("fs.s3a.endpoint") == "https://eodata.example"
        assert hconf.get("fs.s3a.committer.name") == "magic"


class TestSparkPath:
    def test_s3_scheme_routes_to_s3a(self):
        assert (
            storage.spark_path("s3://bucket//a//b/c.parquet")
            == "s3a://bucket/a/b/c.parquet"
        )

    def test_local_paths_untouched(self):
        assert storage.spark_path("/data/x.parquet") == "/data/x.parquet"
