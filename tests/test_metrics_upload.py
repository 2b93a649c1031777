"""Metrics layer + upload stage tests."""

import os

from pyspark.sql import Row

from baker_spark import operators as ops
from baker_spark.metrics import LogMetrics, StatsDumper, StatsdMetrics, collect_observations
from baker_spark.sinks.upload import S3Upload


def test_count_and_tag_observation(spark):
    df = spark.createDataFrame([Row(f1="a"), Row(f1="b"), Row(f1="a")])
    op = ops.CountAndTag(metric="rows_seen", field="f1")
    out = op.apply(df)
    out.write.format("noop").mode("overwrite").save()  # action
    metrics = collect_observations([op])
    assert metrics["rows_seen"]["count"] == 3


def test_stats_dumper(spark):
    client = LogMetrics()
    with StatsDumper(spark, client=client, interval=0.05):
        spark.range(100000).selectExpr("sum(id)").collect()
    assert any(line.startswith("Stats:") for line in client.lines)


def test_statsd_metrics_fire_and_forget():
    # no listener on the port — sends must not raise (fire-and-forget UDP)
    m = StatsdMetrics(port=18125)
    m.gauge("g", 1.5, tags=["k:v"])
    m.delta_count("c", 2)
    m.histogram("h", 0.25)


def test_s3_upload_retry(tmp_path):
    staging = tmp_path / "staging"
    (staging / "sub").mkdir(parents=True)
    (staging / "a.csv.gz").write_text("x")
    (staging / "sub" / "b.csv.gz").write_text("y")

    attempts = {}
    uploaded = []

    def flaky_upload(path, bucket, key):
        attempts[key] = attempts.get(key, 0) + 1
        if attempts[key] == 1:
            raise IOError("transient")
        uploaded.append((bucket, key))

    up = S3Upload(source_base_path=str(staging), bucket="b", prefix="pre", upload_fn=flaky_upload)
    keys = up.run()
    assert sorted(keys) == [os.path.join("pre", "a.csv.gz"), os.path.join("pre", "sub", "b.csv.gz")]
    assert all(n == 2 for n in attempts.values())  # first try failed, retried
