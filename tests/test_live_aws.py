"""Opt-in LIVE-endpoint smoke tests for the boto3 branches.

Everything AWS-shaped in this repo normally runs against injected fakes
(DirStreamClient / DirQueueClient / fake dynamodb clients / upload_fn),
which exercise the engine's logic but not the real client plumbing:
region handling, request shapes accepted by a real endpoint, waiter
timing, retry/throttle behavior. This module keeps that seam honest —
it drives the SAME production code paths (``_make_client``'s boto3
branch, ``DynamoDBWriter``'s default client factory, ``S3Upload``'s
default ``upload_fn``) against a live endpoint when one is available.

Run it deliberately:

    BAKER_SPARK_LIVE_AWS=1 python -m pytest tests/test_live_aws.py -v

Against LocalStack (recommended) set, before the command:

    AWS_ENDPOINT_URL=http://localhost:4566
    AWS_ACCESS_KEY_ID=test AWS_SECRET_ACCESS_KEY=test

boto3 >= 1.28 honors ``AWS_ENDPOINT_URL`` natively, so the production
code needs no endpoint plumbing. Against real AWS, ambient credentials
are used and every resource is uniquely named (``baker-spark-smoke-*``)
and deleted in ``finally`` blocks; the account still pays for the
minutes the resources exist — that's why this is opt-in.

Without ``BAKER_SPARK_LIVE_AWS=1`` (CI, the build sandbox) the whole
module skips cleanly and imports nothing AWS-shaped.
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

LIVE = os.environ.get("BAKER_SPARK_LIVE_AWS") == "1"
REGION = os.environ.get("AWS_DEFAULT_REGION", "us-west-2")

pytestmark = pytest.mark.skipif(
    not LIVE,
    reason="live AWS smoke tests are opt-in: set BAKER_SPARK_LIVE_AWS=1 "
    "(and AWS_ENDPOINT_URL for LocalStack)",
)


def _boto3():
    """boto3 + a reachable, authenticated endpoint — or a loud SKIP
    naming what's missing (flag set but no LocalStack/creds is a
    mis-configured invocation, not an engine failure)."""
    boto3 = pytest.importorskip("boto3", reason="live tests need boto3")
    import botocore.exceptions

    try:
        boto3.client("sts", region_name=REGION).get_caller_identity()
    except botocore.exceptions.NoCredentialsError:
        pytest.skip(
            "BAKER_SPARK_LIVE_AWS=1 but no AWS credentials resolved — "
            "set AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY (any value works "
            "for LocalStack) or provide ambient credentials"
        )
    except botocore.exceptions.EndpointConnectionError as e:
        pytest.skip(f"BAKER_SPARK_LIVE_AWS=1 but the endpoint is unreachable: {e}")
    return boto3


def _uniq(kind: str) -> str:
    return f"baker-spark-smoke-{kind}-{uuid.uuid4().hex[:8]}"


def _poll(fn, timeout=90.0, every=1.0, what="condition"):
    deadline = time.time() + timeout
    while time.time() < deadline:
        out = fn()
        if out:
            return out
        time.sleep(every)
    raise AssertionError(f"timed out waiting for {what}")


def test_live_kinesis_stream_roundtrip(spark):
    """bakerkinesis through the REAL boto3 branch: create a 1-shard
    stream, put records, read them via the streaming source from
    TRIM_HORIZON, tear down."""
    boto3 = _boto3()
    from baker_spark.streaming.kinesis_datasource import register

    client = boto3.client("kinesis", region_name=REGION)
    stream = _uniq("kin")
    client.create_stream(StreamName=stream, ShardCount=1)
    name = f"live_kin_{uuid.uuid4().hex[:6]}"
    q = None
    try:
        client.get_waiter("stream_exists").wait(
            StreamName=stream, WaiterConfig={"Delay": 2, "MaxAttempts": 45}
        )
        for i in range(3):
            client.put_record(
                StreamName=stream,
                Data=f"{i},click,user_{i}".encode(),
                PartitionKey=str(i),
            )
        register(spark)
        q = (
            spark.readStream.format("bakerkinesis")
            .option("stream", stream)
            .option("aws_region", REGION)
            .option("initial_position", "TRIM_HORIZON")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .start()
        )
        # poll for the FULL count: real Kinesis can make records visible
        # across successive GetRecords pages/triggers, so a first
        # non-empty collect may hold fewer than 3 rows without any bug
        # poll for AT LEAST the full count (real Kinesis can split
        # admission across triggers), then assert exactly — an
        # over-delivery must fail as a crisp duplication count, not
        # masquerade as a poll timeout
        rows = _poll(
            lambda: (
                q.processAllAvailable(),
                (lambda rs: rs if len(rs) >= 3 else None)(
                    spark.sql(f"SELECT * FROM {name}").collect()
                ),
            )[1],
            what="all 3 kinesis records in the memory sink",
        )
        assert len(rows) == 3, f"expected exactly 3 records, got {len(rows)} (duplication?)"
        payloads = {str(r[0]) for r in rows}  # first column carries the data
        assert any("click" in p for p in payloads)
    finally:
        if q is not None:
            q.stop()
        client.delete_stream(StreamName=stream, EnforceConsumerDeletion=True)


def test_live_sqs_queue_roundtrip(spark, tmp_path):
    """bakersqs through the REAL boto3 branch: plain-format messages
    (body = path of the notified file) land as records and are deleted
    after the batch commits."""
    boto3 = _boto3()
    from baker_spark.streaming.sqs_datasource import register

    client = boto3.client("sqs", region_name=REGION)
    qname = _uniq("sqs")
    queue_url = client.create_queue(QueueName=qname)["QueueUrl"]
    name = f"live_sqs_{uuid.uuid4().hex[:6]}"
    q = None
    try:
        data = tmp_path / "notified.csv"
        data.write_text("7,view,user_7\n")
        client.send_message(QueueUrl=queue_url, MessageBody=str(data))
        register(spark)
        q = (
            spark.readStream.format("bakersqs")
            .option("queue_names", qname)
            .option("aws_region", REGION)
            .option("message_format", "plain")
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .start()
        )
        rows = _poll(
            lambda: (
                q.processAllAvailable(),
                spark.sql(f"SELECT * FROM {name}").collect(),
            )[1]
            or None,
            what="sqs message in the memory sink",
        )
        assert any("user_7" in str(r) for r in rows)
        # delete-after-commit: check the QUEUE ATTRIBUTES, not
        # receive_message — a merely-consumed (invisible) message also
        # returns no Messages for its 30s visibility window, which would
        # make a receive-based check pass even with the delete removed
        def _empty():
            attrs = client.get_queue_attributes(
                QueueUrl=queue_url,
                AttributeNames=[
                    "ApproximateNumberOfMessages",
                    "ApproximateNumberOfMessagesNotVisible",
                ],
            )["Attributes"]
            return (
                "drained"
                if attrs["ApproximateNumberOfMessages"] == "0"
                and attrs["ApproximateNumberOfMessagesNotVisible"] == "0"
                else None
            )

        assert _poll(_empty, timeout=60, what="delete-after-commit") == "drained"
    finally:
        if q is not None:
            q.stop()
        client.delete_queue(QueueUrl=queue_url)


def test_live_dynamodb_batch_write(spark):
    """DynamoDBWriter's DEFAULT client factory against a real table:
    typed s:/n: columns arrive queryable."""
    boto3 = _boto3()
    from baker_spark.sinks.dynamodb import DynamoDBWriter

    client = boto3.client("dynamodb", region_name=REGION)
    table = _uniq("ddb")
    client.create_table(
        TableName=table,
        KeySchema=[{"AttributeName": "id", "KeyType": "HASH"}],
        AttributeDefinitions=[{"AttributeName": "id", "AttributeType": "S"}],
        BillingMode="PAY_PER_REQUEST",
    )
    try:
        client.get_waiter("table_exists").wait(
            TableName=table, WaiterConfig={"Delay": 2, "MaxAttempts": 45}
        )
        df = spark.createDataFrame(
            [("a", 1), ("b", 2), ("c", 3)], "id string, v long"
        )
        DynamoDBWriter(
            table=table, columns=["s:id", "n:v"], regions=[REGION]
        ).write(df)
        items = _poll(
            lambda: client.scan(TableName=table).get("Items") or None,
            timeout=30,
            what="items in the table",
        )
        got = {it["id"]["S"]: it["v"]["N"] for it in items}
        assert got == {"a": "1", "b": "2", "c": "3"}
    finally:
        client.delete_table(TableName=table)


def test_live_s3_staging_upload(tmp_path):
    """S3Upload's DEFAULT boto3 upload_fn: staging files arrive under
    the prefix and are removed locally (the drain contract)."""
    boto3 = _boto3()
    from baker_spark.sinks.upload import S3Upload

    client = boto3.client("s3", region_name=REGION)
    bucket = _uniq("s3")
    kwargs = (
        {}
        if REGION == "us-east-1"
        else {"CreateBucketConfiguration": {"LocationConstraint": REGION}}
    )
    client.create_bucket(Bucket=bucket, **kwargs)
    try:
        stage = tmp_path / "stage"
        stage.mkdir()
        (stage / "part-00000.csv.gz").write_bytes(b"payload-a")
        (stage / "part-00001.csv.gz").write_bytes(b"payload-b")
        up = S3Upload(source_base_path=str(stage), bucket=bucket, prefix="smoke")
        keys = up.run()
        assert up.errors == [] and len(keys) == 2
        listed = {
            o["Key"]
            for o in client.list_objects_v2(Bucket=bucket, Prefix="smoke").get(
                "Contents", []
            )
        }
        assert listed == set(keys)
        assert not list(stage.iterdir())  # drained locally
    finally:
        objs = client.list_objects_v2(Bucket=bucket).get("Contents", [])
        if objs:
            client.delete_objects(
                Bucket=bucket,
                Delete={"Objects": [{"Key": o["Key"]} for o in objs]},
            )
        client.delete_bucket(Bucket=bucket)
