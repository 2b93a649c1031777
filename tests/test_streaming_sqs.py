"""SQS file-notification input: message parsing for all four reference
formats (/root/reference/input/sqs.go:53-77,143-189), the poller's
filter/delete/redeliver contract (sqs.go:192-246), and an end-to-end
micro-batch where fake messages of three formats drive files through a
Structured Streaming topology."""

import json

import pytest

from baker_spark import operators as ops
from baker_spark.streaming.daemon import StreamingPipeline
from baker_spark.streaming.sqs import (
    FakeSQSClient,
    SQSConfig,
    SQSFileSource,
    SQSPoller,
    manifest_sink,
)


def _sns(path):
    return json.dumps({"Type": "Notification", "Message": path})


def _s3_created(bucket, key):
    # the real S3 ObjectCreated notification shape (URL-encoded key)
    return json.dumps(
        {
            "Records": [
                {
                    "eventName": "ObjectCreated:Put",
                    "s3": {"bucket": {"name": bucket}, "object": {"key": key}},
                }
            ]
        }
    )


# ---------------------------------------------------------------- parsing


def test_parse_plain_is_identity():
    parse = SQSConfig(message_format="plain").parse_function()
    assert parse("s3://b/some/file.csv.gz") == "s3://b/some/file.csv.gz"


def test_parse_sns_extracts_message_field():
    parse = SQSConfig(message_format="sns").parse_function()
    assert parse(_sns("s3://b/a/file.csv.zst")) == "s3://b/a/file.csv.zst"


def test_parse_s3_objectcreated_assembles_path():
    parse = SQSConfig(message_format="s3::ObjectCreated").parse_function()
    assert parse(_s3_created("mybucket", "logs/2024/x.csv.gz")) == (
        "s3://mybucket/logs/2024/x.csv.gz"
    )


def test_parse_json_with_custom_jmespath():
    cfg = SQSConfig(message_format="json", message_expression="detail.object.path")
    parse = cfg.parse_function()
    assert parse(json.dumps({"detail": {"object": {"path": "s3://b/k.csv"}}})) == "s3://b/k.csv"


def test_parse_json_requires_expression():
    with pytest.raises(ValueError, match="MessageExpression is required"):
        SQSConfig(message_format="json").parse_function()


def test_parse_unknown_format_rejected():
    with pytest.raises(ValueError, match="unknown MessageFormat"):
        SQSConfig(message_format="carrier-pigeon").parse_function()


def test_parse_bucket_configured_rewrites_to_key():
    # sqs.go:183-187: with Bucket set, only the key survives
    parse = SQSConfig(message_format="sns", bucket="mybucket").parse_function()
    assert parse(_sns("s3://otherbucket/a/b.csv")) == "a/b.csv"


def test_parse_errors_name_the_failure():
    parse = SQSConfig(message_format="sns").parse_function()
    with pytest.raises(ValueError, match="decode json"):
        parse("not json at all")
    with pytest.raises(ValueError, match="find S3 path"):
        parse(json.dumps({"NoMessageHere": 1}))
    with pytest.raises(ValueError, match="not a string"):
        parse(json.dumps({"Message": 42}))


# ---------------------------------------------------------------- poller


def test_poller_parses_filters_unescapes_and_deletes():
    client = FakeSQSClient(
        {
            "logs-a": ["s3://b/keep/x+y.csv", "s3://b/skip/z.csv"],
            "logs-b": ["s3://b/keep/w.csv"],
        }
    )
    seen = []
    poller = SQSPoller(
        SQSConfig(
            message_format="plain",
            queue_prefixes=["logs-"],
            file_path_filter=r"/keep/",
        ),
        client,
        on_file=seen.append,
    )
    # drain: one message per queue per poll, like the reference's
    # MaxNumberOfMessages=1 (sqs.go:199-205)
    while poller.poll_once():
        pass
    # unescape happened before the filter ('+' -> space, sqs.go:222-226)
    assert seen == ["s3://b/keep/x y.csv", "s3://b/keep/w.csv"]
    # ALL received messages are deleted, filtered-out ones included
    assert all(not msgs for msgs in client.queues.values())
    assert len(client.deleted) == 3


def test_poller_leaves_unparsable_messages_for_redelivery():
    client = FakeSQSClient({"q": ["definitely not json"]})
    errors = []
    poller = SQSPoller(
        SQSConfig(message_format="sns", queue_names=["q"]),
        client,
        on_file=lambda p: None,
        on_error=lambda body, exc: errors.append(body),
    )
    assert poller.poll_once() == []
    assert client.queues["q"] == ["definitely not json"]  # not deleted
    assert errors == ["definitely not json"]


def test_poller_requires_queue_names_or_prefixes():
    with pytest.raises(ValueError, match="QueuePrefixes or QueueNames"):
        SQSPoller(SQSConfig(message_format="plain"), FakeSQSClient(), on_file=print)


def test_queue_urls_deduplicated():
    client = FakeSQSClient({"logs-a": [], "logs-b": []})
    poller = SQSPoller(
        SQSConfig(message_format="plain", queue_names=["logs-a"], queue_prefixes=["logs-"]),
        client,
        on_file=print,
    )
    assert len(poller.queue_urls()) == 2  # logs-a named AND prefix-matched: once


def test_manifest_reingests_changed_file_dedups_identical(tmp_path):
    """An S3 re-put delivers a second ObjectCreated for the SAME path;
    the manifest name carries a size-mtime version so changed content is
    re-ingested (new name -> new file for Spark's source) while a
    byte-identical redelivery still dedups. Extensions stay last so
    decompress-by-extension keeps working."""
    import os as _os

    watch = tmp_path / "watch"
    src = tmp_path / "data.csv.gz"
    src.write_bytes(b"v1")
    sink = manifest_sink(str(watch))
    sink(str(src))
    assert len(list(watch.iterdir())) == 1
    sink(str(src))  # identical redelivery: deduped
    assert len(list(watch.iterdir())) == 1
    src.write_bytes(b"v2-longer")  # re-put with new content
    _os.utime(src, ns=(1_700_000_000_000_000_000, 1_700_000_000_000_000_000))
    sink(str(src))
    names = sorted(f.name for f in watch.iterdir())
    assert len(names) == 2  # both versions manifested
    assert all(n.endswith(".csv.gz") for n in names)


# ------------------------------------------------------------------- e2e


def _write_csv(path, rows):
    with open(path, "w") as fh:
        fh.write("\n".join(rows) + "\n")


def test_sqs_messages_drive_micro_batch_end_to_end(spark, tmp_path):
    """Fake messages in three formats (plain, SNS, S3-ObjectCreated) name
    three local files; pollers manifest them into the watch dir; ONE
    Structured Streaming query ingests them through an operator chain."""
    data_dir = tmp_path / "data"
    watch_dir = tmp_path / "watch"
    data_dir.mkdir()
    _write_csv(data_dir / "a.csv", ["1,click,u1", "2,view,u2"])
    _write_csv(data_dir / "b.csv", ["3,click,u3"])
    _write_csv(data_dir / "c c.csv", ["4,click,u4"])  # space: URL-encoded key

    sink = manifest_sink(str(watch_dir))
    # bucket-relative keys come back without the leading slash; a real
    # deployment fetches them from S3 — locally we re-root them
    rooted = lambda p: sink(p if p.startswith("/") else "/" + p)

    plain = FakeSQSClient({"q-plain": [str(data_dir / "a.csv")]})
    sns = FakeSQSClient({"q-sns": [_sns(str(data_dir / "b.csv"))]})
    s3c = FakeSQSClient(
        {"q-s3": [_s3_created("localbucket", str(data_dir)[1:] + "/c+c.csv")]}
    )
    pollers = [
        SQSPoller(SQSConfig(message_format="plain", queue_names=["q-plain"]), plain, rooted),
        SQSPoller(SQSConfig(message_format="sns", queue_names=["q-sns"]), sns, rooted),
        SQSPoller(
            SQSConfig(message_format="s3::ObjectCreated", queue_names=["q-s3"], bucket="localbucket"),
            s3c,
            rooted,
        ),
    ]
    for p in pollers:
        p.poll_once()

    pipe = StreamingPipeline(
        source=SQSFileSource(str(watch_dir), fields=["id", "etype", "user"]),
        ops=[ops.ClauseFilter("(etype click)")],
        fields=["id", "etype"],
    )
    q = pipe.start_memory(spark, "sqs_out")
    try:
        q.processAllAvailable()
        got = {r.id for r in spark.sql("SELECT id FROM sqs_out").collect()}
        assert got == {"1", "3", "4"}

        # daemon contract: a NEW notification arrives, the running query
        # picks the file up incrementally
        _write_csv(data_dir / "d.csv", ["5,click,u5"])
        plain.queues["q-plain"].append(str(data_dir / "d.csv"))
        pollers[0].poll_once()
        q.processAllAvailable()
        got = {r.id for r in spark.sql("SELECT id FROM sqs_out").collect()}
        assert got == {"1", "3", "4", "5"}
    finally:
        q.stop()


def test_toml_compiles_sqs_section_with_message_config(tmp_path):
    from baker_spark.plans import compile_toml

    toml_text = f"""
[fields]
names = ["id", "etype", "user"]

[input]
name = "SQS"
  [input.config]
  Path = "{tmp_path}/watch"
  QueueNames = ["notify-queue"]
  MessageFormat = "s3::ObjectCreated"
  Bucket = "mybucket"
  FilePathFilter = "\\\\.csv$"

[output]
name = "Nop"
"""
    plan = compile_toml(toml_text)
    src = plan.source
    assert isinstance(src, SQSFileSource)
    assert src.sqs.queue_names == ["notify-queue"]
    assert src.sqs.bucket == "mybucket"
    # the compiled source can build a live poller against any client
    poller = src.poller(FakeSQSClient({"notify-queue": []}))
    assert poller.queue_urls() == ["https://sqs.local/000000000000/notify-queue"]
    # and a bad format fails at compile time, like fillDefaults
    with pytest.raises(ValueError, match="unknown MessageFormat"):
        compile_toml(toml_text.replace("s3::ObjectCreated", "bogus"))


def test_failing_on_file_does_not_kill_poller():
    """An exception from the file handler must be recorded and leave the
    message undeleted (redelivery), not propagate out of poll_once and
    kill the daemon thread."""
    from baker_spark.streaming.sqs import SQSConfig, SQSPoller

    deleted, errors, seen = [], [], []

    class FakeClient:
        def get_queue_url(self, QueueName):
            return {"QueueUrl": QueueName}

        def receive_message(self, QueueUrl, **kw):
            return {"Messages": [
                {"Body": "s3://bkt/boom.csv", "ReceiptHandle": "r1"},
                {"Body": "s3://bkt/ok.csv", "ReceiptHandle": "r2"},
            ]}

        def delete_message(self, QueueUrl, ReceiptHandle):
            deleted.append(ReceiptHandle)

    def on_file(path):
        if "boom" in path:
            raise IOError("unfetchable")
        seen.append(path)

    poller = SQSPoller(
        SQSConfig(queue_names=["q1"], message_format="plain"),
        client=FakeClient(),
        on_file=on_file,
        on_error=lambda body, exc: errors.append(str(exc)),
    )
    out = poller.poll_once()
    assert seen == ["s3://bkt/ok.csv"] and out == ["s3://bkt/ok.csv"]
    assert errors == ["unfetchable"]
    assert deleted == ["r2"]  # the failed message stays for redelivery
