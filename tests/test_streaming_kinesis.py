"""Kinesis connector schema fidelity: the parse path is exercised
against the real spark-sql-kinesis column layout
(data/streamName/partitionKey/sequenceNumber/approximateArrivalTimestamp)
— the stream the reference consumes via GetRecords and splits on
newlines (/root/reference/input/kinesis.go:145-150)."""

from datetime import datetime

from baker_spark.streaming.connectors import (
    KINESIS_RECORD_SCHEMA,
    KinesisRecordsSource,
    KinesisStandinSource,
    kinesis_records,
)


def _record(data: bytes, pk: str = "0", seq: str = "1"):
    return (
        bytearray(data),
        "events-stream",
        pk,
        seq,
        datetime(2024, 3, 1, 12, 0, 0),
    )


def test_kinesis_records_splits_blobs_and_lines(spark):
    """One Kinesis record may carry MANY newline-separated log lines
    (kinesis.go:145: bytes.Count of '\\n' per Data blob); trailing
    newlines must not produce empty records."""
    df = spark.createDataFrame(
        [
            _record(b"1,click,u1\n2,view,u2\n", pk="a"),  # two lines + trailing \n
            _record(b"3,click,u3", pk="b"),  # single line, no terminator
        ],
        KINESIS_RECORD_SCHEMA,
    )
    out = kinesis_records(df, fields=["id", "etype", "user"]).collect()
    assert [(r.id, r.etype, r.user) for r in out] == [
        ("1", "click", "u1"),
        ("2", "view", "u2"),
        ("3", "click", "u3"),
    ]


def test_kinesis_records_keeps_arrival_timestamp_when_asked(spark):
    df = spark.createDataFrame([_record(b"1,click,u1")], KINESIS_RECORD_SCHEMA)
    out = kinesis_records(df, fields=["id", "etype", "user"], arrival_ts="arrived_at").collect()
    assert out[0].arrived_at == datetime(2024, 3, 1, 12, 0, 0)
    assert out[0].id == "1"


def test_standin_emits_exact_connector_schema(spark):
    """The stand-in's contract IS the connector layout — if this schema
    drifts from KINESIS_RECORD_SCHEMA, topology code tested against the
    stand-in would break on the real connector."""
    standin = KinesisStandinSource(sample_lines=["1,click,u1\n2,view,u2"])
    got = standin.dataframe(spark).schema
    # literals make some stand-in columns non-nullable — strictly tighter
    # than the connector's; names and types must match exactly
    assert [(f.name, f.dataType) for f in got] == [
        (f.name, f.dataType) for f in KINESIS_RECORD_SCHEMA
    ]


def test_streaming_parse_off_connector_layout(spark, tmp_path):
    """A streaming query over the exact connector layout (file-backed
    stand-in) through kinesis_records — the end-to-end parse contract."""
    src_dir = tmp_path / "kin"
    src_dir.mkdir()
    spark.createDataFrame(
        [_record(b"1,click,u1\n2,view,u2\n"), _record(b"3,click,u3")],
        KINESIS_RECORD_SCHEMA,
    ).write.parquet(str(src_dir / "batch0"))

    stream = spark.readStream.schema(KINESIS_RECORD_SCHEMA).parquet(str(src_dir / "*"))
    parsed = kinesis_records(stream, fields=["id", "etype", "user"], arrival_ts="arrived_at")
    q = parsed.writeStream.format("memory").queryName("kin_out").outputMode("append").start()
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT id, etype, arrived_at FROM kin_out ORDER BY id").collect()
        assert [r.id for r in rows] == ["1", "2", "3"]
        assert all(r.arrived_at == datetime(2024, 3, 1, 12, 0, 0) for r in rows)
    finally:
        q.stop()


def test_toml_kinesis_compiles_to_parsed_record_source():
    from baker_spark.plans import compile_toml

    plan = compile_toml(
        """
[fields]
names = ["id", "etype", "user"]

[input]
name = "Kinesis"
  [input.config]
  Stream = "events-stream"
  AwsRegion = "us-east-1"

[output]
name = "Nop"
"""
    )
    src = plan.source
    assert isinstance(src, KinesisRecordsSource)
    assert src.fields == ["id", "etype", "user"]
    assert src.inner.stream_name == "events-stream"
    assert src.inner.region == "us-east-1"


def test_toml_kcl_validates_like_the_reference():
    """kcl.go:54-62: AppName [A-Za-z0-9_]+ required; InitialPosition
    LATEST|TRIM_HORIZON only. AppName scopes the checkpoint dir the way
    the KCL lease table is scoped."""
    import pytest

    from baker_spark.plans import compile_toml

    base = """
[fields]
names = ["id", "etype", "user"]

[input]
name = "KCL"
  [input.config]
  Stream = "events-stream"
  AppName = "{app}"
  InitialPosition = "{pos}"

[output]
name = "Nop"
"""
    plan = compile_toml(base.format(app="my_app_1", pos="TRIM_HORIZON"))
    src = plan.source.inner
    assert src.app_name == "my_app_1"
    assert src.starting_position == "TRIM_HORIZON"
    assert src.checkpoint_dir("/ckpt") == "/ckpt/my_app_1"

    with pytest.raises(ValueError, match="invalid 'AppName'"):
        compile_toml(base.format(app="bad app!", pos="LATEST"))
    with pytest.raises(ValueError, match="invalid 'AppName'"):
        compile_toml(base.format(app="", pos="LATEST"))
    with pytest.raises(ValueError, match="invalid 'InitialPosition'"):
        compile_toml(base.format(app="ok_app", pos="YESTERDAY"))
