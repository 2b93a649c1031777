"""Every example topology compiles and runs (FileWriter paths are
redirected into tmp)."""

import glob
import os

import pytest

from baker_spark.plans import compile_toml

EXAMPLES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "examples", "*.toml")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(spark, tmp_path, path):
    text = open(path).read().replace("_out/", f"{tmp_path}/")
    pipeline = compile_toml(text)
    result = pipeline.run(spark)
    if isinstance(result, str):  # FileWriter output dir
        parts = [f for f in os.listdir(result) if f.endswith(".csv.gz")]
        assert parts, f"no output files from {path}"
    elif isinstance(result, list):  # Recorder
        assert result


def test_sharding_colocates_keys(spark, tmp_path):
    """Same city -> same output file (topology.go:341-347 guarantee)."""
    import gzip

    text = open(os.path.join(os.path.dirname(__file__), "..", "examples", "sharding.toml")).read()
    pipeline = compile_toml(text.replace("_out/", f"{tmp_path}/"))
    out_dir = pipeline.run(spark)
    city_to_files: dict[str, set] = {}
    for name in os.listdir(out_dir):
        if not name.endswith(".csv.gz"):
            continue
        with gzip.open(os.path.join(out_dir, name), "rt") as fh:
            for line in fh:
                city = line.split(",")[1]
                city_to_files.setdefault(city, set()).add(name)
    assert city_to_files
    for city, files in city_to_files.items():
        assert len(files) == 1, f"city {city} split across {files}"


def test_cli_run_subprocess(tmp_path):
    """The console entry point end-to-end in a fresh interpreter —
    the exact invocation a migrating baker user runs first."""
    import subprocess
    import sys as _sys

    toml = tmp_path / "t.toml"
    toml.write_text(f"""
[fields]
names=["timestamp","source","target"]
[input]
name="List"
[input.config]
files=["/root/reference/testdata/input.csv.zst"]
[[filter]]
name="NotNull"
[filter.config]
Fields=["timestamp"]
[output]
name="FileWriter"
[output.config]
PathString="{tmp_path}/out/o.csv.gz"
""")
    env = dict(os.environ, SPARK_GRAFT_CPUS="2")
    proc = subprocess.run(
        [_sys.executable, "-m", "baker_spark", "run", str(toml), "--cpus", "2"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True,
        text=True,
        timeout=180,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out_files = glob.glob(f"{tmp_path}/out/**/*.gz", recursive=True)
    assert out_files


def test_cli_help_covers_inputs_and_outputs(capsys):
    """The reference's -help documents inputs/outputs, not just filters
    (baker_cli.go); ours must resolve every TOML component name."""
    from baker_spark import cli

    for component in ["SQS", "Kinesis", "TCP", "FileWriter", "DynamoDB", "Stats", "List"]:
        assert cli.cmd_help(component) == 0, component
        out = capsys.readouterr().out
        # the reference's markdown shape (help_markdown.go): an Overview,
        # then a config-key table with the five helpConfigKey columns
        assert component.lower() in out.lower()
        assert "### Overview" in out and "### Configuration" in out
        assert "|Name|Type|Default|Required|Description|" in out
    assert cli.cmd_help("NoSuchThing") == 1


def test_cli_help_config_key_table_fidelity(capsys):
    """help FileWriter renders its TOML keys with defaults, requiredness
    and the #:-comment descriptions; help '*' renders every component."""
    from baker_spark import cli

    assert cli.cmd_help("FileWriter") == 0
    out = capsys.readouterr().out
    assert "| Path| str| | true| |" in out                     # required, no default
    assert "| ZstdLevel| int| 3| false|" in out                # default + description
    assert "ZstdCompressionLevel" in out
    assert "| DiscardEmptyFiles| bool| False| false|" in out

    assert cli.cmd_help("ClauseFilter") == 0
    out = capsys.readouterr().out
    assert "## Filter *ClauseFilter*" in out
    assert "| Clause| str| ''| false| |" in out                # CamelCase TOML key

    assert cli.cmd_help("*") == 0
    out = capsys.readouterr().out
    assert out.count("## ") >= 40  # every registered component rendered

    assert cli.cmd_list() == 0
    listing = capsys.readouterr().out
    for section in ("Operators", "Inputs (TOML):", "Outputs (TOML):", "Upload:"):
        assert section in listing


def test_cli_toml_surface_matches_compiler_dispatch():
    """Every name `list` advertises under a TOML section must compile,
    and every name the compiler accepts must be advertised — the two
    tables live in different files and previously drifted (WebSocket
    listed but not compilable; SQLiteRaw compilable but not listed)."""
    from baker_spark import cli
    from baker_spark.plans.toml_compiler import (
        BATCH_INPUT_NAMES,
        SINK_NAMES,
        STREAMING_INPUT_NAMES,
        _build_input,
        _build_sink,
        _build_streaming_input,
    )

    reg = cli._io_registry()
    assert set(reg["Inputs (TOML)"]) == set(BATCH_INPUT_NAMES) | set(STREAMING_INPUT_NAMES)
    assert set(reg["Outputs (TOML)"]) == set(SINK_NAMES)

    # advertised names are really accepted by the dispatch (minimal
    # configs satisfy each component's required keys)
    sink_cfg = {"DynamoDB": {"Table": "t", "Columns": ["s:c"]}}
    for n in SINK_NAMES:
        _build_sink({"name": n, "config": sink_cfg.get(n, {})}, ",")
    for n in BATCH_INPUT_NAMES:
        _build_input({"name": n, "config": {}}, ["a"], ",")
    stream_cfg = {
        "SQS": {"Path": "/tmp/watch"},
        "Kinesis": {"Stream": "s"},
        "KCL": {"Stream": "s", "AppName": "app"},
        "TCP": {},
    }
    for n in STREAMING_INPUT_NAMES:
        _build_streaming_input({"name": n, "config": stream_cfg[n]}, ["a"], ",")
