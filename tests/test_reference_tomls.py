"""Config-compatibility proof: every TOML topology shipped in the
reference repo compiles with this engine's compiler, and the ones whose
input fixtures are checked in actually run and produce the reference's
expected records (e2e_test.go:20-86 golden semantics, order-insensitive
because procs>1 never guaranteed order in the reference either,
config.go:47-53).
"""

import glob
import gzip
import os

import pytest

from baker_spark.plans import compile_toml

REF = "/root/reference"

# topologies with no [fields] section get names programmatically, like the
# reference's Components.FieldNames (desc.go:18-19)
FIELDS = ["timestamp", "source", "target"]


def _load(path, tmp_path):
    text = open(path).read()
    text = text.replace("testdata/", f"{REF}/testdata/")
    text = text.replace('"_out/', f'"{tmp_path}/out/').replace('"./_out/', f'"{tmp_path}/out/')
    return text


ALL_TOMLS = sorted(
    glob.glob(f"{REF}/testdata/*.toml")
    + glob.glob(f"{REF}/examples/**/*.toml", recursive=True)
    + glob.glob(f"{REF}/tutorials/**/*.toml", recursive=True)
)


@pytest.mark.parametrize("path", ALL_TOMLS, ids=[os.path.basename(p) for p in ALL_TOMLS])
def test_reference_toml_compiles(path, tmp_path):
    pipeline = compile_toml(_load(path, tmp_path), fields=FIELDS)
    assert pipeline.source is not None


def _run_and_read(spark, text, tmp_path):
    compile_toml(text, fields=FIELDS).run(spark)
    rows = []
    for p in glob.glob(f"{tmp_path}/out/**/*.gz", recursive=True):
        # NOT splitlines(): python treats \x1e (the 0x1e topology's field
        # separator) as a line boundary, records are \n-framed only
        rows += [r for r in gzip.open(p, "rt").read().split("\n") if r]
    return sorted(rows)


def _golden(name):
    # the reference's goldens are the gzip files themselves (diffed
    # byte-wise in e2e_test.go; we compare decompressed, order-free)
    return sorted(
        r for r in gzip.open(f"{REF}/testdata/{name}", "rt").read().split("\n") if r
    )


def test_advanced_csv_example_runs(spark, tmp_path):
    """The reference's own e2e topology vs its checked-in golden
    (e2e_test.go:37-41): ClauseFilter keeps rows where timestamp=value5
    or target=value6."""
    text = _load(f"{REF}/testdata/advanced_csv_example.toml", tmp_path)
    rows = _run_and_read(spark, text, tmp_path)
    assert rows == _golden("advanced_csv.golden")


def test_advanced_csv_example_0x1e_runs(spark, tmp_path):
    """Same topology over the \\u001e-separated fixture ([csv]
    field_separator, config.go:115-121) vs its golden."""
    text = _load(f"{REF}/testdata/advanced_csv_example_0x1e.toml", tmp_path)
    rows = _run_and_read(spark, text, tmp_path)
    assert rows == _golden("advanced_csv_0x1e.golden")


def test_basic_example_runs(spark, tmp_path):
    """No-filter passthrough topology writes every input record."""
    text = _load(f"{REF}/testdata/basic_example.toml", tmp_path)
    rows = _run_and_read(spark, text, tmp_path)
    assert len(rows) == 4  # input.csv.zst fixture rows


def test_validation_example_matches_reference_golden(spark, tmp_path):
    """The reference's validation e2e (examples/validation/main.go inline
    TOML) against its checked-in golden (testdata/validation.csv.gz.golden):
    regexes keep exactly the rows the reference kept."""
    toml_text = f"""
[fields]
names=["timestamp", "source", "target"]

[validation]
timestamp="^value[0-9]+$"
target="value3"

[input]
name = "List"

[input.config]
files=["{REF}/testdata/input.csv.zst"]

[output]
name = "FileWriter"
procs=1

[output.config]
PathString="{tmp_path}/out/output.csv.gz"
"""
    rows = _run_and_read(spark, toml_text, tmp_path)
    golden = sorted(
        r
        for r in gzip.open(f"{REF}/testdata/validation.csv.gz.golden", "rt")
        .read()
        .split("\n")
        if r
    )
    assert rows == golden


def test_sharding_example_on_reference_fixture(spark, tmp_path):
    """The reference's sharding example (examples/sharding/main.go:
    customer records sharded by age across 10 procs): same age must
    never appear in two different output files — the shard%procs pinning
    guarantee (topology.go:341-347) over their actual fixture."""
    toml_text = f"""
[fields]
names=["id", "first_name", "last_name", "age", "street", "city", "dollar"]

[input]
name="List"

[input.config]
files=["{REF}/testdata/customers_random.input.csv.zst"]

[output]
name="FileWriter"
sharding="age"
procs=10

[output.config]
PathString="{tmp_path}/out/shard.csv.gz"
"""
    compile_toml(toml_text).run(spark)
    age_to_files: dict[str, set] = {}
    n_rows = 0
    for p in glob.glob(f"{tmp_path}/out/**/*.gz", recursive=True):
        for line in gzip.open(p, "rt"):
            if not line.strip():
                continue
            n_rows += 1
            age = line.split(",")[3]
            age_to_files.setdefault(age, set()).add(p)
    assert n_rows > 0
    assert all(len(files) == 1 for files in age_to_files.values())
