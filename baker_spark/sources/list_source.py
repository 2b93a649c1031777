"""List input — read newline-record CSV-ish files from a list of
locations (/root/reference/input/list.go:30-54,89-164,393-418).

Reference capabilities and their Spark disposition:

- local path / ``file://`` / ``s3://`` / ``http(s)://``  -> Hadoop FS URIs
  (``s3://`` rewritten to ``s3a://``; http(s) fetched to a local spool
  since Hadoop has no http filesystem by default)
- recursive directory walk with ``MatchPath`` regex -> explicit listing +
  ``recursiveFileLookup`` (regex applied on the driver, like the
  reference's filepath.Walk)
- ``@listfile`` indirection -> the list file is read and expanded
- ``-`` stdin -> read stdin to a spool file
- gzip/zstd -> Spark/Hadoop codecs decompress by extension natively
- metadata ``url`` / ``last_modified`` -> materialized as ``_bk_url`` and
  ``_bk_last_modified`` columns (SURVEY.md §1.1)

Records are parsed as CSV with a single-byte separator and *no quoting*
(/root/reference/logline.go:21-31): every column is StringType, supplied
by ``fields`` (the ``[fields] names`` list — schema is external, never
inferred, /root/reference/config.go:427-468).
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import tempfile
import urllib.request
import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from baker_spark.operators.metadata import LASTMOD_COL, URL_COL


def string_schema(fields: list[str]) -> T.StructType:
    return T.StructType([T.StructField(f, T.StringType(), True) for f in fields])


class ListSource:
    """The List input: newline-record files from local/file/s3/http paths,
    dirs + MatchPath regex, @listfile indirection, stdin, gz/zstd
    (input/list.go:30-54)."""

    def __init__(
        self,
        files: list[str],
        fields: list[str],
        separator: str = ",",
        match_path: str | None = None,
        attach_metadata: bool = True,
    ):
        if len(separator) != 1:
            raise ValueError("separator must be a single character")
        self.files = list(files)
        self.fields = list(fields)
        self.separator = separator
        self.match_path = re.compile(match_path) if match_path else None
        self.attach_metadata = attach_metadata
        self._spool = tempfile.mkdtemp(prefix="baker_spark_http_")

    def _fetch_http(self, url: str) -> str:
        # spool name carries a URL hash: two URLs sharing a basename
        # (http://a/x/data.csv, http://b/y/data.csv) must not overwrite
        # each other — that would read one file twice and lose the other
        digest = hashlib.md5(url.encode()).hexdigest()[:12]
        local = os.path.join(
            self._spool, f"{digest}-{os.path.basename(url) or 'download'}"
        )
        urllib.request.urlretrieve(url, local)  # noqa: S310 — user-supplied source list
        return local

    def _spool_stdin(self) -> str:
        local = os.path.join(self._spool, "stdin")
        with open(local, "wb") as fh:
            fh.write(sys.stdin.buffer.read())
        return local

    def resolve(self) -> list[str]:
        """Expand @listfiles, directories, schemes -> concrete paths."""
        out: list[str] = []
        queue = list(self.files)
        while queue:
            item = queue.pop(0)
            if item == "-":
                out.append(self._spool_stdin())
            elif item.startswith("@"):
                with open(item[1:]) as fh:
                    queue.extend(line.strip() for line in fh if line.strip())
            elif item.startswith("http://") or item.startswith("https://"):
                out.append(self._fetch_http(item))
            elif item.startswith("s3://"):
                if self.match_path is not None and item.endswith("/"):
                    # MatchPath filtering is implemented via local
                    # os.walk; a remote directory listing would need a
                    # Hadoop FS walk — refuse rather than silently
                    # ingest everything (dataframe() still sets
                    # recursiveFileLookup so nested remote files load)
                    warnings.warn(
                        f"MatchPath is not applied to remote directory {item!r}; "
                        "list concrete s3:// objects (or an @listfile) to filter",
                        stacklevel=2,
                    )
                out.append("s3a://" + item[len("s3://") :])
            else:
                path = item[len("file://") :] if item.startswith("file://") else item
                if os.path.isdir(path):
                    for root, _dirs, names in os.walk(path):
                        for n in sorted(names):
                            full = os.path.join(root, n)
                            if self.match_path is None or self.match_path.search(full):
                                out.append(full)
                else:
                    out.append(path)
        return out

    def dataframe(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.read.schema(string_schema(self.fields))
            .option("sep", self.separator)
            .option("quote", "")  # the reference CSV dialect has no quoting
            .option("header", "false")
            .option("mode", "PERMISSIVE")
            .option("emptyValue", "")
            # remote directories (s3a://...) have no os.walk branch;
            # recursion must come from the reader itself so nested
            # files load like the local walk does (input/list.go dirs)
            .option("recursiveFileLookup", "true")
        )
        df = reader.csv(self.resolve())
        return self._attach_metadata(df)

    def _attach_metadata(self, df: DataFrame) -> DataFrame:
        """url + last_modified metadata columns (api.go:12-21 keys),
        shared by every file-backed source."""
        if not self.attach_metadata:
            return df
        return df.withColumns(
            {
                URL_COL: F.input_file_name(),
                LASTMOD_COL: F.col("_metadata.file_modification_time"),
            }
        )

    __call__ = dataframe
