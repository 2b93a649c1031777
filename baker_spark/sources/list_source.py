"""List input — read newline-record CSV-ish files from a list of
locations (/root/reference/input/list.go:30-54,89-164,393-418).

Reference capabilities and their Spark disposition:

- local path / ``file://`` / ``s3://``  -> Hadoop FS URIs
  (``s3://`` rewritten to ``s3a://``)
- ``http(s)://`` -> the ``bakerhttp`` Python data source
  (sources/http_datasource.py): one input partition per URL, fetched
  and decompressed INSIDE the task, never through the driver, with the
  reference's metadata fidelity — ``url`` is the original URL and
  ``last_modified`` the Last-Modified response header
  (input/list.go:142-157), not a spool path and its local mtime
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
        self._spool = tempfile.mkdtemp(prefix="baker_spark_stdin_")
        #: http(s) URLs split out by resolve() for the bakerhttp source
        self._http_urls: list[str] = []

    def _spool_stdin(self) -> str:
        # unique file per call: a fixed name opened 'wb' would TRUNCATE
        # the spool a previously-built (lazy) DataFrame still points at
        # — its later action would silently read zero records
        import uuid

        local = os.path.join(self._spool, f"stdin-{uuid.uuid4().hex[:12]}")
        with open(local, "wb") as fh:
            fh.write(sys.stdin.buffer.read())
        return local

    def resolve(self) -> list[str]:
        """Expand @listfiles, directories, schemes -> concrete paths.
        http(s) data URLs go to ``self._http_urls`` (executor-side
        fetch); everything else returns as a scannable path."""
        out: list[str] = []
        self._http_urls = []
        queue = list(self.files)
        while queue:
            item = queue.pop(0)
            if item == "-":
                out.append(self._spool_stdin())
            elif item.startswith("@"):
                src = item[1:]
                if src.startswith(("http://", "https://")):
                    # an http LIST file (list.go:367-374): the list text
                    # itself is tiny coordinator metadata — read it here,
                    # its entries fan out like any other
                    from baker_spark.sources.http_datasource import FETCH_TIMEOUT_S

                    with urllib.request.urlopen(  # noqa: S310
                        src, timeout=FETCH_TIMEOUT_S
                    ) as fh:
                        body = fh.read().decode()
                    queue.extend(ln.strip() for ln in body.splitlines() if ln.strip())
                else:
                    with open(src) as fh:
                        queue.extend(line.strip() for line in fh if line.strip())
            elif item.startswith("http://") or item.startswith("https://"):
                self._http_urls.append(item)
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
        paths = self.resolve()
        http_df = self._http_dataframe(spark) if self._http_urls else None
        if http_df is not None and not paths:
            return http_df
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
        df = self._attach_metadata(reader.csv(paths))
        return df.unionByName(http_df) if http_df is not None else df

    def _http_dataframe(self, spark: SparkSession) -> DataFrame:
        """http(s) URLs through the bakerhttp data source: executor-side
        fetch, then the same no-quote single-separator split the CSV
        branch applies — ``split`` + positional ``element_at`` matches
        PERMISSIVE exactly (missing trailing fields -> NULL, empty
        fields -> "", extra separators dropped)."""
        from baker_spark.sources import http_datasource

        http_datasource.register(spark)
        raw = (
            spark.read.format(http_datasource.HttpLinesDataSource.name())
            .option(http_datasource.URLS_OPTION, "\n".join(self._http_urls))
            .load()
        )
        parts = F.split(F.col("value"), re.escape(self.separator))
        # try_element_at, not element_at: a short line must yield NULL
        # for its missing trailing fields (the CSV branch's PERMISSIVE
        # behavior) even on a session with ANSI mode on, where plain
        # element_at throws INVALID_ARRAY_INDEX instead
        cols = [
            F.try_element_at(parts, F.lit(i + 1)).alias(name)
            for i, name in enumerate(self.fields)
        ]
        if self.attach_metadata:
            cols += [F.col(URL_COL), F.col(LASTMOD_COL)]
        return raw.select(*cols)

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
