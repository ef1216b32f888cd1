"""A real Spark connector for the reference's MapReduce text format.

The reference's data interchange is ``"<key> <value>\\n"`` lines in
``mr-out-<reduceID>`` files (go-map-reduce-framework/mr/worker.go:139-148,
main/mrsequential.go:83). This module makes that format a first-class
Spark source/sink via the PySpark 4 Python Data Source API
(``pyspark.sql.datasource``), so a reference user's existing output trees
load with ``spark.read.format("mrtext").load(dir)`` and Spark results
write back in the exact layout the reference's tooling consumes.

Reader: one ``InputPartition`` per file -- the natural parallelism of the
format (one file per reduce partition), preserved as Spark's split
granularity; a 10 000-file tree scans as 10 000 parallel tasks with no
driver-side data movement. Keys never contain spaces in the reference's
apps (tokenized words / fixed labels), so the first space splits key from
value; the value keeps any further spaces (crash/indexer payloads).

Writer: each task writes ``mr-out-<partitionId>`` via temp-file +
atomic ``os.replace`` -- the reference's own task-commit idempotence
trick (mr/worker.go:139-157: ``os.CreateTemp`` + ``os.Rename``), which is
also exactly Spark's committer contract: a re-executed or speculative
task either fully replaces the file or leaves nothing visible. ``abort``
removes leftover temps.
"""

from __future__ import annotations

import glob as _glob
import os
import tempfile
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


SCHEMA = "key string, value string"


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _Committed(WriterCommitMessage):
    path: str


class MrTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrtext requires a path")

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            pat = os.path.join(self.path, "mr-out-*")
            found = sorted(_glob.glob(pat))
            if not found:  # any plain text files in the dir (part-* etc.)
                found = sorted(
                    p
                    for p in _glob.glob(os.path.join(self.path, "*"))
                    if os.path.isfile(p) and not os.path.basename(p).startswith(("_", "."))
                )
            return found
        return sorted(_glob.glob(self.path))

    def partitions(self):
        return [_FilePartition(p) for p in self._files()]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, sep, value = line.partition(" ")
                yield (key, value if sep else None)


class MrTextWriter(DataSourceWriter):
    def __init__(self, options):
        self.out_dir = options.get("path")
        if not self.out_dir:
            raise ValueError("mrtext requires a path")

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.out_dir, exist_ok=True)
        # reference A4: write to a temp file, atomically rename on success
        fd, tmp = tempfile.mkstemp(prefix=f".mr-tmp-{pid}-", dir=self.out_dir)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(f"{row[0]} {row[1]}\n")
        final = os.path.join(self.out_dir, f"mr-out-{pid}")
        os.replace(tmp, final)
        return _Committed(final)

    def commit(self, messages):
        pass  # files are already atomically in place, per-task

    def abort(self, messages):
        for leftover in _glob.glob(os.path.join(self.out_dir, ".mr-tmp-*")):
            try:
                os.remove(leftover)
            except OSError:
                pass


class MrTextDataSource(DataSource):
    """``spark.dataSource.register(MrTextDataSource)`` then
    ``spark.read.format("mrtext").load(path)`` /
    ``df.write.format("mrtext").mode("append").save(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "mrtext"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema: StructType) -> MrTextReader:
        return MrTextReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> MrTextWriter:
        return MrTextWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(MrTextDataSource)
