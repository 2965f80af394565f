"""File-backed cells datasource — the HBase connector's no-cluster stand-in.

A Spark (Python) datasource named ``cells_file`` that serves and records
the adapter's cells relation ``(row_key, family, qualifier, value)`` as
JSON-lines files. It has the same surface shape as the hbase-connectors
datasource (``sources/hbase.py``): you hand ``read_webpage_hbase`` /
``write_webpage_hbase`` this format instead and they exercise their REAL
reader/writer code paths (``format().options().load()/save()``) against a
cells export on disk — which is also exactly how a production HBase
migration looks when the cluster side ships exports instead of opening a
scanner port (cf. the reference's live-table formats,
io/Nutch2WebpageInputFormat.java:47-211 / Nutch2WebpageOutputFormat.java:
46-133, mini-cluster-tested in LinkRankHBaseTest.java:89-233).

Options:
  ``mock.path`` (read): JSONL file of cells, one object per line.
  ``mock.dir`` (write): directory that receives one ``puts-*.jsonl`` per
  non-empty task — the recorded put stream.

Register once per session: ``register_cells_file_source(spark)``.
Scale note: this is a fixture/migration utility, not a bulk path — reads
are single-partition by design (a real export lands in Parquet instead).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    WriterCommitMessage,
)

#: keep in sync with sources/hbase.py CELLS_SCHEMA (no import here: this
#: module is unpickled on executors and must stay dependency-light)
_CELLS_SCHEMA = "row_key string, family string, qualifier string, value string"


class _CellsFileReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["mock.path"]

    def read(self, partition):
        with open(self.path) as fh:
            for line in fh:
                c = json.loads(line)
                yield (c["row_key"], c["family"], c["qualifier"], c["value"])


class _CellsFileWriter(DataSourceWriter):
    def __init__(self, options):
        self.outdir = options["mock.dir"]

    def write(self, iterator):
        rows = [
            {
                "row_key": r.row_key,
                "family": r.family,
                "qualifier": r.qualifier,
                "value": r.value,
            }
            for r in iterator
        ]
        if rows:
            path = os.path.join(self.outdir, f"puts-{uuid.uuid4().hex}.jsonl")
            with open(path, "w") as fh:
                for c in rows:
                    fh.write(json.dumps(c) + "\n")
        return WriterCommitMessage()

    def commit(self, messages):
        return None


class CellsFileDataSource(DataSource):
    """Cells relation over JSONL files, connector-shaped (see module doc)."""

    @classmethod
    def name(cls):
        return "cells_file"

    def schema(self):
        return _CELLS_SCHEMA

    def reader(self, schema):
        return _CellsFileReader(self.options)

    def writer(self, schema, overwrite):
        return _CellsFileWriter(self.options)


def register_cells_file_source(spark: SparkSession) -> str:
    """Idempotently register the datasource; returns its format name."""
    spark.dataSource.register(CellsFileDataSource)
    return CellsFileDataSource.name()
