"""IcebergTableIO interface contract (round-3 VERDICT #5): the
sandbox has no Iceberg runtime jar, so the production leg can't
EXECUTE here — but its calling convention can be pinned down exactly
with a mock catalog: which DataFrameWriterV2 verbs fire for which
mode, and which catalog-qualified table names are addressed. A future
Spark-API change or a typo in the name template now fails a test
instead of a cluster job. Backend selection (get_tableio) is also
covered without a JVM via a conf stub.

These are pure unit tests — no SparkSession is built.
"""

from __future__ import annotations

import pytest

from reddit_processing_spark.sources.tableio import (
    IcebergTableIO,
    ParquetTableIO,
    get_tableio,
)


class _WriterV2:
    """Records the DataFrameWriterV2 verb chain."""

    def __init__(self, log: list, target: str):
        self._log = log
        self._target = target

    def createOrReplace(self):
        self._log.append(("createOrReplace", self._target))

    def append(self):
        self._log.append(("append", self._target))

    def create(self):  # pragma: no cover - must never be called
        self._log.append(("create", self._target))


class _DF:
    def __init__(self, log: list):
        self._log = log

    def writeTo(self, target: str) -> _WriterV2:
        self._log.append(("writeTo", target))
        return _WriterV2(self._log, target)


class _Conf:
    def __init__(self, settings: dict):
        self._s = settings

    def get(self, key, default=None):
        return self._s.get(key, default)


class _Spark:
    def __init__(self, settings: dict):
        self.conf = _Conf(settings)
        self.tables_read: list[str] = []

    def table(self, name: str):
        self.tables_read.append(name)
        return f"<df:{name}>"


def test_iceberg_overwrite_is_createOrReplace():
    log: list = []
    io = IcebergTableIO("lake", "graph")
    io.write(_DF(log), "edges", mode="overwrite")
    assert log == [
        ("writeTo", "lake.graph.edges"),
        ("createOrReplace", "lake.graph.edges"),
    ]


def test_iceberg_append_is_append():
    log: list = []
    io = IcebergTableIO("lake", "graph")
    io.write(_DF(log), "checkpoints", mode="append")
    assert log == [
        ("writeTo", "lake.graph.checkpoints"),
        ("append", "lake.graph.checkpoints"),
    ]


def test_iceberg_read_addresses_catalog_qualified_name():
    spark = _Spark({})
    io = IcebergTableIO("lake", "graph")
    out = io.read(spark, "transcripts")
    assert spark.tables_read == ["lake.graph.transcripts"]
    assert out == "<df:lake.graph.transcripts>"


def test_get_tableio_picks_iceberg_when_catalog_configured():
    spark = _Spark(
        {"spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog"}
    )
    io = get_tableio(spark, "lake", "graph")
    assert isinstance(io, IcebergTableIO)
    assert io.prefix == "lake.graph"


def test_get_tableio_falls_back_to_parquet(tmp_path):
    # no catalog conf for that name -> path-rooted parquet backend
    spark = _Spark({})
    io = get_tableio(spark, str(tmp_path / "warehouse"), "graph")
    assert isinstance(io, ParquetTableIO)
    # and namespace=None never consults the catalog at all
    io2 = get_tableio(spark, str(tmp_path / "w2"))
    assert isinstance(io2, ParquetTableIO)


def test_parquet_backend_read_requires_commit(tmp_path, spark=None):
    io = ParquetTableIO(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        io.read(None, "missing_table")
