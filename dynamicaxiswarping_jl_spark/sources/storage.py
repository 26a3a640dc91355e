"""Iceberg-degraded table storage.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the catalog is abstracted: ``TableCatalog`` stores each table as
partitioned parquet plus an append-only JSON snapshot log (the degraded
analog of Iceberg's snapshot metadata). Lineage manifests
(plans/checkpoints.py) record the snapshot id they read, so resume and
audit semantics survive the downgrade. On a real cluster, swap
``write``/``read`` for ``writeTo(...).createOrReplace()`` /
``spark.read.format('iceberg')`` — call sites only touch this class.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TableCatalog"]


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _log(self, name: str) -> str:
        return os.path.join(self._dir(name), "_snapshots.json")

    def snapshots(self, name: str) -> list:
        p = self._log(name)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def current_snapshot(self, name: str) -> Optional[dict]:
        snaps = self.snapshots(name)
        return snaps[-1] if snaps else None

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              partition_by: Optional[list] = None) -> dict:
        """Write a new snapshot of the table; returns the snapshot record."""
        snap_id = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self._dir(name), f"snap-{snap_id}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        rows = self.spark.read.parquet(data_dir).count()
        snaps = self.snapshots(name)
        if mode == "append" and snaps:
            parents = snaps[-1]["data_dirs"] + [data_dir]
        else:
            parents = [data_dir]
        rec = {
            "snapshot_id": snap_id,
            "mode": mode,
            "data_dirs": parents,
            "rows_written": rows,
            "schema": df.schema.simpleString(),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        snaps.append(rec)
        tmp = self._log(name) + ".tmp"
        os.makedirs(self._dir(name), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, self._log(name))  # atomic commit
        return rec

    def merge(self, name: str, df: DataFrame, keys: list) -> dict:
        """Key-wise upsert: rows of ``df`` replace current rows with the
        same key tuple (copy-on-write MERGE — the degraded analog of
        Iceberg ``MERGE INTO``; on a real catalog this call site becomes
        that statement). Unmatched current rows are carried over."""
        try:
            cur = self.read(name)
        except FileNotFoundError:
            return self.write(name, df, mode="merge")
        kept = cur.join(df.select(*keys).distinct(), list(keys), "left_anti")
        return self.write(name, kept.unionByName(df), mode="merge")

    def read(self, name: str, snapshot_id: Optional[str] = None) -> DataFrame:
        """Read the current (or a time-travel) snapshot."""
        snaps = self.snapshots(name)
        if not snaps:
            raise FileNotFoundError(f"table {name!r} has no snapshots")
        if snapshot_id is None:
            rec = snaps[-1]
        else:
            matches = [s for s in snaps if s["snapshot_id"] == snapshot_id]
            if not matches:
                raise KeyError(f"snapshot {snapshot_id!r} not found for {name!r}")
            rec = matches[0]
        return self.spark.read.parquet(*rec["data_dirs"])
