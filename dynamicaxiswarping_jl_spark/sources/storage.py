"""Iceberg-degraded table storage.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the catalog is abstracted: ``TableCatalog`` stores each table as
partitioned parquet plus an append-only JSON snapshot log (the degraded
analog of Iceberg's snapshot metadata). Lineage manifests
(plans/checkpoints.py) record the snapshot id they read, so resume and
audit semantics survive the downgrade. On a real cluster, swap
``write``/``read`` for ``writeTo(...).createOrReplace()`` /
``spark.read.format('iceberg')`` — call sites only touch this class.

Concurrency: commits are serialized by a per-table lock file created with
``O_CREAT|O_EXCL`` (atomic on POSIX) — the degraded analog of Iceberg's
optimistic catalog-pointer swap. A writer that loses the race waits and
retries; a lock left by a crashed holder is broken after ``lock_stale``
seconds (the O_EXCL re-create decides between racing breakers). ``merge``
and ``compact`` hold the lock across their read-compute-write so
concurrent merges serialize instead of losing the earlier delta
(Iceberg re-validates and retries the commit; the coarse lock is the
single-filesystem emulation of the same guarantee).

Hidden partitioning: ``write(..., partition_spec={...})`` accepts
Iceberg-style transforms — ``days(col)`` / ``hours(col)`` /
``bucket(N, col)`` / ``truncate(N, col)`` / ``identity(col)`` — derived
into ``_p_<name>`` directory columns at write and dropped at read (the
caller never sees them, which is what makes them *hidden*).
``partition_filter`` rewrites a predicate on the SOURCE column into one
on the hidden column so scans prune directories (Iceberg does this
rewrite inside its scan planner; here it is an explicit helper).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TableCatalog", "CatalogCommitTimeout"]


class CatalogCommitTimeout(RuntimeError):
    """A concurrent writer held the table's commit lock past the timeout."""


def _parse_transform(spec: str) -> tuple:
    """``"days(ts)"`` -> ``("days", None, "ts")``;
    ``"bucket(16, id)"`` -> ``("bucket", 16, "id")``."""
    name, _, inner = spec.partition("(")
    name, inner = name.strip(), inner.rstrip(")").strip()
    if name in ("bucket", "truncate"):
        n_s, _, col = inner.partition(",")
        return name, int(n_s), col.strip()
    if name in ("identity", "days", "hours"):
        return name, None, inner
    raise ValueError(f"unknown partition transform {spec!r}")


def _apply_transform(tname: str, n, source: Column) -> Column:
    """Apply a parsed transform to a source expression (column OR
    literal — applying the same transform to both sides is what makes
    :meth:`TableCatalog.partition_filter` sound). Bucket uses
    ``pmod(xxhash64(x), N)`` (the emulation's stand-in for Iceberg's
    murmur3 bucket — stable within this catalog, not byte-compatible
    with a real Iceberg table)."""
    if tname == "identity":
        return source
    if tname == "days":
        return F.to_date(source)
    if tname == "hours":
        return F.date_trunc("hour", source)
    if tname == "bucket":
        return F.pmod(F.xxhash64(source), F.lit(n))
    if tname == "truncate":
        return F.substring(source, 1, n)
    raise ValueError(f"unknown partition transform {tname!r}")


def _transform_column(spec: str) -> Column:
    """Iceberg-style partition transform string -> derived Column."""
    tname, n, col = _parse_transform(spec)
    return _apply_transform(tname, n, F.col(col))


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str,
                 lock_timeout: float = 300.0, lock_stale: float = 1800.0):
        self.spark = spark
        self.root = root
        self.lock_timeout = lock_timeout
        self.lock_stale = lock_stale
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _log(self, name: str) -> str:
        return os.path.join(self._dir(name), "_snapshots.json")

    # -- commit lock (cross-process) ---------------------------------------
    @contextmanager
    def _commit_lock(self, name: str):
        """Serialize commits to one table across processes.

        O_CREAT|O_EXCL is atomic on a POSIX filesystem, so exactly one
        writer wins each acquisition; losers back off and retry until
        ``lock_timeout``. A lock older than ``lock_stale`` seconds is
        presumed crashed and removed — the subsequent O_EXCL re-create
        race picks exactly one of the breakers.
        """
        os.makedirs(self._dir(name), exist_ok=True)
        lock = os.path.join(self._dir(name), "_commit.lock")
        deadline = time.monotonic() + self.lock_timeout
        delay = 0.01
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, json.dumps(
                    {"pid": os.getpid(), "acquired_at": time.time()}).encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    mtime = os.path.getmtime(lock)
                except OSError:
                    mtime = None  # holder just released — retry below
                if mtime is not None and time.time() - mtime > self.lock_stale:
                    # presumed crashed. Narrow the break/re-acquire race:
                    # re-stat immediately before unlink and only remove
                    # the lock if it is still the SAME stale file we
                    # examined (a fresh lock from a concurrent breaker's
                    # re-create has a newer mtime and is left alone).
                    # lock_stale must exceed the longest held commit
                    # (merge holds across read-compute-write) — a live
                    # slow holder past it is indistinguishable from a
                    # crash by design.
                    try:
                        if os.path.getmtime(lock) == mtime:
                            os.unlink(lock)
                    except OSError:
                        pass
                    continue
                if time.monotonic() > deadline:
                    raise CatalogCommitTimeout(
                        f"commit lock for table {name!r} held for "
                        f">{self.lock_timeout}s by a concurrent writer")
                # sleep + deadline run on EVERY iteration (a persistent
                # stat error must not become an unbreakable busy-spin)
                time.sleep(delay)
                delay = min(delay * 2, 0.2)
        try:
            yield
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass

    # -- snapshot log ------------------------------------------------------
    def snapshots(self, name: str) -> list:
        p = self._log(name)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def current_snapshot(self, name: str) -> Optional[dict]:
        snaps = self.snapshots(name)
        return snaps[-1] if snaps else None

    def _publish(self, name: str, snaps: list) -> None:
        tmp = self._log(name) + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(self._dir(name), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, self._log(name))  # atomic commit

    def _commit_snapshot(self, name: str, data_dir: str, rows: int,
                         schema: str, mode: str,
                         partition_spec: Optional[dict] = None) -> dict:
        """Append one snapshot record under the commit lock (parent list
        is re-read INSIDE the critical section, so append-mode parents
        always chain off the true latest snapshot)."""
        with self._commit_lock(name):
            snaps = self.snapshots(name)
            if mode == "append" and snaps:
                parents = snaps[-1]["data_dirs"] + [data_dir]
            else:
                parents = [data_dir]
            rec = {
                "snapshot_id": uuid.uuid4().hex[:16],
                "mode": mode,
                "data_dirs": parents,
                "rows_written": rows,
                "schema": schema,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            if partition_spec:
                rec["partition_spec"] = partition_spec
            snaps.append(rec)
            self._publish(name, snaps)
        return rec

    # -- write paths ---------------------------------------------------------
    def _write_data(self, name: str, df: DataFrame,
                    partition_by: Optional[list],
                    partition_spec: Optional[dict]):
        """Write the (uniquely named) data dir — outside the commit lock;
        only the log append needs serializing."""
        data_dir = os.path.join(self._dir(name),
                                f"snap-{uuid.uuid4().hex[:16]}")
        cols = list(df.columns)
        hidden = []
        if partition_spec:
            for pname, spec in partition_spec.items():
                df = df.withColumn(f"_p_{pname}", _transform_column(spec))
                hidden.append(f"_p_{pname}")
        w = df.write.mode("overwrite")
        if hidden:
            w = w.partitionBy(*hidden)
        elif partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        rows = self.spark.read.parquet(data_dir).count()
        schema = df.select(*cols).schema.simpleString()
        return data_dir, rows, schema

    def write(self, name: str, df: DataFrame, mode: str = "overwrite",
              partition_by: Optional[list] = None,
              partition_spec: Optional[dict] = None) -> dict:
        """Write a new snapshot of the table; returns the snapshot record.

        ``partition_spec`` maps partition name -> transform string
        (hidden partitioning, see module docstring); ``partition_by``
        is plain identity directory partitioning on visible columns.
        """
        data_dir, rows, schema = self._write_data(
            name, df, partition_by, partition_spec)
        return self._commit_snapshot(name, data_dir, rows, schema, mode,
                                     partition_spec)

    def merge(self, name: str, df: DataFrame, keys: list) -> dict:
        """Key-wise upsert: rows of ``df`` replace current rows with the
        same key tuple (copy-on-write MERGE — the degraded analog of
        Iceberg ``MERGE INTO``; on a real catalog this call site becomes
        that statement). Unmatched current rows are carried over.

        The commit lock is held across read-compute-write, so two
        concurrent merges serialize: the second reads the first's
        result instead of both reading the same parent and the later
        commit erasing the earlier delta (Iceberg gets the same
        guarantee from commit validation + retry).
        """
        with self._commit_lock(name):
            snaps = self.snapshots(name)
            spec = (snaps[-1].get("partition_spec") or None) if snaps else None
            if snaps:
                cur = self.spark.read.parquet(*snaps[-1]["data_dirs"])
                # drop the materialized hidden partition columns before
                # aligning with the caller's frame (which has only the
                # logical schema); _write_data re-derives them below
                pcols = [c for c in cur.columns if c.startswith("_p_")]
                if pcols:
                    cur = cur.drop(*pcols)
                merged = (cur.join(df.select(*keys).distinct(),
                                   list(keys), "left_anti")
                          .unionByName(df))
            else:
                merged = df
            data_dir, rows, schema = self._write_data(
                name, merged, None, spec)
            # inline _commit_snapshot's body (the lock is already held);
            # the parent's partition_spec carries forward so hidden
            # partitioning (and partition_filter) survives the MERGE
            snaps = self.snapshots(name)
            rec = {
                "snapshot_id": uuid.uuid4().hex[:16],
                "mode": "merge",
                "data_dirs": [data_dir],
                "rows_written": rows,
                "schema": schema,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            if spec:
                rec["partition_spec"] = spec
            snaps.append(rec)
            self._publish(name, snaps)
        return rec

    # -- maintenance actions -------------------------------------------------
    def expire_snapshots(self, name: str, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshot records and
        delete data dirs no retained snapshot references (the degraded
        analog of Iceberg ``expire_snapshots``). Time travel to expired
        ids stops working — by design, same as Iceberg."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        with self._commit_lock(name):
            snaps = self.snapshots(name)
            if len(snaps) <= keep_last:
                return {"expired": 0, "data_dirs_removed": 0}
            keep, drop = snaps[-keep_last:], snaps[:-keep_last]
            live = {d for s in keep for d in s["data_dirs"]}
            dead = {d for s in drop for d in s["data_dirs"]} - live
            # publish the pruned log FIRST: a crash between the two steps
            # then leaves harmless orphan dirs (re-collectable) instead
            # of a log whose snapshots reference deleted data
            self._publish(name, keep)
            for d in dead:
                shutil.rmtree(d, ignore_errors=True)
        return {"expired": len(drop), "data_dirs_removed": len(dead)}

    def compact(self, name: str) -> dict:
        """Rewrite the current snapshot's data dirs into one dir as a new
        snapshot (the degraded analog of Iceberg ``rewrite_data_files``
        + pointer swap): history is preserved, and a following
        ``expire_snapshots`` can reclaim the fragments. Holds the commit
        lock across read-rewrite-commit so an interleaved append/merge
        cannot be silently erased by the rewrite."""
        with self._commit_lock(name):
            snaps = self.snapshots(name)
            if not snaps:
                raise FileNotFoundError(f"table {name!r} has no snapshots")
            spec = snaps[-1].get("partition_spec") or None
            cur = self.spark.read.parquet(*snaps[-1]["data_dirs"])
            # strip the materialized _p_* columns so the rewrite doesn't
            # freeze them into the logical schema; _write_data re-derives
            # them from the carried-forward spec, keeping directory
            # pruning and partition_filter alive across the compaction
            pcols = [c for c in cur.columns if c.startswith("_p_")]
            if pcols:
                cur = cur.drop(*pcols)
            data_dir, rows, schema = self._write_data(name, cur, None, spec)
            rec = {
                "snapshot_id": uuid.uuid4().hex[:16],
                "mode": "compact",
                "data_dirs": [data_dir],
                "rows_written": rows,
                "schema": schema,
                "committed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            if spec:
                rec["partition_spec"] = spec
            snaps.append(rec)
            self._publish(name, snaps)
        return rec

    # -- read paths ------------------------------------------------------------
    def read(self, name: str, snapshot_id: Optional[str] = None,
             where: Optional[Column] = None) -> DataFrame:
        """Read the current (or a time-travel) snapshot. Hidden partition
        columns (``_p_*``) are dropped — callers see the logical schema.
        ``where`` (typically from :meth:`partition_filter`) is applied
        BEFORE the drop so directory pruning reaches the scan."""
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
        df = self.spark.read.parquet(*rec["data_dirs"])
        if where is not None:
            df = df.filter(where)
        hidden = [c for c in df.columns if c.startswith("_p_")]
        return df.drop(*hidden) if hidden else df

    def partition_filter(self, name: str, col: str, op: str, value) -> Column:
        """Rewrite ``col <op> value`` into a predicate on the hidden
        partition column so the parquet scan prunes directories (the
        explicit form of Iceberg's scan-planner transform rewrite).

        Monotone transforms (days/hours/truncate/identity) support
        ``<``/``<=``/``>``/``>=``/``=``; bucket supports ``=`` only (a
        range constrains no bucket). The returned predicate is a
        NECESSARY condition of the original — callers keep the original
        row-level filter too (exactly how Iceberg layers them)."""
        rec = self.current_snapshot(name)
        spec = (rec or {}).get("partition_spec") or {}
        parsed = {pname: _parse_transform(s) for pname, s in spec.items()}
        matches = [(pname, t) for pname, t in parsed.items() if t[2] == col]
        if not matches:
            raise KeyError(f"no partition transform over column {col!r}")
        pname, (tname, n, _) = matches[0]
        hidden = F.col(f"_p_{pname}")
        if tname == "bucket" and op != "=":
            raise ValueError("bucket transform prunes only equality")
        # apply the SAME transform to the literal; a foldable expression,
        # so Catalyst constant-folds it and the scan still prunes. The
        # literal is first cast to the SOURCE column's stored type:
        # xxhash64 is type-sensitive (int 42 and long 42 hash to
        # different values), so an uncast Python literal against e.g. a
        # LongType id column would compute a different bucket and
        # silently prune away the matching partition.
        lit = F.lit(value)
        try:
            from pyspark.sql.types import _parse_datatype_string
            src_t = _parse_datatype_string(rec["schema"])[col].dataType
            lit = lit.cast(src_t)
        except Exception:
            pass  # unknown schema: fall back to the raw literal
        lit = _apply_transform(tname, n, lit)
        ops = {"=": hidden.__eq__, "<": hidden.__le__, "<=": hidden.__le__,
               ">": hidden.__ge__, ">=": hidden.__ge__}
        if op not in ops:
            raise ValueError(f"unsupported op {op!r}")
        # strict < / > widen to <= / >= on the transformed value: the
        # boundary partition may hold qualifying rows (necessary, not
        # sufficient — the row filter finishes the job)
        return ops[op](lit)
