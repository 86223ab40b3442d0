"""Warehouse catalog: versioned Parquet tables + the offsets/sources state.

Plain Parquet has no transactional DELETE/MERGE, so each logical table is
a directory of immutable snapshot versions with a tiny JSON manifest
pointing at the current one:

    <warehouse>/<table>/v00000003/part-*.parquet
    <warehouse>/<table>/_manifest.json   -> {"current": 3}

Every mutation (retraction, re-aggregation, reset) writes a NEW snapshot
and flips the pointer — readers never see a half-rewritten table, and a
crashed writer leaves the previous snapshot intact. This is the same
copy-on-write idea Delta/Iceberg formalize; at 100 TB you would swap this
class for a real lakehouse table (MERGE / replaceWhere) without touching
any operator code, which is why all access funnels through here.

Appends (the common path: new entries from newly indexed files) go into
the *current* snapshot directory with mode=append — no rewrite.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str, schema: T.StructType):
        self.spark = spark
        self.root = root.rstrip("/")
        self.schema = schema
        os.makedirs(self.root, exist_ok=True)

    # -- manifest ---------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return f"{self.root}/_manifest.json"

    def _current(self) -> int | None:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)["current"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            return None

    def _set_current(self, v: int) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"current": v}, f)
        os.replace(tmp, self._manifest_path)

    def _snapshot_dir(self, v: int) -> str:
        return f"{self.root}/v{v:08d}"

    # -- reads ------------------------------------------------------
    def exists(self) -> bool:
        return self._current() is not None

    def versions(self) -> list[int]:
        """All snapshot versions still on disk, ascending."""
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                out.append(int(name[1:]))
        return sorted(out)

    def read(self, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to an older one.

        Snapshots are immutable once superseded (every mutation writes
        a new directory), so an old `version` is a stable historical
        read — the lakehouse time-travel contract. Only the CURRENT
        snapshot receives in-place appends; a superseded version never
        changes again.
        """
        v = version if version is not None else self._current()
        if v is None:
            return self.spark.createDataFrame([], self.schema)
        if version is not None and not os.path.isdir(self._snapshot_dir(version)):
            raise FileNotFoundError(
                f"snapshot v{version} of {self.root} not on disk "
                f"(available: {self.versions()}) — vacuumed or never written"
            )
        return self.spark.read.schema(self.schema).parquet(self._snapshot_dir(v))

    # -- retention --------------------------------------------------
    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest `keep_last` snapshots (never the
        current one). Returns the versions removed. The retention
        trade-off is the usual one: time-travel depth vs storage."""
        import shutil

        cur = self._current()
        victims = [v for v in self.versions()[:-keep_last] if v != cur]
        for v in victims:
            shutil.rmtree(self._snapshot_dir(v), ignore_errors=True)
        return victims

    # -- writes -----------------------------------------------------
    def overwrite(self, df: DataFrame, sort_cols: list[str] | None = None) -> None:
        v = (self._current() or 0) + 1
        writer = df
        if sort_cols:
            # sorted-within-partitions => parquet min/max row-group
            # stats make key-range scans prune (the engine's stand-in
            # for LevelDB's sorted iterator, SURVEY.md §4)
            writer = df.sortWithinPartitions(*sort_cols)
        writer.write.mode("overwrite").parquet(self._snapshot_dir(v))
        self._set_current(v)

    def append(self, df: DataFrame, sort_cols: list[str] | None = None) -> None:
        v = self._current()
        if v is None:
            self.overwrite(df, sort_cols)
            return
        writer = df
        if sort_cols:
            writer = df.sortWithinPartitions(*sort_cols)
        writer.write.mode("append").parquet(self._snapshot_dir(v))

    def merge_upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        sort_cols: list[str] | None = None,
    ) -> None:
        """MERGE-style upsert as a copy-on-write snapshot: rows of the
        current snapshot whose key appears in ``updates`` are replaced,
        the rest carry over, new keys insert — WHEN MATCHED THEN UPDATE
        / WHEN NOT MATCHED THEN INSERT, the lakehouse CDC-apply shape.

        Plan: one left-anti join of the (typically huge) target against
        the (typically small) update set — Catalyst broadcasts the
        update side under the threshold, so the target is ONE scan +
        filter, no target shuffle — then a union with the updates.
        Snapshot isolation for free: readers of the previous version
        are untouched (time travel still serves it)."""
        if not self.exists():
            self.overwrite(updates, sort_cols)
            return
        target = self.read()
        survivors = target.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        self.overwrite(
            survivors.unionByName(updates.select(*target.columns)), sort_cols
        )

    def diff(
        self,
        from_version: int,
        to_version: int | None = None,
        key_cols: list[str] | None = None,
    ) -> DataFrame:
        """Change data feed between two snapshots: every row with a
        ``_change`` column in {'insert', 'delete', 'update_pre',
        'update_post'} — what a downstream incremental consumer
        replays instead of re-reading the table (Delta CDF shape).

        Without ``key_cols`` the diff is row-valued: rows only in the
        newer snapshot are inserts, rows only in the older one are
        deletes (a changed row shows as delete + insert); this form
        handles duplicate rows correctly (exceptAll is multiset). With
        ``key_cols`` changed keys classify as update_pre/update_post
        instead — PRECONDITION: ``key_cols`` must uniquely identify
        rows in both snapshots (the merge_upsert/delete_where write
        path maintains this); duplicate keys would fan out the
        full-outer join and multiply feed rows. Plan: both snapshots
        are immutable parquet, so the diff is two exceptAll (hash
        aggregate) passes — or, keyed, one full-outer join on the
        keys — with no state kept anywhere."""
        new = self.read(to_version)
        old = self.read(from_version)
        if key_cols is None:
            ins = new.exceptAll(old).withColumn("_change", F.lit("insert"))
            dels = old.exceptAll(new).withColumn("_change", F.lit("delete"))
            return ins.unionByName(dels)
        cols = new.columns
        n = new.select(*cols).withColumn("_n", F.lit(1))
        o = old.select(*cols).withColumn("_o", F.lit(1))
        j = n.alias("n").join(o.alias("o"), key_cols, "full_outer")
        non_key = [c for c in cols if c not in key_cols]
        same = F.lit(True)
        for c in non_key:
            same = same & F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
        inserts = j.filter(F.col("o._o").isNull()).select(
            *[F.col(f"n.{c}") if c in non_key else F.col(c) for c in cols],
            F.lit("insert").alias("_change"),
        )
        deletes = j.filter(F.col("n._n").isNull()).select(
            *[F.col(f"o.{c}") if c in non_key else F.col(c) for c in cols],
            F.lit("delete").alias("_change"),
        )
        changed = j.filter(
            F.col("n._n").isNotNull() & F.col("o._o").isNotNull() & ~same
        )
        pre = changed.select(
            *[F.col(f"o.{c}") if c in non_key else F.col(c) for c in cols],
            F.lit("update_pre").alias("_change"),
        )
        post = changed.select(
            *[F.col(f"n.{c}") if c in non_key else F.col(c) for c in cols],
            F.lit("update_post").alias("_change"),
        )
        return inserts.unionByName(deletes).unionByName(pre).unionByName(post)

    def delete_where(self, condition) -> int:
        """Lakehouse DELETE: write a new snapshot without the matching
        rows; returns the number deleted. Prior versions remain
        readable (time travel)."""
        target = self.read()
        n_before = target.count()
        kept = target.filter(~condition)
        self.overwrite(kept)
        return n_before - kept.count()

    def compact(
        self,
        sort_cols: list[str] | None = None,
        target_file_bytes: int = 128 << 20,
        zorder: bool = False,
    ) -> int:
        """OPTIMIZE-style compaction: rewrite the current snapshot as a
        NEW snapshot with ~target-sized files (copy-on-write, so time
        travel to the pre-compaction version still works). Every
        ``append`` leaves one file per task; at 100 TB the resulting
        small-file swarm kills scan throughput (a footer fetch and no
        column-chunk locality per file). With ``sort_cols`` the rewrite
        is ``repartitionByRange`` + ``sortWithinPartitions`` — a
        range-clustered sorted layout whose parquet min/max stats prune
        key-range scans both across files and within row groups; with
        ``zorder=True`` (and >= 2 sort cols) the layout follows the
        Morton curve instead (operators/zorder.py), so min/max stats
        prune on ANY clustered column, not just the leading one.
        Returns the new version number.
        """
        import math

        cur = self._current()
        if cur is None:
            raise ValueError("cannot compact a table with no snapshots")
        size = 0
        for dirpath, _, files in os.walk(self._snapshot_dir(cur)):
            size += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        n_files = max(1, math.ceil(size / target_file_bytes))
        df = self.read()
        if zorder and sort_cols and len(sort_cols) >= 2:
            from dat_archive_map_reduce_spark.operators.zorder import zorder_layout

            out = zorder_layout(df, sort_cols, n_files)
        elif sort_cols:
            out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        else:
            out = df.repartition(n_files)
        v = cur + 1
        out.write.mode("overwrite").parquet(self._snapshot_dir(v))
        self._set_current(v)
        return v

    def reset(self) -> None:
        """Logical wipe: point at a fresh empty snapshot (reference
        view reset, /root/reference/lib/util-level.js:26-35)."""
        self.overwrite(self.spark.createDataFrame([], self.schema))


class AppendOnlyLog:
    """Append-only parquet log in ONE stable directory.

    The changelog is a log — nothing ever rewrites it — so it needs no
    snapshot versioning, and a streaming reader (watch mode) can trust
    the directory path for the lifetime of the warehouse. Streaming
    from a VersionedTable snapshot dir would silently strand a running
    readStream the moment any overwrite flipped the manifest to a new
    vNNNNNNNN directory.

    ``partition_by`` writes hive-style ``col=value/`` subdirectories:
    a reader filtering on a partition column prunes to that column's
    directories (PartitionFilters on the scan) instead of listing and
    footer-reading every file in the log. The engine partitions its
    changelog by origin, so per-source ``index()`` / watch catch-up
    scans touch one source's files — at 100 TB with thousands of
    sources, the difference between one directory and the whole log.
    Partition values are directory names, so Spark URL-escapes
    specials (``dat://a`` -> ``dat%3A%2F%2Fa``) and unescapes on read;
    both batch and file-stream readers discover the layout from the
    user-provided schema.

    LAYOUT MIGRATION GUARD: a warehouse written before partitioning
    existed has flat ``part-*.parquet`` files directly in the log
    directory. Appending ``col=value/`` subdirectories next to them
    would make every subsequent read throw Spark's "Conflicting
    directory structures" — bricking the warehouse. So on open, if
    flat data files are present, this log drops to unpartitioned
    (legacy) mode for its lifetime; only warehouses born partitioned
    get partition pruning."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        partition_by: "tuple[str, ...]" = (),
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.schema = schema
        self.partition_by = tuple(partition_by)
        os.makedirs(self.root, exist_ok=True)
        if self.partition_by and any(
            not name.startswith(("_", "."))
            and not os.path.isdir(os.path.join(self.root, name))
            for name in os.listdir(self.root)
        ):
            # pre-partitioning layout on disk: stay flat forever
            self.partition_by = ()

    def read(self) -> DataFrame:
        return self.spark.read.schema(self.schema).parquet(self.root)

    def append(self, df: DataFrame) -> None:
        w = df.write.mode("append")
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.root)


OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("view", T.StringType(), False),
        T.StructField("origin", T.StringType(), False),
        T.StructField("last_version", T.LongType(), False),
    ]
)

SOURCES_SCHEMA = T.StructType(
    [
        T.StructField("origin", T.StringType(), False),
        T.StructField("watch", T.BooleanType(), False),
    ]
)
