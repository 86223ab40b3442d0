"""MapReduce engine facade — the reference-shaped API over DataFrames.

Reference API being re-expressed (/root/reference/index.js):

    define(name, {path, map, reduce})   index.js:96-109
    index(url, {watch}) / unindex(url)  index.js:127-151
    indexFile / unindexFile             index.js:153-175
    get(view, key)                      index.js:117-120
    list(view, {gt,gte,lt,lte,reverse,limit})  index.js:122-125
    reset(view)                         index.js:111-115
    listIndexed / isIndexed             index.js:177-187
    events                              index.js:53-57, README.md:366-483

Storage layout (all Parquet, copy-on-write snapshots via VersionedTable):

    <warehouse>/changelog/                   append-only files log
    <warehouse>/views/<view>/entries/<origin-hash>/   per-origin entry shards
    <warehouse>/views/<view>/reduced/        folded aggregates (key_json-bucketed)
    <warehouse>/views/<view>/reduced_cnt/    sum-delta views: live entry count per key
    <warehouse>/offsets/                     (view, origin, last_version)

Scale design: entries are sharded **per origin** so retraction/re-index
of one source rewrites only that origin's shard — the Parquet stand-in
for Delta ``replaceWhere``/MERGE (swap VersionedTable for a lakehouse
table at 100 TB; operator code is unchanged). The reduced table is
hash-BUCKETED on key_json, so every re-aggregation commit (general
refold and the exact-delta watch path alike) rewrites only the buckets
holding the delta's keys and hardlinks the rest — per-batch reduced IO
is O(delta-buckets), flat in |reduced|, which is what keeps a
high-cardinality keyed view (count per URL over a 100 TB corpus)
maintainable under a continuous stream.
"""

from __future__ import annotations

import hashlib
import json
import re as _re
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dat_archive_map_reduce_spark.errors import SchemaError, ViewNotFoundError
from dat_archive_map_reduce_spark.functions.keys import (
    key_json as _canon_key_json,
    normalize_key,
    range_predicate,
)
from dat_archive_map_reduce_spark.operators.map_reduce import (
    entries_schema,
    reduce_entries,
    reduced_schema,
    run_map,
)
from dat_archive_map_reduce_spark.plans.catalog import (
    OFFSETS_SCHEMA,
    AppendOnlyLog,
    BucketedEntriesTable,
    BucketedMetaTable,
    VersionedTable,
    empty_df,
)
from dat_archive_map_reduce_spark.plans.view_def import ViewDefinition, validate_view_def
from dat_archive_map_reduce_spark.sources.files import (
    FILES_SCHEMA,
    changelog_from_rows,
    glob_filter,
    latest_wins,
)

EVENTS = (
    "open",
    "open-failed",
    "view-reset",
    "archive-indexing",
    "archive-index-progress",
    "archive-indexed",
    "indexes-updated",
    "archive-missing",
    "archive-found",
    "archive-error",
)


def _origin_shard(origin: str) -> str:
    return hashlib.sha1(origin.encode()).hexdigest()[:16]


class MapReduce:
    """Batch + incremental view engine. One instance per warehouse dir."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        listeners: dict[str, list[Callable[..., None]]] | None = None,
        entries_buckets: int = 16,
        reduced_buckets: int = 16,
        changelog_hash_levels: int = 0,
        minmax_hist_bound: int = 64,
    ):
        """``listeners`` registers callbacks before the warehouse opens
        (the reference attaches handlers before open(), index.js:34-60,
        so `open`/`open-failed` are observable).

        ``entries_buckets``: hash buckets per (view, origin) entries
        shard (BucketedEntriesTable) — a maintenance batch rewrites
        only buckets containing changed files and hardlinks the rest,
        so merge IO is O(delta + touched/N of the shard), not
        O(shard). Applies to NEW shards; an existing shard keeps the
        bucket count it was created with (pinned in _buckets.json).

        ``reduced_buckets``: hash buckets per view's REDUCED table,
        keyed on key_json (the re-aggregation key) — a maintenance
        batch's delta touches only its keys' buckets, so the reduced
        rewrite is O(delta-buckets), not O(view keys). Without this,
        a high-cardinality keyed view (count per URL over a 100 TB
        corpus) pays an O(|reduced|) copy-on-write per micro-batch
        however small the delta. Same pinning rules as
        entries_buckets.

        ``changelog_hash_levels``: 1 interposes a 256-way
        origin_hash=xx/ directory level above origin= in the
        changelog — the layout for warehouses tracking MILLIONS of
        sources, where a flat origin= listing is the bottleneck
        (AppendOnlyLog docstring). A property of the warehouse:
        pinned on first write, adopted on reopen; an existing
        single-level warehouse refuses the upgrade loudly.

        ``minmax_hist_bound``: per-key distinct-value budget of the
        min/max histogram sidecar (_reduced_hist_table) — the bound
        past which a retraction-drained key falls back to the refold.
        Applies to NEW hist rows as each batch ranks; an existing
        warehouse's rows re-rank under the current bound."""
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.entries_buckets = int(entries_buckets)
        self.reduced_buckets = int(reduced_buckets)
        self.minmax_hist_bound = int(minmax_hist_bound)
        self.views: dict[str, ViewDefinition] = {}
        self._listeners: dict[str, list[Callable[..., None]]] = {}
        for event, cbs in (listeners or {}).items():
            for cb in cbs:
                self.on(event, cb)
        self._indexed_origins: set[str] = set()
        self._missing_origins: set[str] = set()
        self._active_streams: list = []
        self._closed = False
        # entries_df plan cache: store key -> (ptr version, DataFrame)
        self._entries_df_cache: dict = {}
        # sweep staged-write orphans: a crash (or an exception that
        # escaped a deferred commit) between a staged pair/onejob
        # write and its commit/cancel leaves a data-sized _merge-*
        # temp dir nothing references (r14 ADVICE). Open-time is the
        # safe sweep point under the single-driver orchestration
        # contract (SURVEY §2.1 #18): no other engine can own one.
        import glob as _glob
        import shutil as _shutil

        for _d in _glob.glob(f"{self.warehouse}/_merge-*"):
            _shutil.rmtree(_d, ignore_errors=True)
        try:
            # append-only: watch mode streams from this stable directory
            self.changelog = AppendOnlyLog(
                spark,
                f"{self.warehouse}/changelog",
                FILES_SCHEMA,
                # origin-partitioned: index()/current_version() filter by
                # origin, which then prunes to one source's directory
                # (PartitionFilters) instead of scanning the whole log
                partition_by=("origin",),
                hash_levels=changelog_hash_levels,
            )
            # origin-bucketed metadata: per-batch offset reads/upserts
            # touch only the batch's origins' buckets (r13 verdict #3
            # — a flat offsets table is a whole-table driver read and
            # rewrite per maintenance cycle, the next driver
            # bottleneck past ~10^5 sources)
            self.offsets = BucketedMetaTable(
                spark,
                f"{self.warehouse}/offsets",
                OFFSETS_SCHEMA,
                bucket_col="origin",
            )
        except Exception as e:  # reference open-failed, index.js:57
            self._emit("open-failed", error=str(e))
            raise
        self._emit("open")

    # -- events -----------------------------------------------------
    def on(self, event: str, cb: Callable[..., None]) -> None:
        if event not in EVENTS:
            raise ValueError(f"unknown event {event!r}; valid: {EVENTS}")
        self._listeners.setdefault(event, []).append(cb)

    def _emit(self, event: str, **payload: Any) -> None:
        for cb in self._listeners.get(event, []):
            cb(**payload)

    # -- view definition (reference define(), index.js:96-109) ------
    def define(
        self,
        name: str,
        *,
        path,
        map,
        reduce=None,
        key_schema=("string",),
        value_type: "str | None" = None,
    ) -> ViewDefinition:
        vdef = validate_view_def(
            ViewDefinition(
                name=name,
                path=path,
                map=map,
                reduce=reduce,
                key_schema=list(key_schema),
                value_type=value_type,
            )
        )
        import os as _os

        existing = self.views.get(name)
        if existing is not None:
            # redefining a view resets its materialization, as the
            # reference requires an explicit reset after def change
            self.reset(name)
        old_sid = None
        sp = f"{self.warehouse}/views/{name}/store.json"
        try:
            with open(sp) as f:
                old_sid = json.load(f)["store"]
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            pass
        self.views[name] = vdef
        sid = self._store_key(vdef)
        if old_sid is not None and old_sid != sid:
            # the view's map stage changed ACROSS sessions (store.json
            # pins the identity the materialized state was built
            # under): detach from the old shared store and reset —
            # the same contract in-session redefinition gets above.
            # Without this, an identity-keyed store would silently
            # serve an EMPTY view for a changed map (worse than the
            # legacy stale-entries failure mode).
            self._remove_store_member(old_sid, name)
            if existing is None:
                self.reset(name)
        _os.makedirs(_os.path.dirname(sp), exist_ok=True)
        tmp = sp + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"store": sid}, f)
        _os.replace(tmp, sp)
        self._add_store_member(sid, name)
        return vdef

    def _view(self, name: str) -> ViewDefinition:
        if name not in self.views:
            raise ViewNotFoundError(name)
        return self.views[name]

    # -- storage handles --------------------------------------------
    def _store_key(self, vdef: ViewDefinition) -> str:
        """Grouping key of the view's ENTRIES STORE (r14 verdict #5).
        'map:<identity>' — a store SHARED by every view with the same
        (path, map code, key schema), so twin views (the mapped +
        reduced pattern) write each entry row ONCE; 'view:<name>' — a
        private store, used when the map's behavior is not provable
        from its code (ViewDefinition.map_identity returns None) or
        when the view already has a LEGACY per-view store on disk
        (pre-r15 warehouse — membership math must never move an
        existing store)."""
        import os as _os

        if _os.path.isdir(f"{self.warehouse}/views/{vdef.name}/entries"):
            return f"view:{vdef.name}"
        ident = vdef.map_identity()
        return f"map:{ident}" if ident is not None else f"view:{vdef.name}"

    def _store_paths(self, vdef: ViewDefinition) -> "tuple[str, str]":
        """(entries root, pointer-table root) of the view's store."""
        sid = self._store_key(vdef)
        if sid.startswith("view:"):
            base = f"{self.warehouse}/views/{vdef.name}"
            return f"{base}/entries", f"{base}/entries_ptrs"
        base = f"{self.warehouse}/stores/{sid[4:]}"
        return f"{base}/entries", f"{base}/_ptrs"

    def _store_members_path(self, sid: str) -> "str | None":
        if not sid.startswith("map:"):
            return None  # private stores have exactly one member
        return f"{self.warehouse}/stores/{sid[4:]}/_members.json"

    def _store_members(self, sid: str) -> "set[str]":
        p = self._store_members_path(sid)
        if p is None:
            return set()
        try:
            with open(p) as f:
                return set(json.load(f))
        except (FileNotFoundError, json.JSONDecodeError):
            return set()

    def _add_store_member(self, sid: str, name: str) -> None:
        p = self._store_members_path(sid)
        if p is None:
            return
        import os as _os

        members = self._store_members(sid) | {name}
        _os.makedirs(_os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(members), f)
        _os.replace(tmp, p)

    def _remove_store_member(self, sid: str, name: str) -> None:
        """Drop ``name`` from the shared store's member registry; a
        store left with NO members is deleted outright (its entries
        are derived data no remaining view references)."""
        p = self._store_members_path(sid)
        if p is None:
            return
        import os as _os
        import shutil as _shutil

        members = self._store_members(sid) - {name}
        if members:
            tmp = p + ".tmp"
            with open(tmp, "w") as f:
                json.dump(sorted(members), f)
            _os.replace(tmp, p)
        else:
            _shutil.rmtree(_os.path.dirname(p), ignore_errors=True)

    def _entries_table(self, view: str, origin: str) -> BucketedEntriesTable:
        """Per-(store, origin) entries shard, hash-bucketed on file_url
        (the retraction key): merges rewrite only buckets containing
        the batch's changed files — see BucketedEntriesTable. Views
        sharing a map stage resolve the SAME shard (r14 verdict #5);
        pre-r15 per-view layouts keep resolving their legacy path."""
        vdef = self._view(view)
        ent_root, _ = self._store_paths(vdef)
        return BucketedEntriesTable(
            self.spark,
            f"{ent_root}/{_origin_shard(origin)}",
            entries_schema(vdef.key_types()),
            bucket_col="file_url",
            n_buckets=self.entries_buckets,
        )

    def _reduced_table(self, view: str) -> BucketedEntriesTable:
        """Per-view reduced table, hash-bucketed on key_json (the
        re-aggregation key): a maintenance batch's delta touches only
        its keys' buckets, so the copy-on-write rewrite is
        O(delta-buckets * |reduced|/N) with untouched buckets
        hardlinked — the same delta-proportional contract the entries
        shards get from file_url bucketing. A flat legacy snapshot
        (pre-r13 warehouse, or a reset) re-buckets on its next merge
        and is incremental afterwards."""
        vdef = self._view(view)
        return BucketedEntriesTable(
            self.spark,
            f"{self.warehouse}/views/{view}/reduced",
            reduced_schema(vdef.key_types()),
            bucket_col="key_json",
            n_buckets=self.reduced_buckets,
        )

    def _reduced_cnt_table(self, view: str) -> BucketedEntriesTable:
        """Sidecar (key_json, cnt, ssum) table for sum/avg-delta
        views — the EXACT integer sufficient statistics of the fold:
        live entry count and integer value sum per key. Two needs:
        (1) delete-on-empty requires the live COUNT (a key whose
        entries all retracted must vanish, while a key whose
        remaining entries genuinely sum to 0 must stay — the sum
        cannot signal emptiness); (2) avg is not recoverable from its
        own folded value (sum/count collapses two integers into one
        double), so the delta path maintains the pair and DERIVES the
        reduced value from it — pure integer arithmetic until the
        final double format, bit-identical to the refold (whose
        double sums over integers are exact). Committed with the same
        batch token as the reduced table, bucketed identically so one
        delta serves both. Views whose fold is not delta-eligible
        never materialize it."""
        from pyspark.sql import types as T

        return BucketedEntriesTable(
            self.spark,
            f"{self.warehouse}/views/{view}/reduced_cnt",
            T.StructType(
                [
                    T.StructField("key_json", T.StringType(), False),
                    T.StructField("cnt", T.LongType(), False),
                    T.StructField("ssum", T.LongType(), False),
                ]
            ),
            bucket_col="key_json",
            n_buckets=self.reduced_buckets,
        )

    def _reduced_hist_table(self, view: str) -> BucketedEntriesTable:
        """Bounded per-key value-HISTOGRAM sidecar for min/max views
        (r13 verdict #7): rows (key_json, v_txt, cnt, hz) where the
        non-null-v_txt rows are the key's <= minmax_hist_bound most
        extreme distinct raw value TEXTS with their live entry counts
        (smallest for min, largest for max), and at most one
        OVERFLOW row per key (v_txt NULL) carries the exact count of
        untracked entries plus the HORIZON hz — the value text
        separating tracked from untracked: every untracked value is
        at or beyond hz in the fold's direction, every tracked one
        strictly inside it. That invariant is what makes retraction
        O(delta): a retracted value routes to the kept row or the
        overflow count by a pure hz comparison, the new extreme reads
        off the kept set, delete-on-empty is the exact total count,
        and only a key whose kept set drains while its overflow is
        non-empty needs the refold (the sanctioned fallback past the
        bound). Ordering is (double value, text) so texts that cast
        to one double still rank totally. Bucketed like every reduced
        table; committed with the reduced table's batch token /
        refold sync marker (one fused write)."""
        from pyspark.sql import types as T

        return BucketedEntriesTable(
            self.spark,
            f"{self.warehouse}/views/{view}/reduced_hist",
            T.StructType(
                [
                    T.StructField("key_json", T.StringType(), False),
                    T.StructField("v_txt", T.StringType(), True),
                    T.StructField("cnt", T.LongType(), False),
                    T.StructField("hz", T.StringType(), True),
                ]
            ),
            bucket_col="key_json",
            n_buckets=self.reduced_buckets,
        )

    def _known_origins(self) -> set[str]:
        # driver-local metadata read (no Spark job): the offsets table
        # is O(views x sources) rows by construction. NOT on the
        # per-batch maintenance path (entries_df resolves shards from
        # the per-view pointer table instead, r14 verdict #1/#2) —
        # callers are API surface (list_indexed/is_indexed), reset,
        # and the vacuum/rebucket maintenance cadences, each of which
        # is inherently O(origins) in its own output.
        return {o for _v, o, _lv in self.offsets.read_rows()} | set(
            self._indexed_origins
        )

    def _entries_ptr_table(self, view: str) -> BucketedMetaTable:
        """Per-view consolidated shard-pointer index (r14 verdict #1):
        one row (origin, version) per materialized entries shard,
        origin-hash-bucketed like the offsets table, upserted inside
        every shard pointer flip (_merge_entry_shard commit,
        _merge_view_shards_onejob commit, rebucket; deleted on
        unindex, reset on view reset). entries_df resolves every
        shard's current snapshot from k small bucket files instead of
        opening one _manifest.json per origin — the residual
        O(origins) driver work that made mapped-view plan
        construction grow 3.75x across 256->1024 origins (r14 bench);
        at the 10^6-source scale the two-level changelog targets,
        per-origin manifest opens would be a million driver file
        opens per read. Per-batch maintenance cost is the
        BucketedMetaTable contract: the upsert rewrites only the
        batch origins' buckets and hardlinks the rest."""
        from pyspark.sql import types as T

        _, ptr_root = self._store_paths(self._view(view))
        return BucketedMetaTable(
            self.spark,
            ptr_root,
            T.StructType(
                [
                    T.StructField("origin", T.StringType(), False),
                    T.StructField("version", T.LongType(), False),
                ]
            ),
            bucket_col="origin",
        )

    def _record_entry_ptrs(self, view: str, origins: "Sequence[str]") -> None:
        """Upsert the CURRENT snapshot version of each origin's shard
        into the view's pointer table — called inside/after every
        shard pointer flip, one bucket-scoped upsert per batch.
        Driver-side manifest reads of the batch's origins only."""
        rows = []
        for o in origins:
            v = self._entries_table(view, o)._current()
            if v is not None:
                rows.append((o, v))
        if rows:
            self._entries_ptr_table(view).upsert_rows(rows, key_cols=(0,))

    def _bootstrap_entry_ptrs(self, view: str) -> "list[tuple[str, int]]":
        """One-time upgrade for a warehouse written before the pointer
        table existed: resolve every known origin's shard manifest
        (the legacy O(origins) walk) and persist the consolidated
        rows, so every later entries_df is pointer-table-only."""
        rows: "list[tuple[str, int]]" = []
        base, _ = self._store_paths(self._view(view))
        for o in sorted(self._known_origins()):
            try:
                with open(f"{base}/{_origin_shard(o)}/_manifest.json") as f:
                    rows.append((o, int(json.load(f)["current"])))
            except (FileNotFoundError, KeyError, ValueError, json.JSONDecodeError):
                continue  # origin known but shard never materialized
        self._entries_ptr_table(view).overwrite_rows(rows)
        return rows

    def entries_df(self, view: str, origins: Sequence[str] | None = None) -> DataFrame:
        """All current entries of a view as ONE DataFrame. Shards stay
        per-origin on disk (retraction rewrites one shard), but the
        read is a single multi-path parquet relation over every
        shard's current snapshot directory — NOT a per-origin
        unionByName loop, whose logical plan grew one relation per
        origin and made plan construction/analysis itself O(origins):
        at the millions-of-sources scale the two-level changelog
        layout targets, a mapped-view get()/list() would die in the
        analyzer before reading a byte (r13 verdict #2). Snapshot
        paths resolve NOW from the view's consolidated pointer table
        (k small bucket files, NOT one manifest open per origin — r14
        verdict #1), so the returned plan stays pinned across later
        pointer flips — the same contract as read_buckets. Spark's
        InMemoryFileIndex then lists the shard directories in
        parallel, which is where an O(origins) step belongs.

        A pointer whose snapshot directory is GONE self-heals from
        the shard manifest (a lagging pointer after a crash window —
        the replayed batch re-records it); a manifest that names a
        missing directory raises FileNotFoundError rather than
        silently serving partial results (r14 ADVICE — read()/
        current_is_bucketed raise for this same corruption)."""
        import os as _os

        vdef = self._view(view)
        base, _ = self._store_paths(vdef)
        ptr = self._entries_ptr_table(view)
        cache_key = cur_ptr_v = None
        if origins is None:
            # POINTER-VERSIONED PLAN CACHE: the ptr table flips on
            # every entries commit/reset/unindex/rebucket, so its
            # current version is exactly "has any shard changed".
            # Serving workloads call entries_df per get()/list();
            # rebuilding the multi-path relation each time re-lists
            # every shard dir (the O(files) cost Spark's file index
            # pays at construction — ~0.45 ms/path driver-side).
            # Between flips the resolved plan is immutable, so repeat
            # reads are a dict hit; one rebuild per batch flip.
            cache_key = (self._store_key(vdef), tuple(vdef.key_types()))
            cur_ptr_v = ptr._current()
            hit = self._entries_df_cache.get(cache_key)
            if hit is not None and hit[0] == cur_ptr_v:
                return hit[1]
        if ptr.exists():
            rows = ptr.read_rows(origins)
            if origins is not None:
                want = set(origins)
                rows = [r for r in rows if r[0] in want]
                # explicit origins absent from the pointer table fall
                # back to their manifests (bounded by the request)
                have = {o for o, _v in rows}
                for o in want - have:
                    try:
                        with open(
                            f"{base}/{_origin_shard(o)}/_manifest.json"
                        ) as f:
                            rows.append((o, int(json.load(f)["current"])))
                    except (
                        FileNotFoundError, KeyError, ValueError,
                        json.JSONDecodeError,
                    ):
                        continue
        else:
            rows = self._bootstrap_entry_ptrs(view)
            if origins is not None:
                want = set(origins)
                rows = [r for r in rows if r[0] in want]
        dirs: list[str] = []
        for o, v in rows:
            root = f"{base}/{_origin_shard(o)}"
            d = f"{root}/v{v:08d}"
            if not _os.path.isdir(d):
                # stale pointer: re-resolve from the shard manifest
                try:
                    with open(f"{root}/_manifest.json") as f:
                        v = int(json.load(f)["current"])
                except (
                    FileNotFoundError, KeyError, ValueError,
                    json.JSONDecodeError,
                ):
                    continue  # shard gone entirely (unindexed)
                d = f"{root}/v{v:08d}"
                if not _os.path.isdir(d):
                    raise FileNotFoundError(
                        f"entries shard {root} manifest points at "
                        f"missing snapshot v{v:08d} — corrupted "
                        "warehouse (vacuumed past current?)"
                    )
                self._record_entry_ptrs(view, [o])
            dirs.append(d)
        if not dirs:
            df = empty_df(self.spark, entries_schema(vdef.key_types()))
        else:
            df = (
                self.spark.read.schema(entries_schema(vdef.key_types()))
                .option("recursiveFileLookup", "true")
                .parquet(*dirs)
            )
        if cache_key is not None:
            self._entries_df_cache[cache_key] = (cur_ptr_v, df)
        return df

    def reduced_df(self, view: str) -> DataFrame:
        return self._reduced_table(view).read()

    # -- changelog ingestion ----------------------------------------
    def append_changes(self, rows: list[dict]) -> None:
        """Append put/del records to the engine's changelog (the analog
        of new entries appearing in a Dat archive's history)."""
        self.changelog.append(changelog_from_rows(self.spark, rows))

    def current_version(self, origin: str) -> int:
        row = (
            self.changelog.read_origin(origin)
            .agg(F.max("version").alias("v"))
            .first()
        )
        return row["v"] if row and row["v"] is not None else 0

    # -- indexing (reference index(), indexArchive, applyUpdates) ---
    def index(self, origin: str, watch: bool = False) -> None:
        """Incrementally index one source across all views
        (reference indexArchive, lib/indexer.js:121-179).

        ``watch=True`` reproduces the reference's coupled
        ``index(url, {watch: true})`` ergonomics (index.js:127-141):
        after the catch-up pass, a continuous maintenance stream is
        started (once per engine) so later changelog appends index
        automatically. Stop it with close().

        Source availability: the reference's p2p retry loop emits
        `archive-missing` when an archive cannot be loaded and
        `archive-found` when it appears (lib/indexer.js:309-340). The
        Spark analog probes the changelog: an origin indexed while it
        has NO changelog rows is missing; the first index pass that
        sees rows for a previously-missing origin emits found.
        """
        self._indexed_origins.add(origin)
        target_version = self.current_version(origin)
        if target_version == 0:
            if origin not in self._missing_origins:
                self._missing_origins.add(origin)
                self._emit("archive-missing", origin=origin)
            if watch:
                self.watch_views()
            return
        if origin in self._missing_origins:
            self._missing_origins.discard(origin)
            self._emit("archive-found", origin=origin)
        log = self.changelog.read_origin(origin)
        # bucket-pruned metadata read: one origin touches one bucket
        # file, not the whole (views x sources) table
        offsets = {
            v: lv
            for v, o, lv in self.offsets.read_rows([origin])
            if o == origin
        }
        any_work = False
        offset_updates: list[tuple[str, str, int]] = []
        # group views by (entries store, start offset): map-twin views
        # at the same offset share ONE merge (the entries rows are
        # byte-identical — r14 verdict #5) and re-aggregate each from
        # the shared affected keys; a twin at a DIFFERENT offset (e.g.
        # defined later) indexes separately over its own update range
        groups: "dict[tuple[str, int], list[tuple[str, ViewDefinition]]]" = {}
        for name, vdef in self.views.items():
            start = offsets.get(name, 0)
            if start >= target_version:
                continue
            groups.setdefault((self._store_key(vdef), start), []).append(
                (name, vdef)
            )
        for (_sid, start), members in groups.items():
            for name, _v in members:
                self._emit(
                    "archive-indexing",
                    origin=origin,
                    view=name,
                    version=target_version,
                )
            updates = latest_wins(
                glob_filter(log, members[0][1].path),
                start=start,
                end=target_version,
            )
            try:
                applied = self._apply_updates_group(
                    [v for _n, v in members], origin, updates
                )
            except Exception as e:  # reference archive-error, indexer.js:338
                self._emit(
                    "archive-error",
                    origin=origin,
                    view=members[0][0],
                    error=str(e),
                )
                raise
            # progress granularity is the compacted batch, not the
            # single file: one emission per (view, origin) delta
            # (reference ticks per update, lib/indexer.js:413-418 —
            # per-row driver callbacks would defeat batch execution)
            for name, _v in members:
                self._emit(
                    "archive-index-progress",
                    origin=origin,
                    view=name,
                    processed=applied,
                    total=applied,
                )
                offset_updates.append((name, origin, target_version))
                self._emit(
                    "archive-indexed",
                    origin=origin,
                    view=name,
                    version=target_version,
                )
            any_work = True
        self._set_offsets(offset_updates)
        if any_work:
            self._emit("indexes-updated", origin=origin, version=target_version)
        if watch:
            self.watch_views()

    def index_source(self, origin: str, rows: list[dict], watch: bool = False) -> None:
        """Convenience: append changes for origin then index it."""
        self.append_changes(rows)
        self.index(origin, watch=watch)

    def index_with_retry(
        self,
        origin: str,
        watch: bool = False,
        retry_interval: float = 30.0,
        max_retries: int | None = None,
    ) -> bool:
        """Index a source, retrying while it is missing — the
        reference's onFailInitialIndex loop (lib/indexer.js:309-340):
        a failed initial index emits `archive-missing`, re-probes
        every 30 s until the source appears, emits `archive-found`,
        then indexes (and watches, if asked). Here "missing" means the
        origin has no changelog rows yet (index() emits both events);
        each retry re-probes the changelog.

        Blocks until the source is found or ``max_retries`` probes
        are exhausted (None = retry forever, the reference's
        behavior). Returns True if the source was found and indexed.
        The default 30 s interval matches the reference's constant.
        """
        import time as _time

        attempts = 0
        while True:
            # watch starts only after the source is found, like the
            # reference (watchArchive after the successful re-index)
            self.index(origin, watch=False)
            if origin not in self._missing_origins:
                if watch:
                    self.watch_views()
                return True
            attempts += 1
            if max_retries is not None and attempts > max_retries:
                return False
            _time.sleep(retry_interval)

    def _set_offset(self, view: str, origin: str, version: int) -> None:
        self._set_offsets([(view, origin, version)])

    def _set_offsets(self, updates: list[tuple[str, str, int]]) -> None:
        """Upsert a batch of (view, origin, last_version) rows in ONE
        bucket-scoped metadata write. The offsets table is one row per
        (view, origin), origin-bucketed (BucketedMetaTable): the
        upsert reads and rewrites only the batch's origins' bucket
        files and hardlinks the rest — driver-local pyarrow IO that
        stays O(origins-in-batch) however many sources the warehouse
        tracks, never a Spark job. Batching keeps an index() cycle at
        one write instead of one per view."""
        if not updates:
            return
        self.offsets.upsert_rows(updates, key_cols=(0, 1))

    def _url_bucket_expr(self):
        """Entries-shard bucket id of a changelog row's ``url`` column
        (must mirror BucketedEntriesTable.bucket_expr with the
        engine's bucket count)."""
        return F.pmod(F.crc32(F.col("url").cast("string")), F.lit(self.entries_buckets)).cast(
            "int"
        )

    # -- the core merge: retract-then-add + re-aggregate ------------
    def _merge_entry_shard(
        self,
        vdef: ViewDefinition,
        origin: str,
        updates: DataFrame,
        new_entries: DataFrame,
        bucket_ids: "list[int] | None" = None,
        defer_commit: bool = False,
    ):
        """THE retract-then-add merge of one (view, origin) entries
        shard — the single implementation both the batch path
        (_apply_entry_updates) and the watch path (_apply_view_batch)
        go through, so retraction semantics cannot diverge between
        them. Retracts every entry derived from a file in ``updates``
        (provenance anti-join on file_url, lib/view.js:126-148),
        appends ``new_entries``, writes the shard. Returns the LAZY
        retracted-keys DataFrame; its plan resolves the pre-overwrite
        snapshot paths at construction, so it stays correct after the
        pointer flip. ``updates``/``new_entries`` must already be
        restricted to this origin.

        Delta-proportional IO: the shard is hash-bucketed on file_url,
        and every row derived from url u lives in bucket crc32(u)%N —
        so the batch's ``bucket_ids`` (from the urls alone; callers
        pass them precomputed to skip the probe job here) bound BOTH
        the retraction scan and the rewrite to the touched buckets;
        untouched buckets carry into the new snapshot as hardlinks
        (BucketedEntriesTable.write_merged). One Spark job per merge,
        reading+writing O(delta + touched_buckets * shard/N), where
        the flat layout read+rewrote O(shard) per batch — the LevelDB
        O(keys-touched) batch-write analog (lib/view.js:89-103)."""
        ent_table = self._entries_table(vdef.name, origin)
        affected_urls = updates.select("url")
        if not ent_table.current_is_bucketed():
            # pre-bucketing (flat) snapshot: one full re-bucketing
            # rewrite; every later merge is incremental
            bucket_ids = list(range(ent_table.n_buckets))
        elif bucket_ids is None or ent_table.n_buckets != self.entries_buckets:
            # callers precompute ids with the ENGINE's bucket count;
            # a shard created under a different count pins its own
            # (_buckets.json), so recompute against the shard's N —
            # stale ids here would hardlink a bucket that needed
            # retraction
            bucket_ids = None
        if bucket_ids is None:
            bucket_ids = sorted(
                r["b"]
                for r in updates.select(ent_table.bucket_expr("url").alias("b"))
                .distinct()
                .collect()
            )
        old_touched = ent_table.read_buckets(bucket_ids)
        surviving = old_touched.join(
            F.broadcast(affected_urls),
            old_touched["file_url"] == affected_urls["url"],
            "left_anti",
        )
        # retracted ROWS (multiplicity preserved): distinct key_json
        # consumers project+distinct; the count-delta re-aggregation
        # needs the exact per-key retraction counts
        retracted_rows = old_touched.join(
            F.broadcast(affected_urls),
            old_touched["file_url"] == affected_urls["url"],
            "left_semi",
        ).select("key", "key_json")
        commit0 = ent_table.write_merged(
            bucket_ids,
            surviving.unionByName(new_entries),
            sort_cols=["key_json", "file_url", "emit_seq"],
            defer_commit=True,
        )

        def commit() -> None:
            commit0()
            # keep the view's consolidated pointer table in step with
            # the flip (r14 verdict #1): one bucket-scoped upsert
            self._record_entry_ptrs(vdef.name, [origin])

        # defer_commit=True hands the caller the pointer flip (the
        # exact-delta watch path overlaps this write with the reduced
        # commit but flips entries only after it)
        if defer_commit:
            return retracted_rows, commit
        commit()
        return retracted_rows

    def _merge_view_shards_onejob(
        self,
        vdef: ViewDefinition,
        updates: DataFrame,
        new_entries: DataFrame,
        counts: "dict[str, int]",
        buckets: "dict[str, list[int]]",
        defer_commit: bool = False,
    ):
        """Multi-origin watch merge in ONE Spark write job (r11
        verdict #3): the per-origin _merge_entry_shard loop launches
        one write job per (view, origin) — at 4 origins x 2 views
        that job fan-out IS the fixed per-batch cost floor the
        maintain bench measures. Here every origin's surviving + new
        rows are written together, partitioned by (origin index,
        bucket id) into a temp dir under the warehouse, then
        committed per shard driver-side: move the written bucket dirs
        into each shard's new snapshot, hardlink untouched buckets,
        flip pointers. Semantics are identical to the per-origin loop
        — same retraction anti-join (file_url embeds its origin, so
        one global anti-join retracts exactly per-origin: a url never
        appears in another origin's shard), same bucket layout, same
        crash contract (pointer flips remain the only commit; offsets
        advance only after every flip, so a mid-commit crash
        re-applies the batch idempotently, exactly like a crash
        between two of the old per-origin writes). Caller must have
        verified every shard is ELIGIBLE: absent, or a bucketed
        current snapshot at the engine bucket count (a divergent
        shard falls back to _merge_entry_shard, which recomputes its
        ids). Returns the LAZY retracted-keys DataFrame (plans pinned
        to pre-flip snapshot paths, the read_buckets contract)."""
        import os
        import shutil
        import tempfile as _tf

        from dat_archive_map_reduce_spark.plans.catalog import _link_tree

        origins = sorted(counts)
        tables = {o: self._entries_table(vdef.name, o) for o in origins}
        n = self.entries_buckets
        affected_urls = updates.select("url")
        old_touched = tables[origins[0]].read_buckets(buckets[origins[0]])
        for o in origins[1:]:
            old_touched = old_touched.unionByName(
                tables[o].read_buckets(buckets[o])
            )
        surviving = old_touched.join(
            F.broadcast(affected_urls),
            old_touched["file_url"] == affected_urls["url"],
            "left_anti",
        )
        retracted_rows = old_touched.join(
            F.broadcast(affected_urls),
            old_touched["file_url"] == affected_urls["url"],
            "left_semi",
        ).select("key", "key_json")
        o_idx = {o: i for i, o in enumerate(origins)}
        mapping = F.create_map(
            *[F.lit(x) for o in origins for x in (o, o_idx[o])]
        )
        w = (
            surviving.unionByName(new_entries)
            .withColumn("_o", mapping[F.col("origin")].cast("int"))
            .withColumn("_b", tables[origins[0]].bucket_expr("file_url"))
        )
        tmp = _tf.mkdtemp(prefix="_merge-onejob-", dir=self.warehouse)
        try:
            (
                # no explicit partition count: a REPARTITION_BY_COL
                # shuffle lets AQE size the write tasks to the DELTA
                # (a drip batch coalesces to ~1 task, a backfill keeps
                # full parallelism) — an explicit (origin x bucket)
                # count pinned 64 near-empty tasks per batch, which
                # WAS the fixed cost this one-job path exists to cut.
                # Each (_o,_b) combo still hashes wholly into one
                # task, so every bucket dir gets at most a handful of
                # sorted files
                w.repartition("_o", "_b")
                .sortWithinPartitions(
                    "_o", "_b", "key_json", "file_url", "emit_seq"
                )
                .write.mode("overwrite")
                .partitionBy("_o", "_b")
                .parquet(tmp)
            )
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise

        def _commit() -> None:
            try:
                for o in origins:
                    t = tables[o]
                    cur = t._current()
                    v = (cur or 0) + 1
                    dest = t._snapshot_dir(v)
                    if os.path.isdir(dest):
                        # crash-orphaned dir at this version: clear it,
                        # the overwrite-clears-dest convention of every
                        # writer
                        shutil.rmtree(dest, ignore_errors=True)
                    os.makedirs(dest, exist_ok=True)
                    src_root = f"{tmp}/_o={o_idx[o]}"
                    if os.path.isdir(src_root):
                        for bd in os.listdir(src_root):
                            if bd.startswith("_b="):
                                os.rename(f"{src_root}/{bd}", f"{dest}/{bd}")
                    # a touched bucket with no written dir is now EMPTY
                    # — correct, and why only UNtouched buckets hardlink
                    if cur is not None:
                        touched = set(buckets[o])
                        for b in range(n):
                            if b in touched:
                                continue
                            src = t._bucket_dir(cur, b)
                            if os.path.isdir(src):
                                _link_tree(src, t._bucket_dir(v, b))
                    t._write_snapshot_meta(dest, n)
                    t._set_current(v)
                # one pointer-table upsert for the whole batch's
                # origins (r14 verdict #1), after every shard flipped
                self._record_entry_ptrs(vdef.name, origins)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        if defer_commit:
            return retracted_rows, _commit
        _commit()
        return retracted_rows

    def _onejob_eligible(self, view: str, origin: str) -> bool:
        """A shard can join the one-job multi-origin write iff it is
        absent (first index) or its current snapshot is bucketed at
        the engine bucket count — the layout the job's (origin,
        bucket) partitioning assumes. Flat legacy snapshots and
        rebucketed shards (per-shard N != engine default) fall back
        to _merge_entry_shard, which handles both."""
        t = self._entries_table(view, origin)
        return not t.exists() or (
            t.current_is_bucketed() and t.n_buckets == self.entries_buckets
        )

    def _apply_entry_updates(
        self, vdef: ViewDefinition, origin: str, updates: DataFrame
    ) -> "tuple[int, DataFrame | None]":
        """The entries half of the merge for one (view, origin): map
        the new 'put' contents and run the shard merge. Returns (n
        file updates applied, CACHED affected-keys DataFrame or None
        if the batch was empty) — the caller owns re-aggregation
        scope and must unpersist the keys. Used by the single-origin
        batch paths (index/index_file/unindex_file); watch mode's
        multi-origin analog is _apply_view_batch.
        """
        updates = updates.cache()
        try:
            # one probe job returns the batch size AND the touched
            # bucket ids (bounded: <= entries_buckets values), so the
            # merge needs no second look at the updates
            probe = updates.agg(
                F.count(F.lit(1)).alias("n"),
                F.collect_set(self._url_bucket_expr()).alias("bs"),
            ).first()
            n_updates = probe["n"]
            if n_updates == 0:
                return 0, None
            new_entries = run_map(
                updates.filter(F.col("type") == "put"),
                vdef.map,
                vdef.key_types(),
                value_type=vdef.value_type,
            )
            retracted_rows = self._merge_entry_shard(
                vdef, origin, updates, new_entries, bucket_ids=sorted(probe["bs"])
            )
            # keys touched now or before: the re-aggregation scope
            # (old keys ∪ new keys, lib/indexer.js:228,273-274)
            affected_keys = (
                retracted_rows.select("key_json")
                .union(new_entries.select("key_json"))
                .distinct()
                .cache()
            )
            # fill the keys cache NOW, while ``updates`` is still
            # cached — materializing lazily after the finally below
            # would re-run the map UDF from the raw changelog
            affected_keys.count()
            return n_updates, affected_keys
        finally:
            updates.unpersist()

    def _apply_updates(self, vdef: ViewDefinition, origin: str, updates: DataFrame) -> int:
        """Apply a latest-wins-compacted update batch for one
        (view, origin): entries merge + re-fold of the affected keys
        (reference readAndIndexFile/unindexFile,
        lib/indexer.js:217-292). Returns the number of file updates
        applied (for archive-index-progress).
        """
        return self._apply_updates_group([vdef], origin, updates)

    def _apply_updates_group(
        self,
        vdefs: "list[ViewDefinition]",
        origin: str,
        updates: DataFrame,
    ) -> int:
        """_apply_updates for a group of views SHARING one entries
        store (same _store_key — byte-identical entry rows): the
        merge runs once, every member re-aggregates from the shared
        affected keys (r14 verdict #5 — running the merge per twin
        doubled entry-write IO, and under a shared store the second
        merge would find its own rows already present). The map stage
        enforces the strictest declared-integer value_type in the
        group, mirroring the watch path's shared-map contract."""
        lead = vdefs[0]
        for v in vdefs:
            if v.value_type in ("long", "int", "bigint"):
                lead = v
                break
        n_updates, affected_keys = self._apply_entry_updates(lead, origin, updates)
        if affected_keys is None:
            return 0
        for v in vdefs:
            if v.reduce is not None:
                self._reaggregate(v, affected_keys)
        affected_keys.unpersist()
        return n_updates

    def _probe_batch(
        self, batch_df: DataFrame, path_groups: "dict[tuple, object]"
    ) -> "tuple[dict[str, int], dict[tuple, dict[str, int]], dict[tuple, dict[str, list[int]]]]":
        """ONE aggregation job over a micro-batch computing everything
        the maintenance cycle needs driver-side: per-origin target
        version, plus — per distinct view path-group — the compacted
        update count per origin (distinct pathnames; latest_wins keeps
        exactly one row per path) and the touched entries-bucket ids
        (bounded: <= entries_buckets values per origin). Replaces the
        r10 two-job probe (per-origin max, then per-group
        count/bucket agg on the cached compaction) with a single
        partial-combined groupBy — one fewer job wave per batch, and
        the compaction caches can now fill lazily on their first real
        consumer (the map stage) instead of a dedicated count job."""
        from dat_archive_map_reduce_spark.sources.files import glob_to_regex

        aggs = [F.max("version").alias("target")]
        keys = list(path_groups)
        for i, pk in enumerate(keys):
            pred = F.col("pathname").rlike(glob_to_regex(path_groups[pk]))
            aggs.append(
                F.count_distinct(F.when(pred, F.col("pathname"))).alias(f"n_{i}")
            )
            aggs.append(
                F.collect_set(F.when(pred, self._url_bucket_expr())).alias(f"bs_{i}")
            )
        rows = batch_df.groupBy("origin").agg(*aggs).collect()
        targets = {r["origin"]: (r["target"] or 0) for r in rows}
        counts: "dict[tuple, dict[str, int]]" = {pk: {} for pk in keys}
        buckets: "dict[tuple, dict[str, list[int]]]" = {pk: {} for pk in keys}
        for i, pk in enumerate(keys):
            for r in rows:
                n = r[f"n_{i}"]
                if n:
                    counts[pk][r["origin"]] = n
                    buckets[pk][r["origin"]] = sorted(r[f"bs_{i}"])
        return targets, counts, buckets

    def _apply_view_batch(
        self,
        vdef: ViewDefinition,
        log: DataFrame,
        origin_starts: "dict[str, int]",
        prepared: "tuple[DataFrame, dict[str, int], dict[str, list[int]]]",
        mapped: "DataFrame | None" = None,
        batch_token: "int | None" = None,
    ) -> "dict[str, int]":
        """Single-view shim over _apply_store_batch (kept for direct
        callers/tests; the watch path groups map-twin views and calls
        the store form so a shared store merges exactly once)."""
        return self._apply_store_batch(
            [vdef], log, origin_starts, prepared, mapped, batch_token
        )

    def _apply_store_batch(
        self,
        vdefs: "list[ViewDefinition]",
        log: DataFrame,
        origin_starts: "dict[str, int]",
        prepared: "tuple[DataFrame, dict[str, int], dict[str, list[int]]]",
        mapped: "DataFrame | None" = None,
        batch_token: "int | None" = None,
    ) -> "dict[str, int]":
        """Watch-path merge for ONE ENTRIES STORE (every view in
        ``vdefs`` shares it — map-twins, r14 verdict #5) over a
        multi-origin micro-batch, paying each per-batch cost once
        instead of once per (origin, view): a single latest-wins
        window across all origins (partitioned by (origin, pathname),
        so one shuffle), the map UDF run ONCE and persisted, ONE
        entries merge for the whole group (the rows are
        byte-identical across members — merging per twin doubled the
        entry-write IO, and under a shared store concurrent per-view
        merges would race the snapshot version), one shared premerge
        retraction probe, and a re-aggregation per member view over
        the union of every origin's affected keys. Converges to the
        identical state as per-origin _apply_updates cycles — the
        entries shards and the reduced merges see the same rows, only
        batched. Returns {origin: n file updates applied}.

        ``prepared``: caller-owned (cached updates, per-origin counts,
        touched bucket ids) from engine._probe_batch + the shared
        compaction — watch builds it once per distinct glob per batch
        and unpersists it (there is deliberately NO build-it-yourself
        fallback: a second probe implementation here would drift from
        the live one).

        ``mapped``: caller-owned, already-materialized map output over
        ``prepared``'s updates — views sharing (path, map, key schema)
        pay the Python map stage ONCE per batch (watch groups them);
        the caller unpersists it.

        ``batch_token``: the stream's lineage-scoped batch token
        ('<query_id>:<batch_id>', see _token_applied). When set and
        the view's fold is exactly subtractable (count, or sum over
        declared-integer values — vdef.exact_delta_fold()),
        re-aggregation takes the exact DELTA path
        (_reaggregate_exact_delta) — committed BEFORE any entries
        pointer flips, with the token in the reduced manifest for
        exactly-once under replay. Without a token (direct calls)
        the general refold path runs after the merges, as before.
        """
        if not origin_starts:
            return {}
        updates, counts, buckets = prepared
        if not counts:
            return {}
        # merge LEAD: the store is shared by every member (watch groups
        # by _store_key), so ONE member drives the entries merge; the
        # map stage enforces the strictest declared-integer value_type
        # in the group (mirrors the shared-map cache contract)
        vdef = vdefs[0]
        for v in vdefs:
            if v.value_type in ("long", "int", "bigint"):
                vdef = v
                break
        owns_map = mapped is None
        new_entries = (
            run_map(
                updates.filter(F.col("type") == "put"),
                vdef.map,
                vdef.key_types(),
                value_type=vdef.value_type,
            ).cache()
            if owns_map
            else mapped
        )
        # Per-view re-aggregation routing. sum/avg require a SYNCED
        # sidecar: a reduced table materialized before the view
        # declared value_type (the pre-r13 upgrade), or a crash
        # between a refold's two table commits, leaves reduced/sidecar
        # state the delta arithmetic would silently diverge on (r13
        # ADVICE) — those batches take the general refold, which
        # realigns and re-stamps both. min/max take the bounded
        # value-histogram delta path (r14) under the same sync gate.
        def _delta_kind(v: ViewDefinition) -> "str | None":
            if batch_token is None:
                return None
            if v.exact_delta_fold() is not None and self._sidecar_synced(v):
                return "exact"
            if v.reduce in ("min", "max") and self._sidecar_synced(v):
                return "minmax"
            return None

        kinds = {v.name: _delta_kind(v) for v in vdefs}
        delta_applied: "dict[str, bool]" = {}
        try:
            # materialize the mapped batch ONCE up front so the
            # concurrent shard writes below all read the cache
            # instead of racing to compute the Python stage
            if owns_map:
                new_entries.count()

            # can this batch retract anything? absent shards cannot —
            # a driver-side manifest check, no Spark job (the backfill
            # / first-index fast path: skips the retraction side of
            # the delta AND the premerge probe entirely)
            no_old = all(
                not self._entries_table(vdef.name, o).exists()
                for o in counts
            )
            if any(kinds.values()):
                # REDUCED FIRST: the delta derives from the PRE-merge
                # shard state, so it must commit before any entries
                # pointer FLIPS — but the entries WRITE jobs (data
                # files into not-yet-published snapshot dirs) carry no
                # ordering constraint, so they run CONCURRENTLY with
                # the reduced commits and only their pointer flips wait
                # (r13 verdict #1: the serialized delta-then-merge
                # chain was the per-batch latency floor). Both sides
                # read the retraction state from plans pinned to the
                # PRE-merge snapshots, so the overlap cannot leak.
                # The premerge retraction probe is computed ONCE for
                # the whole group (shared store = shared retractions).
                from concurrent.futures import ThreadPoolExecutor

                retr = (
                    None
                    if no_old
                    else self._retracted_rows_premerge(
                        vdef, updates, counts, buckets
                    )
                )
                with ThreadPoolExecutor(max_workers=1) as wpool:
                    fut = wpool.submit(
                        self._write_entry_merges,
                        vdef,
                        updates,
                        new_entries,
                        counts,
                        buckets,
                    )
                    for v in vdefs:
                        if kinds[v.name] == "exact":
                            self._reaggregate_exact_delta(
                                v, new_entries, retr, batch_token
                            )
                            delta_applied[v.name] = True
                        elif kinds[v.name] == "minmax":
                            # False when some key's extreme fell past
                            # the histogram bound — nothing committed,
                            # the post-merge refold handles that view
                            delta_applied[v.name] = (
                                self._reaggregate_minmax_delta(
                                    v, new_entries, retr, batch_token
                                )
                            )
                    pairs = fut.result()
            else:
                pairs = self._write_entry_merges(
                    vdef, updates, new_entries, counts, buckets
                )
            # publish the entries snapshots (pointer flips — after the
            # reduced commits on the delta paths)
            for _retr, commit in pairs:
                commit()
            refold = [
                v
                for v in vdefs
                if v.reduce is not None and not delta_applied.get(v.name)
            ]
            if refold:
                retr = pairs[0][0]
                for p, _c in pairs[1:]:
                    retr = retr.union(p)
                keys = (
                    retr.select("key_json")
                    .union(new_entries.select("key_json"))
                    .distinct()
                    .cache()
                )
                for v in refold:
                    self._reaggregate(v, keys)
                keys.unpersist()
            return counts
        finally:
            if owns_map:
                new_entries.unpersist()

    def _write_entry_merges(
        self,
        vdef: ViewDefinition,
        updates: DataFrame,
        new_entries: DataFrame,
        counts: "dict[str, int]",
        buckets: "dict[str, list[int]]",
    ) -> "list[tuple[DataFrame, Callable[[], None]]]":
        """Run the entries-shard WRITE jobs for a multi-origin batch
        and return [(lazy retracted-rows, commit closure)] — callers
        run the commits (pointer flips) when their ordering
        constraints allow. Dispatch: multi-origin batches with every
        shard eligible take ONE write job for all shards
        (_merge_view_shards_onejob — the per-origin job fan-out was
        the dominant fixed per-batch cost); other multi-origin batches
        write per-origin concurrently (disjoint directories — wall
        clock is ~the slowest shard, not the sum); single-origin
        batches (the steady-drip common case) write inline."""

        def _write_shard(origin: str):
            return self._merge_entry_shard(
                vdef,
                origin,
                updates.filter(F.col("origin") == origin),
                new_entries.filter(F.col("origin") == origin),
                bucket_ids=buckets.get(origin),
                defer_commit=True,
            )

        if len(counts) > 1 and all(
            self._onejob_eligible(vdef.name, o) for o in counts
        ):
            return [
                self._merge_view_shards_onejob(
                    vdef, updates, new_entries, counts, buckets,
                    defer_commit=True,
                )
            ]
        if len(counts) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(len(counts), 8)) as pool:
                return list(pool.map(_write_shard, sorted(counts)))
        return [_write_shard(o) for o in sorted(counts)]

    def _retracted_rows_premerge(
        self,
        vdef: ViewDefinition,
        updates: DataFrame,
        counts: "dict[str, int]",
        buckets: "dict[str, list[int]]",
    ) -> DataFrame:
        """(key, key_json) rows about to be retracted by this batch,
        multiplicity preserved, read from the CURRENT (pre-merge)
        shard snapshots — the count-delta path's subtraction side.
        Touched buckets only on engine-layout shards; a shard with a
        divergent pinned bucket count (post-rebucket) or a flat
        legacy snapshot reads whole — rare, and correct either way
        (the semi join does the narrowing)."""
        affected_urls = updates.select("url")
        parts = []
        for o in sorted(counts):
            t = self._entries_table(vdef.name, o)
            if (
                t.exists()
                and t.current_is_bucketed()
                and t.n_buckets == self.entries_buckets
            ):
                parts.append(t.read_buckets(buckets[o]))
            else:
                parts.append(t.read())
        old = parts[0]
        for p in parts[1:]:
            old = old.unionByName(p)
        return old.join(
            F.broadcast(affected_urls),
            old["file_url"] == affected_urls["url"],
            "left_semi",
        ).select("key", "key_json", "value")

    @staticmethod
    def _token_applied(table: VersionedTable, batch_token) -> bool:
        """Has this table already committed the given batch token?
        Tokens are lineage-scoped strings '<query_id>:<batch_id>'
        (the query id persists in the stream's checkpoint metadata,
        so it survives restarts — a replay from the SAME checkpoint
        matches and skips — while an out-of-band checkpoint deletion
        mints a NEW query id, so the restarted stream's batch 0 can
        never collide with a stale stored token from the old lineage
        and silently drop a genuinely different batch, the r12
        ADVICE scenario). Legacy manifests hold the bare int batch
        id; treat a matching trailing id as applied (the one-restart
        upgrade window) rather than double-applying."""
        stored = table.manifest_meta().get("batch_token")
        if stored is None:
            return False
        if stored == batch_token:
            return True
        return (
            isinstance(stored, int)
            and isinstance(batch_token, str)
            and batch_token.rsplit(":", 1)[-1] == str(stored)
        )

    def _reaggregate_exact_delta(
        self,
        vdef: ViewDefinition,
        new_entries: DataFrame,
        retracted_rows: DataFrame,
        batch_token,
    ) -> None:
        """Watch-path re-aggregation for the exactly-subtractable
        folds WITHOUT the entries scan: for ``reduce='count'`` — and
        for ``reduce='sum'`` over declared-integer values
        (value_type 'long'/'int': integer sums are exactly
        subtractable by the same argument, count being sum-of-ones;
        double values are REFUSED to the refold path because FP
        addition is non-associative and subtract-then-add would
        drift from a true refold) — reduced'(k) =
        old(k) - retracted(k) + added(k), computed from the batch's
        own rows. _reaggregate's general path re-folds affected keys
        from a FULL entries_df scan — O(view entries) per
        micro-batch however small the delta. Here the only tables
        touched are the reduced table (and, for sum, its cnt
        sidecar), and those commits are BUCKET-SCOPED: the delta's
        keys bound the touched key_json buckets, untouched buckets
        hardlink, so the per-batch reduced rewrite is
        O(delta-buckets), flat in |reduced| (r12 verdict #1).
        Exactness: integer arithmetic (sum rides doubles but stays
        integer-valued, exact to 2^53 — where the refold itself
        degrades), so this converges to bit-identical state with the
        full re-fold — pinned by the stream=batch equality tests,
        whose batch twin still takes the general path.
        Delete-on-empty: count filters cnt>0 directly; sum deletes
        when the sidecar's live entry count reaches 0 (a key whose
        remaining entries sum to 0 must STAY, so the sum itself
        cannot be the signal — lib/view.js:139-143).

        EXACTLY-ONCE under replay (the reason this path is safe at
        all): a delta, unlike a refold, must apply exactly once per
        logical batch. Two mechanisms compose: (1) ORDER — the caller
        commits this BEFORE any entries pointer flips, so the
        retraction side always reads the true pre-batch state; a
        crash before this flip replays cleanly from scratch, and a
        crash after it leaves the entries merges to their own
        idempotent retract-then-add replay. (2) TOKEN — the
        lineage-scoped batch token ('<query_id>:<batch_id>', see
        _token_applied) commits atomically with each table's pointer
        (manifest meta); a replay of an already-applied batch sees
        its own token and skips, never double-applying. For sum the
        reduced table commits FIRST, then the sidecar: a crash
        between the two flips replays with reduced skipping on its
        token while the sidecar — whose update derives only from its
        OWN pre-batch rows plus the recomputed delta — applies,
        re-aligning both. A checkpoint deleted out-of-band degrades
        gracefully twice over: the new lineage's tokens can't match
        stale ones (no silent skip), and the full changelog
        re-delivers so retractions equal additions per key, delta=0.

        Interleaved BATCH indexing composes safely too: the batch
        path's general refold commits WITHOUT a token (erasing this
        path's marker) and realigns reduced + sidecar with the
        entries' current state — so a later stream replay's delta is
        computed against that same state (entries already reflecting
        a batch make its retractions equal its additions: delta 0).
        Every ordering converges.

        ``retracted_rows=None`` means the caller PROVED the batch
        retracts nothing (no entries shard exists — the backfill /
        first-index case): the subtraction side and its shuffle stage
        are skipped entirely. Job budget (r13 verdict #1 — at
        micro-batch grain the per-batch job count IS the latency):
        one probe collecting the touched bucket ids of BOTH tables
        (skipped when nothing is materialized yet), then ONE write
        job committing reduced and sidecar together
        (_write_merged_pair) — r13 spent two id probes and two write
        jobs here, which with the bucketed-reduced layout regressed
        the per-batch maintain constant 2.4x."""
        fold = vdef.exact_delta_fold()
        red_table = self._reduced_table(vdef.name)
        cnt_table = (
            self._reduced_cnt_table(vdef.name) if fold in ("sum", "avg") else None
        )
        red_done = self._token_applied(red_table, batch_token)
        cnt_done = cnt_table is None or self._token_applied(cnt_table, batch_token)
        if red_done and cnt_done:
            return  # replay of a fully-applied batch
        if fold in ("sum", "avg"):
            # EXACT integer deltas of the sufficient statistics
            # (count, integer value sum) — pure BIGINT arithmetic
            # end-to-end; the folded double is derived only at format
            # time, so it cannot drift from the refold's (exact)
            # double sums over the same integers
            val_l = F.col("value").cast("long")
            add = new_entries.groupBy("key", "key_json").agg(
                F.count(F.lit(1)).cast("long").alias("dc"),
                F.sum(val_l).cast("long").alias("dsl"),
            )
            if retracted_rows is None:
                delta = add.filter(
                    (F.col("dc") != 0) | (F.col("dsl") != 0)
                )
            else:
                sub = retracted_rows.groupBy("key", "key_json").agg(
                    (-F.count(F.lit(1))).cast("long").alias("dc"),
                    (-F.sum(val_l)).cast("long").alias("dsl"),
                )
                delta = (
                    add.unionByName(sub)
                    .groupBy("key", "key_json")
                    .agg(
                        F.sum("dc").cast("long").alias("dc"),
                        F.sum("dsl").cast("long").alias("dsl"),
                    )
                    .filter((F.col("dc") != 0) | (F.col("dsl") != 0))
                )
        else:
            add = new_entries.groupBy("key", "key_json").agg(
                F.count(F.lit(1)).cast("long").alias("dc")
            )
            if retracted_rows is None:
                delta = add.filter(F.col("dc") != 0)
            else:
                sub = retracted_rows.groupBy("key", "key_json").agg(
                    (-F.count(F.lit(1))).cast("long").alias("dc")
                )
                delta = (
                    add.unionByName(sub)
                    .groupBy("key", "key_json")
                    .agg(F.sum("dc").cast("long").alias("dc"))
                    .filter(F.col("dc") != 0)
                )
        # NOTE (r15): a driver-side micro-batch fast path here (the
        # _minmax_delta_driver pattern) was implemented, equivalence-
        # tested and MEASURED AT PARITY (2.35 vs 2.30 s/drip-batch,
        # 15 jobs either way), then reverted: unlike the ~10-join
        # minmax plan it replaced there, this path is already one
        # probe + one write (r13 job-budget work), and the driver
        # variant's own collects cost the same three small job waves.
        delta = delta.cache()
        try:
            delta_keys = delta.select("key_json")
            tables = [red_table] + ([cnt_table] if cnt_table is not None else [])
            idlists = self._touched_bucket_ids_multi(tables, delta_keys)
            # a probed-empty id set means the delta itself is empty:
            # replaying it is a no-op anyway
            if any(kind == "probed" and not ids for kind, ids in idlists):
                return
            ids = idlists[0][1]
            cids = idlists[1][1] if cnt_table is not None else None
            meta = {"batch_token": batch_token}
            if fold in ("sum", "avg"):
                old = red_table.read_buckets(ids)
                # post-batch integer state of every delta key: the
                # sidecar's OWN current rows (pre-batch — when
                # !red_done the sidecar cannot be ahead, see commit
                # order; when red_done, the crash-window replay
                # recomputes against the sidecar's still-pre-batch
                # rows) plus the delta. The reduced VALUE and the
                # sidecar row both derive from this one frame.
                cold = cnt_table.read_buckets(cids)
                old_cnt = cold.join(
                    F.broadcast(delta_keys), "key_json", "left_semi"
                )
                state = (
                    delta.join(F.broadcast(old_cnt), "key_json", "left")
                    .select(
                        "key",
                        "key_json",
                        (
                            F.coalesce(F.col("cnt"), F.lit(0))
                            + F.col("dc")
                        ).alias("cnt"),
                        (
                            F.coalesce(F.col("ssum"), F.lit(0))
                            + F.col("dsl")
                        ).alias("ssum"),
                    )
                    .filter(F.col("cnt") > 0)  # delete-on-empty
                )
                fmt = (
                    F.col("ssum").cast("double")
                    if fold == "sum"
                    else F.col("ssum").cast("double") / F.col("cnt")
                ).cast("string")
                # untouched rows of touched buckets carry; every delta
                # key's row is REPLACED by (or deleted from) the
                # derived state
                red_df = old.join(
                    F.broadcast(delta_keys), "key_json", "left_anti"
                ).unionByName(
                    state.select("key", "key_json", fmt.alias("value"))
                )
                cnt_df = cold.join(
                    F.broadcast(delta_keys), "key_json", "left_anti"
                ).unionByName(state.select("key_json", "cnt", "ssum"))
                if not red_done and not cnt_done:
                    # the common case: BOTH tables commit from ONE
                    # Spark write job — reduced's pointer flips first,
                    # then the sidecar's (the crash-window order the
                    # replay logic above assumes)
                    self._write_merged_pair(
                        red_table, ids, red_df, meta,
                        cnt_table, cids, cnt_df, meta,
                        sort_cols=["key_json"],
                    )
                elif not red_done:
                    red_table.write_merged(
                        ids, red_df, sort_cols=["key_json"], meta=meta
                    )
                else:  # crash window: only the sidecar is pending
                    cnt_table.write_merged(
                        cids, cnt_df, sort_cols=["key_json"], meta=meta
                    )
            elif not red_done:
                old = red_table.read_buckets(ids)
                # batch-sized delta broadcasts; full-outer would
                # refuse a broadcast side, so: updated-existing ∪
                # brand-new keys
                updated = (
                    old.join(
                        F.broadcast(delta.select("key_json", "dc")),
                        "key_json",
                        "left",
                    )
                    .select(
                        "key",
                        "key_json",
                        (
                            F.col("value").cast("long")
                            + F.coalesce(F.col("dc"), F.lit(0))
                        ).alias("cnt"),
                    )
                    .filter(F.col("cnt") > 0)
                    .select(
                        "key",
                        "key_json",
                        F.col("cnt").cast("string").alias("value"),
                    )
                )
                fresh = (
                    delta.join(old.select("key_json"), "key_json", "left_anti")
                    .filter(F.col("dc") > 0)
                    .select(
                        "key",
                        "key_json",
                        F.col("dc").cast("string").alias("value"),
                    )
                )
                red_table.write_merged(
                    ids,
                    updated.unionByName(fresh),
                    sort_cols=["key_json"],
                    meta=meta,
                )
        finally:
            delta.unpersist()

    def _minmax_hist_parts(
        self, vdef: ViewDefinition, live: DataFrame
    ) -> "tuple[DataFrame, DataFrame, DataFrame]":
        """Rank a (key_json, v_txt, cnt) frame of LIVE value counts
        into the bounded-histogram shape: returns (ranked frame with
        the rn column, kept hist rows, overflow hist rows). Ordering
        is (double value, text) in the fold's direction, so the rank
        is total and deterministic; the overflow row's horizon hz is
        the FIRST evicted value — by construction every evicted value
        sits at or beyond it and every kept one strictly inside.

        NON-NUMERIC values (texts whose double cast is NULL — string
        emits, 'null' from emit(k, None), …) are excluded here, NOT
        ranked: dv.asc() is NULLS FIRST in Spark, so on a min view a
        single non-castable entry would rank 1 and the delta path
        would record a NULL extreme — diverging from the refold's
        F.min, which SKIPS nulls (r14 ADVICE, medium). The histogram
        tracks numeric values only; the fold's skip-null semantics
        make non-numeric entries irrelevant to the extreme, and the
        delta path filters them out of its routing symmetrically
        (asc_nulls_last as belt-and-braces for any caller that skips
        the filter)."""
        from pyspark.sql.window import Window

        asc = vdef.reduce == "min"
        # try_cast: ANSI mode makes a plain cast THROW on non-numeric
        # text; try-cast's NULL is exactly the skip-null semantics
        dv = F.col("v_txt").try_cast("double")
        live = live.filter(dv.isNotNull())
        order = [dv.asc_nulls_last(), F.col("v_txt").asc()] if asc else [
            dv.desc(), F.col("v_txt").desc()
        ]
        w = Window.partitionBy("key_json").orderBy(*order)
        ranked = live.withColumn("rn", F.row_number().over(w))
        bound = self.minmax_hist_bound
        keep = ranked.filter(F.col("rn") <= bound).select(
            "key_json",
            "v_txt",
            "cnt",
            F.lit(None).cast("string").alias("hz"),
        )
        pair = F.struct(dv.alias("d"), F.col("v_txt").alias("t"))
        hz_agg = (F.min(pair) if asc else F.max(pair)).getField("t")
        ev = (
            ranked.filter(F.col("rn") > bound)
            .groupBy("key_json")
            .agg(
                F.sum("cnt").cast("long").alias("evc"),
                hz_agg.alias("ev_hz"),
            )
        )
        return ranked, keep, ev

    # strict decimal-literal texts: within this domain Python's float()
    # and Spark's double cast are both correctly-rounded, so ordering
    # and horizon comparisons agree bit-for-bit. Anything else
    # (Infinity/NaN spellings, whitespace, suffixes) routes to the
    # vectorized path rather than risking a parser mismatch.
    _MINMAX_NUM_RE = _re.compile(
        r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
    )
    # delta rows above this take the vectorized path; the collect
    # stays micro-batch-bounded, the same class as the <=4096-row
    # codebook fetches. Note a "row" here is one already-aggregated
    # (key, value) pair, so even a large backfill over few distinct
    # values qualifies.
    _DELTA_DRIVER_LIMIT = 1024

    @staticmethod
    def _driver_bucket_ids(table, keys: "list[str]") -> "list[int]":
        # mirrors _touched_bucket_ids_multi's kinds without the probe
        # job: bucket_of == the in-plan bucket expr (pinned by test)
        if not table.exists() or not table.current_is_bucketed():
            return list(range(table.n_buckets))
        return sorted({table.bucket_of(k) for k in keys})

    def _minmax_delta_driver(
        self,
        vdef: ViewDefinition,
        red_table,
        hist_table,
        delta: DataFrame,
        red_done: bool,
        hist_done: bool,
        batch_token,
    ) -> "bool | None":
        """Driver-side replica of the min/max histogram delta for
        MICRO-BATCH-sized deltas (r15). The decision state — the
        delta itself plus the touched keys' kept/overflow histogram
        rows — is bounded by |delta| * (minmax_hist_bound + 1) rows,
        so it collects in a handful of small jobs, the
        route/rank/evict/flag logic runs in plain Python, and the
        fused pair commit's plan is scan + literal-IN filter + union
        of a local relation: ~6 Spark jobs per batch where the
        vectorized form paid ~57 micro-jobs plus a multi-second
        planning gap. Returns None when not eligible (big delta, or
        any value text outside the strict-decimal domain where the
        Python/Spark double parses provably agree — the vectorized
        path then runs as before), True when applied, False when some
        key needs the general refold (nothing committed, same
        contract). The reduced VALUE text is still formatted IN-PLAN
        (try_cast(double) -> cast(string)), never by Python, so the
        committed bytes are bit-identical to the vectorized path's.
        Exactly-once is unchanged: same batch-token metadata, same
        reduced-then-histogram commit order, same crash-window
        single-table writes."""
        rows = delta.limit(self._DELTA_DRIVER_LIMIT + 1).collect()
        if len(rows) > self._DELTA_DRIVER_LIMIT:
            return None
        if not rows:
            return True  # empty delta: replaying it is a no-op
        num = self._MINMAX_NUM_RE.match
        if any(num(r["v_txt"]) is None for r in rows):
            return None
        keys = sorted({r["key_json"] for r in rows})
        ids = self._driver_bucket_ids(red_table, keys)
        hids = self._driver_bucket_ids(hist_table, keys)
        kcol = F.col("key_json")
        old_red = red_table.read_buckets(ids)
        old_hist = hist_table.read_buckets(hids)
        red_rows = old_red.filter(kcol.isin(keys)).collect()
        hist_rows = old_hist.filter(kcol.isin(keys)).collect()
        for r in hist_rows:
            if r["v_txt"] is not None and num(r["v_txt"]) is None:
                return None
            if r["v_txt"] is None and r["hz"] is not None and num(r["hz"]) is None:
                return None

        asc = vdef.reduce == "min"
        bound = self.minmax_hist_bound
        kept_old: "dict[str, dict[str, int]]" = {}
        ov_old: "dict[str, tuple[int, str | None]]" = {}
        for r in hist_rows:
            if r["v_txt"] is not None:
                kept_old.setdefault(r["key_json"], {})[r["v_txt"]] = r["cnt"]
            else:
                ov_old[r["key_json"]] = (r["cnt"], r["hz"])

        def srt(v: str):
            return (float(v), v)

        tracked: "dict[str, dict[str, int]]" = {}
        unt: "dict[str, int]" = {}
        for r in rows:
            k, v, dc = r["key_json"], r["v_txt"], r["dc"]
            hz = ov_old.get(k, (0, None))[1]
            if hz is None:
                inside = True
            else:
                d, hzd = float(v), float(hz)
                inside = (
                    d < hzd or (d == hzd and v < hz)
                    if asc
                    else d > hzd or (d == hzd and v > hz)
                )
            if inside:
                tracked.setdefault(k, {})[v] = dc
            else:
                unt[k] = unt.get(k, 0) + dc

        new_hist: "list[tuple]" = []
        new_red: "dict[str, str]" = {}
        for k in keys:
            ko = kept_old.get(k, {})
            tr = tracked.get(k, {})
            cand: "dict[str, int]" = {}
            for v, oc in ko.items():
                cand[v] = oc + tr.get(v, 0)
            for v, dc in tr.items():
                if v not in ko:
                    if dc < 0:
                        return False  # retraction of an untracked-inside value
                    cand[v] = dc
            if any(c < 0 for c in cand.values()):
                return False
            live = sorted(
                (v for v, c in cand.items() if c > 0),
                key=srt,
                reverse=not asc,
            )
            keep, evict = live[:bound], live[bound:]
            ovc0, hz0 = ov_old.get(k, (0, None))
            ovc = ovc0 + sum(cand[v] for v in evict) + unt.get(k, 0)
            hz = evict[0] if evict else hz0
            if ovc < 0:
                return False
            if ovc > 0 and not keep:
                return False  # kept set drained past the bound: refold
            for v in keep:
                new_hist.append((k, v, cand[v], None))
            if ovc > 0:
                new_hist.append((k, None, ovc, hz))
            if keep:
                new_red[k] = keep[0]

        key_by_json = {r["key_json"]: r["key"] for r in red_rows}
        for r in rows:
            key_by_json.setdefault(r["key_json"], r["key"])
        from pyspark.sql import types as T

        hist_local = self.spark.createDataFrame(new_hist, hist_table.schema)
        key_type = red_table.schema["key"].dataType
        red_local = self.spark.createDataFrame(
            [(key_by_json[k], k, v) for k, v in new_red.items()],
            T.StructType(
                [
                    T.StructField("key", key_type, True),
                    T.StructField("key_json", T.StringType(), False),
                    T.StructField("v_txt", T.StringType(), False),
                ]
            ),
        ).select(
            "key",
            "key_json",
            # the refold's own format, evaluated in-plan
            F.col("v_txt").try_cast("double").cast("string").alias("value"),
        )
        red_df = old_red.filter(~kcol.isin(keys)).unionByName(red_local)
        hist_df = old_hist.filter(~kcol.isin(keys)).unionByName(hist_local)
        meta = {"batch_token": batch_token}
        if not red_done and not hist_done:
            self._write_merged_pair(
                red_table, ids, red_df, meta,
                hist_table, hids, hist_df, meta,
                sort_cols=["key_json"],
            )
        elif not red_done:
            red_table.write_merged(
                ids, red_df, sort_cols=["key_json"], meta=meta
            )
        else:
            hist_table.write_merged(
                hids, hist_df, sort_cols=["key_json"], meta=meta
            )
        return True

    def _reaggregate_minmax_delta(
        self,
        vdef: ViewDefinition,
        new_entries: DataFrame,
        retracted_rows: "DataFrame | None",
        batch_token,
    ) -> bool:
        """Watch-path re-aggregation for ``reduce='min'/'max'`` by
        EXACT delta against the bounded value-histogram sidecar
        (_reduced_hist_table) — r13 verdict #7, replacing the r13
        monotone-append-only fast path (which this subsumes: an
        append-only batch is a pure-adds delta) AND the r13 refold
        fallback on every retracting batch. Per batch: net per-(key,
        value-text) counts from the batch's own rows route to the
        kept set or the overflow count by the horizon comparison;
        the merged kept candidates re-rank (a window over <= bound +
        batch-values rows per key); evictions move count mass to the
        overflow and tighten the horizon; the new extreme is the
        rank-1 kept value — entries are NEVER rescanned. Returns True
        when applied; False when ANY key needs the general refold —
        a kept set drained into a non-empty overflow (the min/max
        truly is beyond the bound), or an inconsistent retraction —
        in which case NOTHING commits and the caller routes the whole
        batch's re-aggregation to the post-merge refold (which
        rebuilds both tables and re-stamps the sync marker). The
        refold-needed probe job is skipped for append-only batches
        (adds cannot drain a kept set or retract anything).

        Exactly-once mirrors the sum/avg path: reduced commits first,
        then the histogram, both from ONE fused write with the
        lineage-scoped batch token; a crash between the flips replays
        with reduced skipping on its token while the histogram —
        derived only from its OWN pre-batch rows plus the recomputed
        delta — applies, realigning both. Exactness: counts are
        BIGINTs, the extreme is MIN/MAX over doubles (no arithmetic
        to drift), and the value format is the refold's own
        cast(min(double) as string) — pinned bit-identical by the
        stream=batch tests."""
        red_table = self._reduced_table(vdef.name)
        hist_table = self._reduced_hist_table(vdef.name)
        red_done = self._token_applied(red_table, batch_token)
        hist_done = self._token_applied(hist_table, batch_token)
        if red_done and hist_done:
            return True
        asc = vdef.reduce == "min"
        grp = ["key", "key_json", "value"]
        add = new_entries.groupBy(*grp).agg(
            F.count(F.lit(1)).cast("long").alias("dc")
        )
        if retracted_rows is None:
            delta = add
        else:
            sub = retracted_rows.groupBy(*grp).agg(
                (-F.count(F.lit(1))).cast("long").alias("dc")
            )
            delta = (
                add.unionByName(sub)
                .groupBy(*grp)
                .agg(F.sum("dc").cast("long").alias("dc"))
                .filter(F.col("dc") != 0)
            )
        # the histogram tracks NUMERIC values only (F.min/F.max skip
        # nulls — _minmax_hist_parts): drop non-castable delta values
        # BEFORE routing, so they land in neither tracked nor overflow
        # (the horizon predicate below is NULL for a NULL double cast,
        # which would silently drop the row from BOTH sides and corrupt
        # delete-on-empty accounting — r14 ADVICE) and never rank
        delta = delta.withColumnRenamed("value", "v_txt").filter(
            F.col("v_txt").try_cast("double").isNotNull()
        )
        # micro-batch fast path (r15): the routing/ranking state is
        # bounded by |delta keys| * (hist bound + 1) rows, so for a
        # small delta the whole decision runs driver-side and the
        # commit plan collapses to scan+filter+union — the Spark form
        # below builds a ~10-join/broadcast plan whose planning and
        # ~50 micro-job waves dominated the per-batch wall (measured
        # 57 jobs, none over 0.1 s, per 8-row drip batch)
        fast = self._minmax_delta_driver(
            vdef, red_table, hist_table, delta, red_done, hist_done,
            batch_token,
        )
        if fast is not None:
            return fast
        delta = delta.cache()
        try:
            delta_keys = delta.select("key_json").distinct()
            (rk, ids), (_hk, hids) = self._touched_bucket_ids_multi(
                [red_table, hist_table], delta_keys
            )
            if rk == "probed" and not ids:
                return True  # empty delta: replaying it is a no-op
            old_red = red_table.read_buckets(ids)
            old_hist = hist_table.read_buckets(hids)
            oh = old_hist.join(F.broadcast(delta_keys), "key_json", "left_semi")
            kept_old = oh.filter(F.col("v_txt").isNotNull()).select(
                "key_json", "v_txt", F.col("cnt").alias("oc")
            )
            ov_old = oh.filter(F.col("v_txt").isNull()).select(
                "key_json", F.col("cnt").alias("ovc"), "hz"
            )
            # horizon routing: a delta value strictly inside the
            # horizon belongs to the kept set; at/beyond it, to the
            # overflow count (exact by the hist invariant)
            dv = F.col("v_txt").try_cast("double")
            hzd = F.col("hz").cast("double")
            if asc:
                inside = (
                    F.col("hz").isNull()
                    | (dv < hzd)
                    | ((dv == hzd) & (F.col("v_txt") < F.col("hz")))
                )
            else:
                inside = (
                    F.col("hz").isNull()
                    | (dv > hzd)
                    | ((dv == hzd) & (F.col("v_txt") > F.col("hz")))
                )
            dj = delta.join(
                F.broadcast(ov_old.select("key_json", "hz")), "key_json", "left"
            )
            tracked = dj.filter(inside).select("key_json", "v_txt", "dc")
            unt = (
                dj.filter(~inside)
                .groupBy("key_json")
                .agg(F.sum("dc").cast("long").alias("ov_dc"))
            )
            cand = kept_old.join(
                tracked, ["key_json", "v_txt"], "full_outer"
            ).select(
                "key_json",
                "v_txt",
                (
                    F.coalesce(F.col("oc"), F.lit(0))
                    + F.coalesce(F.col("dc"), F.lit(0))
                ).alias("cnt"),
                # retracting a value the kept set never tracked while
                # it sits inside the horizon = inconsistent state
                (
                    F.col("oc").isNull() & (F.coalesce(F.col("dc"), F.lit(0)) < 0)
                ).alias("bad"),
            ).cache()
            live = cand.filter(~F.col("bad") & (F.col("cnt") > 0))
            # CACHED: the join+window pipeline is the batch's heavy
            # plan, and it feeds the refold probe AND the commit write
            # — without the cache each job recomputes it (measured
            # ~2x the per-batch wall on retracting drips)
            ranked, _keep0, _ev0 = self._minmax_hist_parts(vdef, live)
            ranked = ranked.cache()
            dv_r = F.col("v_txt").try_cast("double")
            keep = ranked.filter(
                F.col("rn") <= self.minmax_hist_bound
            ).select(
                "key_json", "v_txt", "cnt",
                F.lit(None).cast("string").alias("hz"),
            )
            pair_r = F.struct(dv_r.alias("d"), F.col("v_txt").alias("t"))
            ev = (
                ranked.filter(F.col("rn") > self.minmax_hist_bound)
                .groupBy("key_json")
                .agg(
                    F.sum("cnt").cast("long").alias("evc"),
                    (F.min(pair_r) if asc else F.max(pair_r))
                    .getField("t")
                    .alias("ev_hz"),
                )
            )
            ovf = (
                delta_keys.join(ov_old, "key_json", "left")
                .join(ev, "key_json", "left")
                .join(unt, "key_json", "left")
                .select(
                    "key_json",
                    (
                        F.coalesce(F.col("ovc"), F.lit(0))
                        + F.coalesce(F.col("evc"), F.lit(0))
                        + F.coalesce(F.col("ov_dc"), F.lit(0))
                    ).alias("ovc"),
                    # an eviction horizon is always tighter than the
                    # old one (evicted candidates were inside it)
                    F.coalesce(F.col("ev_hz"), F.col("hz")).alias("hz"),
                )
            ).cache()
            # refold-needed flags (adds alone cannot trip them):
            # negative counts, untracked-inside retractions, or a key
            # whose kept set drained into a non-empty overflow. NOT
            # probed as its own job: the flagged keys ride the staged
            # pair write as _t=2 marker rows (r14 verdict #3), so the
            # flag answer is a driver-side isdir on the temp dir —
            # ZERO extra job waves for retracting batches.
            keep_keys = keep.select("key_json").distinct()
            needs_refold = (
                cand.filter(F.col("bad") | (F.col("cnt") < 0))
                .select("key_json")
                .unionByName(
                    ovf.filter(F.col("ovc") < 0).select("key_json")
                )
                .unionByName(
                    ovf.filter(F.col("ovc") > 0)
                    .join(keep_keys, "key_json", "left_anti")
                    .select("key_json")
                )
            )
            # outputs: hist = carried untouched keys + kept + overflow
            hist_df = (
                old_hist.join(F.broadcast(delta_keys), "key_json", "left_anti")
                .unionByName(keep)
                .unionByName(
                    ovf.filter(F.col("ovc") > 0).select(
                        "key_json",
                        F.lit(None).cast("string").alias("v_txt"),
                        F.col("ovc").alias("cnt"),
                        "hz",
                    )
                )
            )
            # the new extreme per surviving key = rank-1 kept value,
            # formatted exactly like the refold (cast(extreme double))
            newv = ranked.filter(F.col("rn") == 1).select(
                "key_json", dv.cast("string").alias("nv")
            )
            red_upd = (
                old_red.join(F.broadcast(delta_keys), "key_json", "left_semi")
                .join(newv, "key_json", "inner")  # drops deleted keys
                .select("key", "key_json", F.col("nv").alias("value"))
            )
            key_structs = delta.select("key", "key_json").distinct()
            red_fresh = (
                newv.join(old_red.select("key_json"), "key_json", "left_anti")
                .join(key_structs, "key_json")
                .select("key", "key_json", F.col("nv").alias("value"))
            )
            red_df = (
                old_red.join(F.broadcast(delta_keys), "key_json", "left_anti")
                .unionByName(red_upd)
                .unionByName(red_fresh)
            )
            meta = {"batch_token": batch_token}
            if not red_done and not hist_done:
                # optimistic staged write with the refold-needed keys
                # riding along as _t=2 marker rows; a flagged key
                # cancels the staged write (temp dir dropped, no
                # table touched). Append-only batches skip the marker
                # (adds cannot trip any flag).
                probe = (
                    needs_refold.select("key_json")
                    if retracted_rows is not None
                    else None
                )
                staged = self._write_merged_pair(
                    red_table, ids, red_df, meta,
                    hist_table, hids, hist_df, meta,
                    sort_cols=["key_json"],
                    defer_commit=True,
                    probe_df=probe,
                )
                if probe is not None:
                    commit, cancel, probe_hit = staged
                else:
                    commit, cancel = staged
                    probe_hit = False
                try:
                    if probe_hit:
                        cancel()
                        return False
                    commit()
                    return True
                except BaseException:
                    # an abandoned staged write leaks its data-sized
                    # temp dir permanently (r14 ADVICE) — drop it on
                    # the exception path (idempotent after commit's
                    # own cleanup)
                    cancel()
                    raise
            # crash-window singles (rare): probe first, then write
            if retracted_rows is not None and not needs_refold.isEmpty():
                return False
            if not red_done:
                red_table.write_merged(
                    ids, red_df, sort_cols=["key_json"], meta=meta
                )
            else:
                hist_table.write_merged(
                    hids, hist_df, sort_cols=["key_json"], meta=meta
                )
            return True
        finally:
            try:
                cand.unpersist()
                ranked.unpersist()
                ovf.unpersist()
            except (NameError, UnboundLocalError):
                pass
            delta.unpersist()

    def _touched_bucket_ids_multi(
        self,
        tables: "list[BucketedEntriesTable]",
        keys_df: DataFrame,
        probe_absent: bool = False,
    ) -> "list[tuple[str, list[int]]]":
        """Touched ('kind', bucket ids) for several key_json-bucketed
        tables, sharing ONE probe job across all of them (r13 spent
        one collect per table). Kinds: 'absent' — no snapshot on disk,
        every id without a probe (there is nothing to read or hardlink
        behind them, so exact ids buy nothing; pass probe_absent=True
        for callers that use probed-empty as an empty-input early
        out); 'flat' — legacy un-bucketed layout, every id (one full
        re-bucketing rewrite, incremental afterwards); 'probed' — the
        keys' ids from one shared distinct-collect. When every table
        skips the probe (the first-batch fast path) NO Spark job runs."""
        plan: "list[int]" = []
        out: "list[tuple[str, list[int]] | None]" = [None] * len(tables)
        for i, t in enumerate(tables):
            if not t.exists():
                if probe_absent:
                    plan.append(i)
                else:
                    out[i] = ("absent", list(range(t.n_buckets)))
            elif not t.current_is_bucketed():
                out[i] = ("flat", list(range(t.n_buckets)))
            else:
                plan.append(i)
        if plan:
            rows = (
                keys_df.select(
                    *[
                        tables[i].bucket_expr("key_json").alias(f"b{i}")
                        for i in plan
                    ]
                )
                .distinct()
                .collect()
            )
            for i in plan:
                out[i] = ("probed", sorted({r[f"b{i}"] for r in rows}))
        return out

    def _has_data_files(self, table: VersionedTable) -> bool:
        """Does the table's current snapshot hold any data files?
        Driver-side walk of one snapshot directory, no Spark job —
        the 'is anything materialized' check (zero-partition empty
        snapshots, e.g. a reset, write no part files)."""
        import os as _os

        v = table._current()
        if v is None:
            return False
        for _dirpath, _dirs, files in _os.walk(table._snapshot_dir(v)):
            if any(
                f.endswith(".parquet") and not f.startswith(("_", "."))
                for f in files
            ):
                return True
        return False

    def _sidecar_synced(self, vdef: ViewDefinition) -> bool:
        """Is the (cnt, ssum) sidecar aligned with the reduced table —
        i.e. may the sum/avg exact-delta path trust it? Alignment is a
        shared commit marker: the delta path stamps both tables with
        the same batch token; the general refold stamps both with the
        same fresh 'sync' id. A mismatch means the sidecar does NOT
        reflect the reduced table's state (r13 ADVICE): a reduced
        table materialized BEFORE the view declared value_type — the
        sidecar does not exist, and the first delta batch would read
        an empty one and silently overwrite touched keys with the
        bare delta; a crash between a pre-r14 refold's two separate
        commits — a stale sidecar that would skew every later delta
        forever; or a pre-r14 refold manifest with no markers at all —
        unverifiable. Every mismatch routes that batch to the general
        refold, which realigns BOTH tables from entries (bootstrapping
        the FULL sidecar, not just the touched keys) and re-stamps the
        shared marker — one O(view) recovery/upgrade pass, after which
        the delta path resumes. Driver-side manifest reads only; the
        same contract covers min/max views' value-histogram sidecar
        (_reduced_hist_table); count views have no sidecar and are
        always synced."""
        if vdef.exact_delta_fold() in ("sum", "avg"):
            side = self._reduced_cnt_table(vdef.name)
        elif vdef.reduce in ("min", "max"):
            side = self._reduced_hist_table(vdef.name)
        else:
            return True
        red = self._reduced_table(vdef.name)
        if not self._has_data_files(red):
            return True  # nothing materialized: the first commit bootstraps both
        if not side.exists():
            return False
        rm, cm = red.manifest_meta(), side.manifest_meta()
        rsync = rm.get("batch_token", rm.get("sync"))
        csync = cm.get("batch_token", cm.get("sync"))
        return rsync is not None and rsync == csync

    def _write_merged_pair(
        self,
        a_table: BucketedEntriesTable,
        a_ids: "list[int]",
        a_df: DataFrame,
        a_meta: "dict | None",
        b_table: BucketedEntriesTable,
        b_ids: "list[int]",
        b_df: DataFrame,
        b_meta: "dict | None",
        sort_cols: "list[str] | None" = None,
        defer_commit: bool = False,
        probe_df: "DataFrame | None" = None,
    ):
        """Commit TWO bucketed tables from ONE Spark write job (r13
        verdict #1): the reduced table and its (cnt, ssum) sidecar
        fold over the same touched aggregate, and committing them as
        two write_merged calls doubled the per-batch job count — at
        micro-batch grain the job fan-out IS the latency. Both tables'
        post-merge touched-bucket contents are written together to a
        temp dir partitioned by (table idx, bucket id), then committed
        driver-side per table IN CALLER ORDER: move the written bucket
        dirs into each table's new snapshot, hardlink untouched
        buckets, flip pointers — a's pointer first, then b's, so the
        crash window between the two flips is the same one the delta
        path's token replay (and, failing that, the sync-marker refold
        fallback) recovers. Schemas may differ: each side's frame is
        padded with the other's missing columns as typed NULLs
        (parquet nulls are metadata-cheap, and every read pins its own
        table schema, so the padding is never projected).

        ``defer_commit=True`` runs the Spark write NOW and returns
        (commit, cancel) closures: commit performs both tables'
        driver-side commits; cancel discards the staged write (temp
        dir removed, no table touched).

        ``probe_df``: an optional MARKER frame whose rows ride the
        same write job under partition _t=2 (never committed to
        either table; dropped with the temp dir). Its non-emptiness
        is answered for free by the write itself — partitionBy only
        materializes non-empty partitions, so ``_t=2`` exists on disk
        iff the frame had rows — and returned as a third element
        ``probe_hit`` (r14 verdict #3: the min/max delta path's
        refold-needed flag was a separate ~0.8 s isEmpty() job wave
        per retracting batch AFTER the staged write; as marker rows
        it costs one extra empty-or-tiny partition in the job that
        runs anyway, and the answer is a driver-side isdir)."""
        import os as _os
        import shutil as _shutil
        import tempfile as _tf

        from dat_archive_map_reduce_spark.plans.catalog import _link_tree

        def _pad(df: DataFrame, other: BucketedEntriesTable, tag: int, bexpr):
            cols = [F.col(c) for c in df.columns]
            have = set(df.columns)
            for fld in other.schema.fields:
                if fld.name not in have:
                    cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
            return (
                df.select(*cols)
                .withColumn("_t", F.lit(tag))
                .withColumn("_b", bexpr)
            )

        w = _pad(a_df, b_table, 0, a_table.bucket_expr()).unionByName(
            _pad(b_df, a_table, 1, b_table.bucket_expr())
        )
        if probe_df is not None:
            have = set(probe_df.columns)
            pcols = [
                (
                    F.col(f.name)
                    if f.name in have
                    else F.lit(None).cast(f.dataType).alias(f.name)
                )
                for f in w.schema.fields
                if f.name not in ("_t", "_b")
            ]
            w = w.unionByName(
                probe_df.select(*pcols)
                .withColumn("_t", F.lit(2))
                .withColumn("_b", F.lit(0))
            )
        # AQE-sized like write_merged: a drip batch coalesces to ~1
        # write task, a backfill keeps full parallelism
        w = w.repartition("_t", "_b")
        if sort_cols:
            w = w.sortWithinPartitions("_t", "_b", *sort_cols)
        tmp = _tf.mkdtemp(prefix="_merge-pair-", dir=self.warehouse)
        try:
            w.write.mode("overwrite").partitionBy("_t", "_b").parquet(tmp)
        except BaseException:
            _shutil.rmtree(tmp, ignore_errors=True)
            raise
        probe_hit = _os.path.isdir(f"{tmp}/_t=2")

        def _commit() -> None:
            try:
                for idx, (t, ids, meta) in enumerate(
                    ((a_table, a_ids, a_meta), (b_table, b_ids, b_meta))
                ):
                    cur = t._current()
                    n = t.n_buckets
                    v = (cur or 0) + 1
                    dest = t._snapshot_dir(v)
                    if _os.path.isdir(dest):
                        # crash-orphaned dir at this version: clear it,
                        # the overwrite-clears-dest convention of every
                        # writer
                        _shutil.rmtree(dest, ignore_errors=True)
                    _os.makedirs(dest, exist_ok=True)
                    src_root = f"{tmp}/_t={idx}"
                    if _os.path.isdir(src_root):
                        for bd in _os.listdir(src_root):
                            if bd.startswith("_b="):
                                _os.rename(f"{src_root}/{bd}", f"{dest}/{bd}")
                    if cur is not None and t.current_is_bucketed():
                        touched = set(ids)
                        for b in range(n):
                            if b in touched:
                                continue
                            src = t._bucket_dir(cur, b)
                            if _os.path.isdir(src):
                                _link_tree(src, t._bucket_dir(v, b))
                    t._write_snapshot_meta(dest, n)
                    t._set_current(v, meta)
            finally:
                _shutil.rmtree(tmp, ignore_errors=True)

        def _cancel() -> None:
            _shutil.rmtree(tmp, ignore_errors=True)

        if defer_commit:
            if probe_df is not None:
                return _commit, _cancel, probe_hit
            return _commit, _cancel
        _commit()
        return None

    def _touched_bucket_ids(
        self, table: BucketedEntriesTable, keys_df: DataFrame
    ) -> "list[int]":
        """Touched bucket ids of a key_json-bucketed table for the
        given keys — or ALL ids when the current snapshot is flat
        (legacy/reset layout: one full re-bucketing rewrite, every
        later merge incremental)."""
        if table.exists() and not table.current_is_bucketed():
            return list(range(table.n_buckets))
        return sorted(
            r["b"]
            for r in keys_df.select(table.bucket_expr("key_json").alias("b"))
            .distinct()
            .collect()
        )

    def _reaggregate(self, vdef: ViewDefinition, affected_keys: DataFrame) -> None:
        """Re-fold only affected keys, merge into the reduced table.

        reduced' = (reduced  ⟕anti affected) ∪ fold(entries ⟕semi affected)
        — the Parquet copy-on-write equivalent of MERGE, committed
        BUCKET-SCOPED: the rewrite touches only the affected keys'
        key_json buckets and hardlinks the rest, so the reduced
        commit is O(delta-buckets * |reduced|/N), not O(|reduced|)
        (the last O(view)-per-batch step in the r12 maintenance
        cycle). Keys whose entry set became empty simply vanish
        (delete-on-empty, lib/view.js:139-143).

        The refold commits WITHOUT a batch token (write_merged's
        meta=None replaces the manifest), which is load-bearing for
        the exact-delta interleave story: a batch-path refold erases
        the stream's marker AND realigns reduced (and, for sum
        views, the cnt sidecar) with the entries' current state, so
        a later stream replay's delta computes against that same
        state. For sum/avg views the reduced table and the sidecar
        commit from ONE Spark write job, stamped with a shared
        fresh 'sync' marker (r13 ADVICE: two sequential commits left
        a crash window whose stale sidecar would silently skew every
        later delta — now a marker mismatch routes the next stream
        batch back here, and the BOOTSTRAP arm below rebuilds the
        whole sidecar from entries, covering both that window and a
        reduced table materialized before the view declared
        value_type)."""
        red_table = self._reduced_table(vdef.name)
        if vdef.exact_delta_fold() in ("sum", "avg"):
            cnt_table = self._reduced_cnt_table(vdef.name)
            synced = self._sidecar_synced(vdef)
            (rk, ids), (_ck, cnt_ids) = self._touched_bucket_ids_multi(
                [red_table, cnt_table], affected_keys, probe_absent=True
            )
            if rk == "probed" and not ids:
                return  # empty affected set: nothing to refold or delete
            import uuid as _uuid

            sync = {"sync": _uuid.uuid4().hex}
            old = red_table.read_buckets(ids)
            entries = self.entries_df(vdef.name)
            touched = entries.join(
                F.broadcast(affected_keys), "key_json", "left_semi"
            )
            kept = old.join(F.broadcast(affected_keys), "key_json", "left_anti")
            # ONE entries pass serves both the refold and the sidecar
            # realignment (folded value + exact integer sufficient
            # statistics in the same agg; the sidecar must follow
            # every refold or a later stream delta would apply against
            # stale counts/sums). The fold expression mirrors
            # _reduce_builtin exactly.
            fold_expr = (
                F.sum(F.col("value").cast("double"))
                if vdef.reduce == "sum"
                else F.avg(F.col("value").cast("double"))
            )
            stats = [
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum(F.col("value").cast("long")).cast("long").alias("ssum"),
            ]
            both = (
                touched.groupBy("key", "key_json")
                .agg(fold_expr.cast("string").alias("value"), *stats)
                .cache()
            )
            try:
                red_df = kept.unionByName(
                    both.select("key", "key_json", "value")
                )
                if synced:
                    # incremental: untouched sidecar rows carry
                    cnt_df = (
                        cnt_table.read_buckets(cnt_ids)
                        .join(F.broadcast(affected_keys), "key_json", "left_anti")
                        .unionByName(both.select("key_json", "cnt", "ssum"))
                    )
                else:
                    # BOOTSTRAP: the sidecar is absent, stale, or
                    # unverifiable — rebuild it for EVERY key from the
                    # same entries scan (touched keys from `both`,
                    # the rest aggregated fresh), so the next stream
                    # delta applies against true counts everywhere,
                    # not only the keys this batch touched
                    cnt_ids = list(range(cnt_table.n_buckets))
                    rest = (
                        entries.join(
                            F.broadcast(affected_keys), "key_json", "left_anti"
                        )
                        .groupBy("key_json")
                        .agg(*stats)
                    )
                    cnt_df = rest.unionByName(
                        both.select("key_json", "cnt", "ssum")
                    )
                self._write_merged_pair(
                    red_table, ids, red_df, sync,
                    cnt_table, cnt_ids, cnt_df, sync,
                    sort_cols=["key_json"],
                )
            finally:
                both.unpersist()
            return
        if vdef.reduce in ("min", "max"):
            # min/max refold maintains the value-histogram sidecar the
            # same way the sum/avg refold maintains (cnt, ssum): both
            # tables rebuild from ONE touched-entries pass and commit
            # fused with a shared sync marker. An unsynced sidecar
            # (pre-r14 warehouse, refold crash window, or a delta
            # batch that hit the bound on SOME key) bootstraps the
            # FULL histogram from entries.
            hist_table = self._reduced_hist_table(vdef.name)
            synced = self._sidecar_synced(vdef)
            (rk, ids), (_hk, hist_ids) = self._touched_bucket_ids_multi(
                [red_table, hist_table], affected_keys, probe_absent=True
            )
            if rk == "probed" and not ids:
                return  # empty affected set: nothing to refold or delete
            import uuid as _uuid

            sync = {"sync": _uuid.uuid4().hex}
            old = red_table.read_buckets(ids)
            entries = self.entries_df(vdef.name)
            touched = entries.join(
                F.broadcast(affected_keys), "key_json", "left_semi"
            )
            kept = old.join(F.broadcast(affected_keys), "key_json", "left_anti")
            # a key with NO numeric values folds to NULL (F.min/F.max
            # skip nulls, then the agg over an all-null group IS null)
            # — drop it: a NULL reduced value crashes get() at
            # json.loads(None), and the histogram delta path (which
            # tracks numeric values only) deletes such keys, so the
            # refold must agree or stream=batch diverges (r14 ADVICE)
            refolded = reduce_entries(
                touched, vdef.reduce, vdef.key_types()
            ).filter(F.col("value").isNotNull())
            red_df = kept.unionByName(refolded)

            def _hist_rows(ents: DataFrame) -> DataFrame:
                live = ents.groupBy("key_json", F.col("value").alias("v_txt")).agg(
                    F.count(F.lit(1)).cast("long").alias("cnt")
                )
                _ranked, keep_rows, ev = self._minmax_hist_parts(vdef, live)
                ov_rows = ev.select(
                    "key_json",
                    F.lit(None).cast("string").alias("v_txt"),
                    F.col("evc").alias("cnt"),
                    F.col("ev_hz").alias("hz"),
                )
                return keep_rows.unionByName(ov_rows)

            if synced:
                hist_df = (
                    hist_table.read_buckets(hist_ids)
                    .join(F.broadcast(affected_keys), "key_json", "left_anti")
                    .unionByName(_hist_rows(touched))
                )
            else:
                hist_ids = list(range(hist_table.n_buckets))
                hist_df = _hist_rows(entries)
            self._write_merged_pair(
                red_table, ids, red_df, sync,
                hist_table, hist_ids, hist_df, sync,
                sort_cols=["key_json"],
            )
            return
        ids = self._touched_bucket_ids(red_table, affected_keys)
        if not ids:
            return  # empty affected set: nothing to refold or delete
        old = red_table.read_buckets(ids)
        entries = self.entries_df(vdef.name)
        touched = entries.join(F.broadcast(affected_keys), "key_json", "left_semi")
        kept = old.join(F.broadcast(affected_keys), "key_json", "left_anti")
        refolded = reduce_entries(touched, vdef.reduce, vdef.key_types())
        red_table.write_merged(
            ids, kept.unionByName(refolded), sort_cols=["key_json"]
        )

    # -- single-file ops (reference indexFile/unindexFile) ----------
    def index_file(self, origin: str, pathname: str, content: str, version: int | None = None) -> None:
        """Ad-hoc index of one file without checkpoint bookkeeping
        (reference index.js:153-163)."""
        v = version if version is not None else self.current_version(origin) + 1
        row = changelog_from_rows(
            self.spark,
            [{"origin": origin, "pathname": pathname, "version": v, "type": "put", "content": content}],
        )
        self._indexed_origins.add(origin)
        for vdefs in self._views_by_store():
            upd = glob_filter(row, vdefs[0].path)
            self._apply_updates_group(vdefs, origin, upd)

    def unindex_file(self, origin: str, pathname: str) -> None:
        """Retract one file everywhere (the reference *intends* this;
        its string-URL arm is the known index.js:170 bug — we implement
        the intended semantics, SURVEY.md §2.1 #14)."""
        row = changelog_from_rows(
            self.spark,
            [{"origin": origin, "pathname": pathname, "version": self.current_version(origin) + 1, "type": "del", "content": None}],
        )
        for vdefs in self._views_by_store():
            upd = glob_filter(row, vdefs[0].path)
            self._apply_updates_group(vdefs, origin, upd)

    def _views_by_store(self) -> "list[list[ViewDefinition]]":
        """Defined views grouped by entries store (map-twins together,
        r14 verdict #5) — the iteration unit for every operation that
        must touch each STORE exactly once."""
        by_store: "dict[str, list[ViewDefinition]]" = {}
        for _name, vdef in self.views.items():
            by_store.setdefault(self._store_key(vdef), []).append(vdef)
        return list(by_store.values())

    # -- source removal (fixing the reference's broken unindex) -----
    def unindex(self, origin: str) -> None:
        """Remove a source: drop its entry shards, re-aggregate the
        keys it contributed, drop its offsets
        (intended semantics of lib/indexer.js:190-204)."""
        # group views by entries STORE: a shared store's shard resets
        # ONCE, and every member view re-aggregates the same gone keys
        # (resetting per view would find the shard already empty for
        # the second twin and silently skip its re-aggregation)
        for vdefs in self._views_by_store():
            lead = vdefs[0]
            ent_table = self._entries_table(lead.name, origin)
            gone_keys = ent_table.read().select("key_json").distinct()
            gone_keys = gone_keys.cache()
            ent_table.reset()
            # drop the origin's pointer row BEFORE re-aggregating —
            # the refold's entries_df must no longer see this shard
            self._entries_ptr_table(lead.name).delete_rows([origin])
            for vdef in vdefs:
                if vdef.reduce is not None:
                    self._reaggregate(vdef, gone_keys)
            gone_keys.unpersist()
        self.offsets.overwrite_rows(
            [r for r in self.offsets.read_rows() if r[1] != origin]
        )
        self._indexed_origins.discard(origin)

    # -- continuous maintenance / lifecycle -------------------------
    def watch_views(
        self,
        trigger: dict | None = None,
        on_batch=None,
        vacuum_every: int | None = None,
        vacuum_keep: int = 2,
        changelog_expire_every: int | None = None,
        rebucket_every: int | None = None,
        rebucket_bytes: int = 64 << 20,
    ):
        """Start (once) the continuous view-maintenance stream over the
        changelog (reference watch mode, lib/indexer.js:67-87). Returns
        the active StreamingQuery. Idempotent: a second call returns
        the already-running stream. ``vacuum_every``/``vacuum_keep``
        opt into periodic snapshot-history trimming (see
        streaming.watch.watch)."""
        if rebucket_every is not None and int(rebucket_bytes) < 1:
            # fail at stream setup, not on the Nth batch inside
            # foreachBatch (auto_rebucket_entries raises the same)
            raise ValueError(f"rebucket_bytes must be >= 1, got {rebucket_bytes}")
        for q in self._active_streams:
            if q.isActive:
                return q
        from dat_archive_map_reduce_spark.streaming.watch import watch as _watch

        return _watch(
            self,
            trigger=trigger or {"processingTime": "500 milliseconds"},
            on_batch=on_batch,
            vacuum_every=vacuum_every,
            vacuum_keep=vacuum_keep,
            changelog_expire_every=changelog_expire_every,
            rebucket_every=rebucket_every,
            rebucket_bytes=rebucket_bytes,
        )

    def vacuum(self, keep_last: int = 2) -> "dict[str, list[int]]":
        """Trim snapshot history across the whole warehouse: every
        view's entry shards, every reduced table, and the offsets
        table keep their newest ``keep_last`` versions (never the
        current one). Returns {table root: versions removed}.

        Operationally load-bearing for watch mode: every micro-batch
        merge is a copy-on-write snapshot, so a continuous stream
        grows history without bound — at 100 TB a day of 500 ms
        batches is ~170k snapshot generations per table. The watch
        path calls this every ``vacuum_every`` batches; the
        ``keep_last`` floor preserves the crash-safety property (the
        previous snapshot survives a mid-write failure) and bounded
        time travel, which is the same retention trade-off a
        lakehouse VACUUM makes."""
        out: "dict[str, list[int]]" = {}
        tables: list[VersionedTable] = [self.offsets]
        for name, vdef in self.views.items():
            tables.append(self._entries_ptr_table(name))
            tables.append(self._reduced_table(name))
            if vdef.exact_delta_fold() in ("sum", "avg"):
                tables.append(self._reduced_cnt_table(name))
            if vdef.reduce in ("min", "max"):
                tables.append(self._reduced_hist_table(name))
            for origin in self._known_origins():
                tables.append(self._entries_table(name, origin))
        for t in tables:
            removed = t.vacuum(keep_last=keep_last)
            if removed:
                out[t.root] = removed
        return out

    def changelog_floors(self) -> "dict[str, int]":
        """Per-origin expiry floor: the min last_version across ALL
        defined views (0 — nothing expirable — when any view has not
        yet indexed the origin, so a late-defined view keeps full
        replay until it catches up). Rows at or below the floor have
        been applied by every view."""
        per_origin: "dict[str, dict[str, int]]" = {}
        for v, o, lv in self.offsets.read_rows():
            per_origin.setdefault(o, {})[v] = lv
        return {
            o: (
                min(m[v] for v in self.views)
                if set(self.views) and set(self.views) <= set(m)
                else 0
            )
            for o, m in per_origin.items()
        }

    def expire_changelog(self) -> "dict[str, dict[str, int]]":
        """Changelog retention (log compaction): for every origin whose
        expiry floor > 0, rewrite its partition keeping

            rows with version > floor   (not yet seen by every view)
          ∪ the latest-wins winner per pathname at or below the floor

        — the Kafka-compaction shape. The winners keep their ORIGINAL
        version numbers, so the rewrite is semantically invisible:
        existing views filter version > start and never re-read them;
        a view defined LATER indexes from 0 and reconstructs each
        file's current state from the winners (batch index() applies
        latest_wins over the full range anyway, so compacted and full
        history produce identical entries — pinned by test). Dat's
        history is append-only by design, but the changelog is OUR
        storage: a year of watch mode must not mean a year of raw CDC
        on disk; this mirrors what vacuum() does for snapshots.

        Refuses to run under an active watch stream (the file source
        could have listed a file this is about to delete, and THIS
        engine cannot know the stream's read options); use
        ``watch_views(changelog_expire_every=N)`` for the in-stream
        cadence — safe there because the watch stream reads with
        ignoreMissingFiles and the deleted files' surviving rows are
        re-delivered via the compacted copies. Requires the
        origin-partitioned log layout (a legacy flat warehouse cannot
        file-swap per origin).

        Returns {origin: {files_removed, files_added, rows_expired}}.
        """
        for q in self._active_streams:
            if q.isActive:
                raise RuntimeError(
                    "expire_changelog under an active watch stream is "
                    "unsafe (in-flight file listings); stop the stream "
                    "or use watch_views(changelog_expire_every=...)"
                )
        return self._expire_changelog_unsafe()

    def _expire_changelog_unsafe(self) -> "dict[str, dict[str, int]]":
        if not self.changelog.partition_by:
            raise RuntimeError(
                "changelog expiry needs the origin-partitioned log "
                "layout; this warehouse predates partitioning (flat "
                "files) — rebuild it to enable retention"
            )
        out: "dict[str, dict[str, int]]" = {}
        for origin, floor in sorted(self.changelog_floors().items()):
            if floor <= 0:
                continue
            # fresh read() per origin: the file index pins at DataFrame
            # creation, and the previous iteration's swap just changed
            # the directory under it
            part = self.changelog.read_origin(origin)
            winners = latest_wins(part.filter(F.col("version") <= floor))
            kept = part.filter(F.col("version") > floor).unionByName(winners)
            # one count pair per expired origin (maintenance cadence,
            # not the hot path): how many raw CDC rows compacted away
            n_before = part.count()
            n_kept = kept.count()
            if n_kept == n_before:
                continue  # nothing to reclaim; skip the rewrite
            stats = self.changelog.swap_origin_files(origin, kept)
            stats["rows_expired"] = n_before - n_kept
            out[origin] = stats
        return out

    def rebucket_entries(
        self,
        new_n: int,
        views: "Sequence[str] | None" = None,
        origins: "Sequence[str] | None" = None,
    ) -> "dict[str, int]":
        """Migrate entries shards to a ``new_n``-bucket layout
        (BucketedEntriesTable.rebucket): the maintenance op for a hot
        origin whose shard has outgrown its bucket count — per-bucket
        size is shard/N, so without this, merge IO on a growing
        origin creeps back toward O(shard). One full copy-on-write
        rewrite per shard (crash leaves the old layout current);
        merges afterwards are incremental against the new layout, and
        bucket ids are recomputed per-shard automatically when a
        shard's pinned N differs from the engine default. Returns
        {shard root: new version}. Use
        ``_entries_table(view, origin).bucket_stats()`` to pick
        candidates."""
        out: "dict[str, int]" = {}
        for name in views if views is not None else list(self.views):
            for origin in origins if origins is not None else sorted(
                self._known_origins()
            ):
                t = self._entries_table(name, origin)
                if t.exists():
                    out[t.root] = t.rebucket(
                        new_n, sort_cols=["key_json", "file_url", "emit_seq"]
                    )
                    self._record_entry_ptrs(name, [origin])
        return out

    def auto_rebucket_entries(
        self,
        threshold_bytes: int,
        views: "Sequence[str] | None" = None,
        origins: "Sequence[str] | None" = None,
    ) -> "dict[str, tuple[int, int]]":
        """Threshold-gated bucket-count evolution across entries
        shards: for each shard whose MEAN bucket size (bytes / N, the
        merge-IO unit) exceeds ``threshold_bytes``, migrate to the
        doubled power-of-two multiple that brings the mean back under
        — the ``compact(auto_rebucket_bytes=...)`` policy without the
        full-OPTIMIZE rewrite of under-threshold shards. The probe is
        a driver-side os.walk per shard, so a firing where nothing
        crossed the threshold costs no Spark job at all — cheap
        enough for the watch cadence (``watch_views(rebucket_every=
        N)``), which is what makes a months-long stream on a hot
        origin keep its merges delta-proportional WITHOUT an operator
        ever stopping it to run compact()/rebucket_entries() by hand.
        Returns {shard root: (old_n, new_n)} for migrated shards."""
        if int(threshold_bytes) < 1:
            # a non-positive threshold makes the doubling loop below
            # non-terminating on any non-empty shard (total/new_n
            # never reaches <= 0); compact() guards its equivalent
            # loop with a truthiness check — this path, reachable
            # from the watch cadence, must refuse loudly instead
            raise ValueError(f"threshold_bytes must be >= 1, got {threshold_bytes}")
        out: "dict[str, tuple[int, int]]" = {}

        def _probe(t: BucketedEntriesTable, sort_cols: "list[str]") -> None:
            if not t.exists():
                return
            total = sum(t.bucket_stats().values())
            n = t.n_buckets
            new_n = n
            while total / new_n > threshold_bytes:
                new_n *= 2
            if new_n != n:
                t.rebucket(new_n, sort_cols=sort_cols)
                out[t.root] = (n, new_n)

        for name in views if views is not None else list(self.views):
            for origin in origins if origins is not None else sorted(
                self._known_origins()
            ):
                t = self._entries_table(name, origin)
                _probe(t, ["key_json", "file_url", "emit_seq"])
                if t.root in out:  # migrated: a pointer flip happened
                    self._record_entry_ptrs(name, [origin])
            # the reduced table (and a sum view's cnt sidecar) are
            # key_json-bucketed too — a high-cardinality view's
            # reduced side outgrows its bucket count exactly like a
            # hot origin's entries shard, and the same threshold
            # keeps its per-batch merge IO delta-proportional
            vdef = self.views.get(name)
            if vdef is not None and vdef.reduce is not None:
                _probe(self._reduced_table(name), ["key_json"])
                if vdef.exact_delta_fold() in ("sum", "avg"):
                    _probe(self._reduced_cnt_table(name), ["key_json"])
                if vdef.reduce in ("min", "max"):
                    _probe(self._reduced_hist_table(name), ["key_json"])
        return out

    def close(self) -> None:
        """Stop every active watch stream and mark the engine closed
        (reference close(), index.js:62-77: detaches watchers and closes
        the level DB; data stays on disk, a new MapReduce on the same
        warehouse reopens it). Idempotent."""
        for q in self._active_streams:
            try:
                if q.isActive:
                    q.stop()
            except Exception:
                pass
        self._active_streams.clear()
        self._closed = True

    def destroy(self) -> None:
        """close() then delete the warehouse — all views, changelog,
        offsets, and stream checkpoints (reference destroy(),
        index.js:79-94: destroys the DB and wipes storage)."""
        import shutil

        self.close()
        shutil.rmtree(self.warehouse, ignore_errors=True)
        self.views.clear()
        self._indexed_origins.clear()
        self._missing_origins.clear()

    def list_indexed(self) -> list[str]:
        return sorted(self._known_origins())

    def is_indexed(self, origin: str) -> bool:
        return origin in self._known_origins()

    # -- reset (reference index.js:111-115) -------------------------
    def reset(self, view: str) -> None:
        vdef = self.views.get(view)
        sid = self._store_key(vdef) if vdef is not None else None
        others = (
            self._store_members(sid) - {view} if sid is not None else set()
        )
        if vdef is not None and not others:
            # sole owner (private store, or a shared store no other
            # view references): wipe the entries, current behavior
            for origin in self._known_origins():
                self._entries_table(view, origin).reset()
            # empty pointer table = entries_df resolves no shards (the
            # reset shards' fresh empty snapshots need not be read)
            self._entries_ptr_table(view).overwrite_rows([])
        # else: the store is SHARED with live views — entries stay (a
        # map-twin's rows are byte-identical to what this view's
        # replay would rebuild; the retract-then-add merge makes the
        # replay converge on the shared store without duplication),
        # and only this view's derived state resets below
        self._reduced_table(view).reset()
        if view in self.views and self.views[view].exact_delta_fold() in (
            "sum", "avg",
        ):
            self._reduced_cnt_table(view).reset()
        if view in self.views and self.views[view].reduce in ("min", "max"):
            self._reduced_hist_table(view).reset()
        self.offsets.overwrite_rows(
            [r for r in self.offsets.read_rows() if r[0] != view]
        )
        self._emit("view-reset", view=view)

    # -- queries ----------------------------------------------------
    def get(self, view: str, key: Any) -> dict | None:
        """Point lookup (reference index.js:117-120, lib/view.js:51-61).

        Reduced view -> {key, value: folded}; mapped view ->
        {key, value: [all values]} in deterministic (file_url,
        emit_seq) order; missing key -> None.
        """
        vdef = self._view(view)
        comps = normalize_key(key)
        kj = _canon_key_json(comps if len(comps) > 1 else comps[0])
        if vdef.reduce is not None:
            red = self._reduced_table(view)
            # the reduced table is bucketed ON key_json, so a point
            # lookup reads exactly one bucket (read_buckets falls back
            # to the whole snapshot on a flat legacy layout); within
            # the bucket, the key_json sort makes parquet row-group
            # min/max stats prune the scan further
            row = (
                red.read_buckets([red.bucket_of(kj)])
                .filter(F.col("key_json") == kj)
                .first()
            )
            if row is None:
                return None
            return {"key": key, "value": json.loads(row["value"])}
        rows = (
            self.entries_df(view)
            .filter(F.col("key_json") == kj)
            .orderBy("file_url", "emit_seq")
            .select("value")
            .collect()
        )
        if not rows:
            return None
        return {"key": key, "value": [json.loads(r["value"]) for r in rows]}

    def get_many(self, view: str, keys: "Sequence[Any]") -> "dict":
        """Batched point lookup: {key: value} for every key found
        (missing keys absent), semantics per-key identical to get().
        The serving win over a get() loop is structural, not just
        batching: on a reduced view the probe reads ONLY the union of
        the requested keys' buckets (k keys touch <= k of N bucket
        directories — at 100 TB, a 50-key batch reads ~50/N of the
        view instead of launching 50 jobs over it), with one isin
        filter the parquet scan pushes into row-group stats; on a
        mapped view, one pushed isin scan replaces k separate jobs.
        Result keys are the CALLER's key objects (compound list keys
        come back as tuples — dict keys must hash). Distinct caller
        keys that canonicalize to the same key_json (e.g. "a" and
        ["a"], or 1 and 1.0) EACH map to the shared value (r13 ADVICE:
        keeping only the last such key silently dropped the others)."""
        vdef = self._view(view)
        kj_of: "dict[str, list]" = {}
        for k in keys:
            comps = normalize_key(k)
            kj = _canon_key_json(comps if len(comps) > 1 else comps[0])
            ck = tuple(k) if isinstance(k, list) else k
            callers = kj_of.setdefault(kj, [])
            if ck not in callers:
                callers.append(ck)
        if not kj_of:
            return {}
        kjs = sorted(kj_of)
        if vdef.reduce is not None:
            red = self._reduced_table(view)
            rows = (
                red.read_buckets(sorted({red.bucket_of(j) for j in kjs}))
                .filter(F.col("key_json").isin(kjs))
                .select("key_json", "value")
                .collect()
            )
            return {
                ck: json.loads(r["value"])
                for r in rows
                for ck in kj_of[r["key_json"]]
            }
        rows = (
            self.entries_df(view)
            .filter(F.col("key_json").isin(kjs))
            .select("key_json", "file_url", "emit_seq", "value")
            .collect()
        )
        out: "dict" = {}
        for r in sorted(rows, key=lambda r: (r["key_json"], r["file_url"], r["emit_seq"])):
            v = json.loads(r["value"])
            for ck in kj_of[r["key_json"]]:
                out.setdefault(ck, []).append(v)
        return out

    def list_df(
        self,
        view: str,
        gt: Any = None,
        gte: Any = None,
        lt: Any = None,
        lte: Any = None,
        reverse: bool = False,
        limit: int | None = None,
        text_order: bool = False,
    ) -> DataFrame:
        """Range scan as a DataFrame (reference list(), index.js:122-125;
        bounds semantics lib/util-level.js:76-84). Typed tuple
        comparison on the key struct; mapped views are already
        flattened (one row per entry — lib/view.js:76-82's flatten is
        the natural Spark layout).

        ``text_order=True`` is the reference-fidelity mode: order and
        bound by the canonical JSON text of the key — byte-for-byte the
        reference's LevelDB ``JSON.stringify(key)`` ordering, where
        numbers inside compound keys sort lexicographically
        ("100" < "2"). Default stays typed ordering (the documented
        deviation, SURVEY.md §1.2); use this when porting range queries
        that depend on the reference's exact ordering quirk.
        """
        vdef = self._view(view)
        key_types = vdef.key_types()
        df = self.reduced_df(view) if vdef.reduce is not None else self.entries_df(view)
        if text_order:
            import operator as _op

            for bound, fn in ((gt, _op.gt), (gte, _op.ge), (lt, _op.lt), (lte, _op.le)):
                if bound is None:
                    continue
                comps = normalize_key(bound)
                bj = _canon_key_json(comps if len(comps) > 1 else comps[0])
                df = df.filter(fn(F.col("key_json"), F.lit(bj)))
            order_cols = [F.col("key_json")]
        else:
            pred = range_predicate("key", key_types, gt=gt, gte=gte, lt=lt, lte=lte)
            if pred is not None:
                df = df.filter(pred)
            order_cols = [F.col(f"key.k{i}") for i in range(len(key_types))]
        if vdef.reduce is None:
            order_cols += [F.col("file_url"), F.col("emit_seq")]
        if reverse:
            order_cols = [c.desc() for c in order_cols]
        df = df.orderBy(*order_cols)
        if limit is not None:
            df = df.limit(limit)
        return df

    def list(self, view: str, **opts: Any) -> list[dict]:
        """Collected form of list_df: [{key, value}, ...]."""
        vdef = self._view(view)
        n = len(vdef.key_types())
        rows = self.list_df(view, **opts).collect()
        out = []
        for r in rows:
            comps = tuple(r["key"][f"k{i}"] for i in range(n))
            key = comps[0] if n == 1 else list(comps)
            out.append({"key": key, "value": json.loads(r["value"])})
        return out
