"""Watch mode: continuous incremental view maintenance via Structured
Streaming.

The reference's watch path (/root/reference/lib/indexer.js:67-87):
subscribe to file-activity events filtered by the union of all view
globs, debounce 500 ms, then re-run the incremental index cycle.

Spark-first translation:

- file-activity stream  -> ``spark.readStream`` over the engine's
  append-only changelog directory (new parquet files = new events)
- debounce              -> micro-batch trigger (processingTime) —
  a burst of changes lands in one batch, exactly the amortization the
  debounce buys the reference
- re-index cycle        -> ``foreachBatch`` running the SAME
  retract-then-add merge the batch path uses (engine._apply_updates),
  so watch mode converges to the identical state as a cold re-index
  (the reference's test/view.js:187-231 equivalence contract)
- exactly-once          -> streaming checkpointLocation + the engine's
  per-(view, origin) offsets; replayed batches are no-ops because
  updates at or below the stored offset are filtered out.

Event-time operators (windowed aggregations over the `events` table)
live here too: tumbling / sliding / session windows with watermarks.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dat_archive_map_reduce_spark.operators.map_reduce import run_map
from dat_archive_map_reduce_spark.sources.files import (
    FILES_SCHEMA,
    glob_filter,
    latest_wins,
)


def watch(
    engine,
    trigger: dict | None = None,
    on_batch: Callable[[int, int], None] | None = None,
    vacuum_every: int | None = None,
    vacuum_keep: int = 2,
    changelog_expire_every: int | None = None,
    rebucket_every: int | None = None,
    rebucket_bytes: int = 64 << 20,
):
    """Start continuous maintenance of all defined views.

    Returns the StreamingQuery; call ``.stop()`` to unwatch (the
    reference's unwatchArchive, lib/indexer.js:94-100). ``trigger``
    defaults to availableNow (drain-and-stop, used by tests); pass
    ``{"processingTime": "500 milliseconds"}`` for the reference's
    debounce cadence.

    ``vacuum_every``: every N processed batches, trim warehouse
    snapshot history to ``vacuum_keep`` versions per table
    (engine.vacuum) — without retention a continuous stream's
    copy-on-write merges grow history without bound, so long-running
    production watches should set this. Default None keeps every
    snapshot (full time travel, and no risk of deleting a snapshot
    directory out from under a concurrent long-running read — opt in
    with a keep_last sized to the longest concurrent reader).

    ``changelog_expire_every``: every N processed batches, compact
    the changelog itself (engine._expire_changelog_unsafe — rows at
    or below every view's offset collapse to one latest-wins winner
    per file). Safe here for TWO reasons: it runs at the batch
    boundary after the batch's merges committed, and the stream reads
    with ignoreMissingFiles — under the 64-file trigger cap the
    source can be holding a listed-but-undelivered backlog whose
    files the expiry deletes (their surviving rows ride the new
    compacted files, which the source picks up next listing), so a
    batch-boundary alone is NOT a no-listing-in-flight guarantee.
    The compacted copies are new files the stream will re-deliver
    once; re-applying them is a retract-then-add no-op (idempotent
    merge), so pick a cadence that amortizes that one wasted
    re-merge — hundreds of batches, not every few.

    ``rebucket_every``/``rebucket_bytes``: every N processed batches,
    run engine.auto_rebucket_entries(rebucket_bytes) — entries shards
    whose mean bucket size outgrew the threshold migrate to a doubled
    bucket count, keeping merge IO delta-proportional as hot origins
    grow, WITHOUT stopping the stream. Safe at the batch boundary:
    the migration is a copy-on-write snapshot flip on a table the
    stream itself never reads (the stream reads the changelog), and
    it is serialized with the merges because both run inside
    foreachBatch. A firing where nothing crossed the threshold is a
    driver-side os.walk — no Spark job — so a tens-of-batches cadence
    is fine (unlike changelog expiry's hundreds).
    """
    spark = engine.spark
    # The changelog is an AppendOnlyLog: ONE stable directory for the
    # warehouse's lifetime, so the stream keeps seeing appends no
    # matter what happens to other tables. (Streaming a VersionedTable
    # snapshot dir would go silently stale after any overwrite.)
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        # the engine is the changelog's only writer, and its two
        # retention ops (in-stream expiry below, rebucket-free
        # compaction) DELETE files whose surviving content they
        # rewrote as new files the source will pick up; with the
        # 64-file trigger cap the source can hold a listed-but-
        # undelivered backlog across batches, so a mid-backlog
        # expiry would otherwise kill the stream with
        # FileNotFoundException on a file whose rows are already
        # re-delivered elsewhere
        .option("ignoreMissingFiles", "true")
        .parquet(engine.changelog.root)
        # normalize to exactly the changelog schema: under the
        # two-level layout (hash_levels=1) Spark appends the
        # discovered origin_hash partition column, which would leak
        # into every downstream union/UDF column contract
        .select(*[f.name for f in FILES_SCHEMA.fields])
    )
    # local counter, not batch_id: checkpointed batch ids keep rising
    # across restarts, which would skew the vacuum cadence
    batch_counter = [0]

    lineage: list = []

    def _batch_token(batch_id: int) -> str:
        """Lineage-scoped exactly-once token '<query_id>:<batch_id>'
        for the exact-delta re-aggregation (engine._token_applied).
        The query id lives in the checkpoint's own metadata file, so
        it IS the checkpoint lineage: a restart from the same
        checkpoint reuses it (replays match stored tokens and skip),
        while an out-of-band checkpoint deletion mints a new id —
        the restarted stream's batch ids restart at 0 but can never
        collide with a stale stored token and silently drop a
        genuinely new batch (r12 ADVICE)."""
        if not lineage:
            import json as _json

            try:
                with open(f"{engine.warehouse}/_stream_checkpoint/metadata") as fh:
                    lineage.append(_json.load(fh)["id"])
            except (OSError, KeyError, ValueError):
                # metadata unreadable: fall back to an unscoped marker
                # (still batch-unique within the run)
                lineage.append("q")
        return f"{lineage[0]}:{batch_id}"

    restamped: list = []
    # captured BEFORE the stream starts (the query writes its
    # checkpoint metadata at start): an absent metadata file means
    # this is a FRESH checkpoint, so NO stored bare-int token can be a
    # same-checkpoint replay — all of them are stale
    fresh_checkpoint = not os.path.exists(
        f"{engine.warehouse}/_stream_checkpoint/metadata"
    )

    def _neutralize_legacy_tokens(batch_id: int) -> None:
        """r13 ADVICE #4: a bare-int batch token stored by a pre-r13
        engine matches ANY lineage whose trailing batch id equals it
        (_token_applied's one-restart upgrade arm) — so a checkpoint
        deleted DURING the upgrade window could still silently skip a
        genuinely new batch whose id collides. On the FIRST batch of
        each stream instance: under a FRESH checkpoint (no metadata
        existed at stream start) EVERY stored bare int is stale and is
        restamped; under a resumed checkpoint, a stored bare int EQUAL
        to the incoming batch id is the legitimate same-checkpoint
        upgrade replay and is left for the legacy arm to honor, while
        any other bare int cannot be mid-replay of this batch. The
        restamp rewrites it to an inert 'legacy:<id>' string (matches
        no lineage, trips no legacy arm), closing the collision for
        every later batch. Driver-side manifest IO once per stream
        start; no-op on r13+ warehouses (tokens are already strings)."""
        for name, vdef in list(engine.views.items()):
            if vdef.exact_delta_fold() is None:
                continue
            tables = [engine._reduced_table(name)]
            if vdef.exact_delta_fold() in ("sum", "avg"):
                tables.append(engine._reduced_cnt_table(name))
            for t in tables:
                m = t.manifest_meta()
                tok = m.get("batch_token")
                if isinstance(tok, int) and (fresh_checkpoint or tok != batch_id):
                    cur = t._current()
                    if cur is not None:
                        m["batch_token"] = f"legacy:{tok}"
                        t._set_current(cur, m)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not restamped:
            restamped.append(True)
            _neutralize_legacy_tokens(batch_id)
        # Per-batch fixed costs are the watch path's throughput ceiling
        # (bench maintain_curve), so the cycle is structured to pay
        # each one ONCE per micro-batch, not once per (origin, view):
        # one persisted scan of the batch, one offsets read, one
        # re-aggregation per reduced view over the union of all
        # origins' affected keys, one offsets rewrite. The per-origin
        # entries writes remain — per-origin sharding is what makes
        # retraction a one-shard rewrite.
        batch_df = batch_df.persist()
        try:
            # snapshot the view registry ONCE per batch: the probe's
            # path_groups and the plan loop below must see the same
            # set — a view define()d concurrently between the two
            # iterations would otherwise KeyError at g_counts[pk]
            # (or RuntimeError mid-iteration) and kill the stream;
            # with the snapshot a late view simply joins next batch
            views_snapshot = list(engine.views.items())
            # ONE probe job: per-origin targets + per-path-group
            # compacted counts and touched bucket ids (engine
            # _probe_batch) — the r10 flow paid a second job per
            # distinct (glob, offsets) for the counts
            path_groups: dict = {}
            for _name, vdef in views_snapshot:
                pk = (
                    tuple(vdef.path)
                    if isinstance(vdef.path, (list, tuple))
                    else (vdef.path,)
                )
                path_groups.setdefault(pk, vdef.path)
            # views sharing a map stage may differ in value_type; the
            # shared run enforces the strictest declared-integer one
            # (enforcement is a check, not a transform — the emitted
            # rows are identical whenever it passes, so the cache
            # stays shared; run_map docstring, r13 ADVICE)
            mk_vt: dict = {}
            for _name, vdef in views_snapshot:
                pk0 = (
                    tuple(vdef.path)
                    if isinstance(vdef.path, (list, tuple))
                    else (vdef.path,)
                )
                if vdef.value_type in ("long", "int", "bigint"):
                    mk_vt[(pk0, vdef.map, tuple(vdef.key_schema))] = vdef.value_type
            from concurrent.futures import ThreadPoolExecutor

            # the probe job and the Python map stage both read only the
            # persisted batch and neither needs the other's output, so
            # they run CONCURRENTLY (r14: serializing them put the two
            # largest per-batch fixed costs end-to-end). The map is
            # materialized OPTIMISTICALLY for every (path, map, schema)
            # group before the probe says which groups matched — a
            # group with no matching files costs one empty-input job,
            # and the stream only fires when files arrived at all.
            upd_cache: dict = {}  # path-key -> cached compacted updates
            mapped: dict = {}  # (path-key, map fn, key schema) -> cached entries
            with ThreadPoolExecutor(max_workers=1) as probe_pool:
                probe_fut = probe_pool.submit(
                    engine._probe_batch, batch_df, path_groups
                )
                try:
                    for name, vdef in views_snapshot:
                        pk = (
                            tuple(vdef.path)
                            if isinstance(vdef.path, (list, tuple))
                            else (vdef.path,)
                        )
                        if pk not in upd_cache:
                            upd_cache[pk] = latest_wins(
                                glob_filter(batch_df, vdef.path)
                            ).cache()
                        mk = (pk, vdef.map, tuple(vdef.key_schema))
                        if mk not in mapped:
                            # views sharing (path, map fn, key schema)
                            # share ONE Python map stage per batch (the
                            # mapped+reduced twin-view pattern halves
                            # the dominant per-batch Python cost)
                            mapped[mk] = run_map(
                                upd_cache[pk].filter(F.col("type") == "put"),
                                vdef.map,
                                vdef.key_types(),
                                value_type=mk_vt.get(mk),
                            ).cache()
                    # materialize each shared map output ONCE before
                    # the concurrent view applies race to read it —
                    # concurrently: sequential counts would serialize
                    # the dominant Python map cost and make a
                    # multi-group batch's wall the SUM of its map
                    # stages instead of the max (the r10 pool shape)
                    if len(mapped) > 1:
                        with ThreadPoolExecutor(
                            max_workers=min(len(mapped), 4)
                        ) as mp:
                            list(mp.map(lambda df: df.count(), mapped.values()))
                    else:
                        for df in mapped.values():
                            df.count()
                except BaseException:
                    # a raising user map fn (or a dying job) must not
                    # leak the pinned caches on every foreachBatch
                    # retry of a persistently-failing stream
                    for df in mapped.values():
                        df.unpersist()
                    for upd in upd_cache.values():
                        upd.unpersist()
                    raise
                per_origin, g_counts, g_buckets = probe_fut.result()
            origins = sorted(per_origin)
            for origin in origins:
                engine._indexed_origins.add(origin)
                if origin in engine._missing_origins:
                    # data arrived for a source that was registered
                    # before it had any changelog rows (reference
                    # archive-found, lib/indexer.js:309-340)
                    engine._missing_origins.discard(origin)
                    engine._emit("archive-found", origin=origin)
            # driver-local metadata read, BUCKET-PRUNED to the batch's
            # origins (r13 verdict #3): O(origins-in-batch) bucket
            # files, not the whole (views x sources) table — no Spark
            # job either way. Superset rows sharing a bucket ride
            # along harmlessly (the dict is keyed exactly).
            offsets = (
                {(v, o): lv for v, o, lv in engine.offsets.read_rows(origins)}
                if origins
                else {}
            )
            offset_updates = []
            # Pass 1 (driver-side planning). The offsets table is
            # PROGRESS METADATA here, never a row filter: the parquet
            # file stream already delivers each changelog file exactly
            # once, so gating rows on version > stored offset would
            # silently DROP data whenever one version's files span
            # micro-batches (the offset advances after the first
            # slice; the second slice then fails the gate). Every row
            # of the batch applies. Re-delivery happens only on batch
            # replay or a fresh checkpoint over an already-indexed
            # warehouse — both converge, because the merge is
            # retract-then-add and in-batch latest-wins keeps the
            # newest version. Views watching the SAME glob share one
            # compaction per batch. start=-1 admits version-0 rows
            # (directory-corpus imports use version=0 puts).
            plan = []  # (name, vdef, origin_starts, path-key, map-key)
            shared: dict = {}  # path-key -> (cached updates, counts, buckets)
            for name, vdef in views_snapshot:
                origin_starts = {origin: -1 for origin in origins}
                for origin in origins:
                    target = per_origin[origin]
                    engine._emit(
                        "archive-indexing", origin=origin, view=name, version=target
                    )
                    if target > offsets.get((name, origin), 0):
                        offset_updates.append((name, origin, target))
                pk = mk = None
                if origin_starts:
                    pk = (
                        tuple(vdef.path)
                        if isinstance(vdef.path, (list, tuple))
                        else (vdef.path,)
                    )
                    if pk not in shared:
                        shared[pk] = (
                            upd_cache[pk],
                            g_counts[pk],
                            g_buckets[pk],
                        )
                    mk = (pk, vdef.map, tuple(vdef.key_schema))
                plan.append((name, vdef, origin_starts, pk, mk))
            # Pass 2: apply STORES concurrently — views sharing an
            # entries store (map-twins, r14 verdict #5) are grouped
            # into ONE _apply_store_batch call (one merge + per-view
            # re-aggregation; concurrent per-view merges of a shared
            # store would race the snapshot version and double the
            # entry-write IO). Distinct stores are disjoint storage,
            # so their merges run as parallel Spark jobs and the batch
            # wall is ~the slowest store, not the sum.
            try:
                todo = [t for t in plan if t[2]]
                groups: dict = {}  # store key -> [plan tuples]
                for t in todo:
                    groups.setdefault(engine._store_key(t[1]), []).append(t)

                def _apply_group(grp):
                    lead = grp[0]
                    engine._apply_store_batch(
                        [t[1] for t in grp],
                        batch_df,
                        lead[2],
                        prepared=shared[lead[3]],
                        mapped=mapped.get(lead[4]),
                        batch_token=_batch_token(batch_id),
                    )

                gs = list(groups.values())
                if len(gs) > 1:
                    with ThreadPoolExecutor(max_workers=min(len(gs), 4)) as pool:
                        list(pool.map(_apply_group, gs))
                elif gs:
                    _apply_group(gs[0])
            finally:
                for df in mapped.values():
                    df.unpersist()
                for upd in upd_cache.values():
                    upd.unpersist()
            for name, *_ in plan:
                for origin in origins:
                    engine._emit(
                        "archive-indexed",
                        origin=origin,
                        view=name,
                        version=per_origin[origin],
                    )
            engine._set_offsets(offset_updates)
            for origin in origins:
                engine._emit(
                    "indexes-updated", origin=origin, version=per_origin[origin]
                )
            if (
                vacuum_every is not None
                or changelog_expire_every is not None
                or rebucket_every is not None
            ):
                batch_counter[0] += 1
                # rebucket BEFORE vacuum so the superseded
                # pre-migration snapshot is trimmable in the same
                # firing when both cadences coincide
                if (
                    rebucket_every is not None
                    and batch_counter[0] % rebucket_every == 0
                ):
                    engine.auto_rebucket_entries(rebucket_bytes)
                if vacuum_every is not None and batch_counter[0] % vacuum_every == 0:
                    engine.vacuum(keep_last=vacuum_keep)
                if (
                    changelog_expire_every is not None
                    and batch_counter[0] % changelog_expire_every == 0
                ):
                    engine._expire_changelog_unsafe()
            if on_batch is not None:
                on_batch(batch_id, len(origins))
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", f"{engine.warehouse}/_stream_checkpoint")
        .outputMode("update")
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(**trigger)
    q = writer.start()
    engine._active_streams.append(q)
    return q


def watch_until_caught_up(engine) -> None:
    """Drain all pending changelog files once (availableNow) and block
    until done — the deterministic form of watch used by tests."""
    q = watch(engine)
    q.awaitTermination()


# ---------------------------------------------------------------------
# Event-time windowed aggregation (streaming + batch-equivalent forms)
# ---------------------------------------------------------------------

def _as_event_time(df: DataFrame, col: str) -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (with local tz):
    watermarks reject TIMESTAMP_NTZ outright, and the testdata's
    parquet micros read as NTZ. The session timezone is pinned to UTC
    (session.py), so the cast is value-preserving. Applied in BOTH
    batch and streaming modes so stream/batch twins keep identical
    output schemas."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window counts per
    event_type with a late-data watermark.

    The same expression tree serves batch and streaming: in streaming
    mode the watermark bounds state (late rows beyond it are dropped);
    in batch mode it is a no-op, which is what makes the
    batch-vs-stream equivalence test meaningful.
    """
    df = _as_event_time(events, "ts")
    if streaming:
        df = df.withWatermark("ts", watermark)
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        df.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_windows(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Session windows per user: activity bursts separated by >= gap.

    Uses native F.session_window (merging-state windows in streaming)."""
    df = _as_event_time(events, "ts")
    if streaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_stream_over_directory(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    schema,
    output_mode: str = "complete",
) -> None:
    """Drive any event-time transform as a real stream over a parquet
    directory (availableNow), sinking to parquet via foreachBatch —
    the test harness for stream/batch equivalence. ``output_mode``:
    "complete" (aggregations; each batch overwrites with full state)
    or "append" (stateless transforms like stream-static enrichment;
    batches accumulate). Both sinks are idempotent under foreachBatch
    retries: complete mode overwrites the whole directory, append mode
    overwrites a batch_id-keyed subdirectory (a retried batch replaces
    its own partial output instead of duplicating rows — plain
    mode('append') into one directory is only at-least-once). Read
    append output with ``option("recursiveFileLookup", "true")``."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = transform(stream)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if output_mode == "complete":
            batch_df.write.mode("overwrite").parquet(out_dir)
        else:
            batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch-{batch_id}")

    q = (
        out.writeStream.foreachBatch(_sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact-dedup: keep the first row per key, with state
    bounded by the watermark.

    Batch mode: plain dropDuplicates (the watermark is a no-op), so the
    stream/batch equivalence test is meaningful. Streaming mode:
    ``dropDuplicatesWithinWatermark`` — duplicate keys arriving within
    the watermark horizon are suppressed and per-key state is evicted
    once the watermark passes, the only formulation whose state does
    NOT grow unboundedly on an infinite stream. This is the streaming
    twin of exact_dedup for continuous training-data ingestion.
    """
    events = _as_event_time(events, ts_col)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def streaming_neardup_ingest(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    state_root: str,
    pairs_out: str,
    schema,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> None:
    """Continuous near-dup ingestion: stream document batches from a
    parquet directory, check each micro-batch against the ACCUMULATED
    corpus via incremental MinHash (operators/dedup.py::
    incremental_minhash_pairs), append verified pairs to ``pairs_out``
    and the batch's signatures + docs to the state tables.

    State layout under ``state_root``:
      - ``sigs``: AppendOnlyLog of (id, signature) — banded per batch,
        never recomputed; the base side of every bucket join
      - ``docs``: AppendOnlyLog of (id, text) — verification corpus
        (at 100 TB this is the main table itself, not a copy)
    Exactly-once: the stream checkpoint makes batch replay idempotent
    only if the sinks tolerate it; parquet appends do not, so this
    helper is availableNow/test-grade — a production run would MERGE
    into a transactional table keyed on (id_a, id_b).
    """
    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.operators.dedup import (
        incremental_minhash_pairs,
    )
    from dat_archive_map_reduce_spark.plans.catalog import AppendOnlyLog

    sig_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )
    doc_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(text_col, T.StringType(), False),
        ]
    )
    sigs_log = AppendOnlyLog(spark, f"{state_root}/sigs", sig_schema)
    docs_log = AppendOnlyLog(spark, f"{state_root}/docs", doc_schema)

    def _log_nonempty(log: AppendOnlyLog) -> bool:
        import glob as _g

        return bool(_g.glob(f"{log.root}/*.parquet"))

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        new_docs = batch_df.select(id_col, text_col).persist()
        have_base = _log_nonempty(sigs_log)
        base_sigs = sigs_log.read() if have_base else None
        base_docs = docs_log.read() if have_base else new_docs.limit(0)
        pairs, new_sigs = incremental_minhash_pairs(
            new_docs,
            base_docs,
            base_sigs,
            text_col,
            id_col,
            num_perm=num_perm,
            bands=bands,
            threshold=threshold,
        )
        # batch_id-keyed overwrite: a foreachBatch retry replaces its
        # own partial output instead of duplicating pairs (read back
        # with recursiveFileLookup)
        pairs.write.mode("overwrite").parquet(f"{pairs_out}/batch-{batch_id}")
        sigs_log.append(new_sigs)
        docs_log.append(new_docs)
        new_docs.unpersist()
        new_sigs.unpersist()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_ivf_assign(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    assign_out: str,
    centroids: "list[tuple[int, list[float]]]",
    schema,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental IVF index maintenance — the streaming twin of the
    ANN pillar (r12 verdict #5, completing streaming coverage of all
    four LLM-pipeline pillars): embeddings arriving in a parquet
    directory are assigned to PINNED centroids inside foreachBatch
    and land in a queryable assignments table. The assignment is
    operators.similarity.ivf_assign_expr — the literal expression
    the batch ann_ivf_portable_topk plan uses — so the accumulated
    stream state is bit-identical to a batch assignment pass over
    the same corpus (pinned by the stream=batch equality test).

    Exactly-once: each micro-batch OVERWRITES its own
    ``batch-<id>/`` subdirectory, so a foreachBatch replay replaces
    its partial output instead of duplicating rows (same protocol as
    streaming_neardup_ingest's pairs sink). Serving reads the whole
    tree via ivf_assignments(); a query probes its n_probe nearest
    centroids driver-side (bounded codebook math) and semi-joins the
    assignment table for candidates — at 100 TB the assignments are
    the index, the corpus is never rescanned per query, and new
    embeddings become searchable one micro-batch after arrival.
    Centroids stay pinned between retrain cycles (the production IVF
    pattern: assignment is streaming, codebook refresh is a periodic
    batch job followed by a full re-assign)."""
    from dat_archive_map_reduce_spark.operators.similarity import (
        ivf_assign_expr,
    )

    cents = sorted((int(c), [float(x) for x in v]) for c, v in centroids)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                F.col(id_col),
                ivf_assign_expr(cents, vec_col).alias("cluster"),
            )
            .write.mode("overwrite")
            .parquet(f"{assign_out}/batch-{batch_id}")
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ivf_assignments(
    spark: SparkSession, assign_out: str, id_col: str = "vec_id"
) -> DataFrame:
    """The queryable assignments table streaming_ivf_assign maintains
    (one row per embedding: id + pinned-centroid cluster)."""
    from pyspark.sql import types as T

    sch = T.StructType(
        [
            T.StructField(id_col, T.LongType(), True),
            T.StructField("cluster", T.IntegerType(), True),
        ]
    )
    return (
        spark.read.schema(sch)
        .option("recursiveFileLookup", "true")
        .parquet(assign_out)
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    upper_seconds: int = 3600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval condition: pair
    rows with equal ``on`` where ``left_ts < right_ts <=
    left_ts + upper_seconds``. ``how``: "inner" or "leftOuter".

    In streaming mode both sides carry watermarks and the time-bound
    condition lets Spark evict join state: a buffered left row can be
    dropped once the right watermark passes left_ts + upper — without
    the interval bound, stream-stream state grows forever. Under
    leftOuter the SAME eviction moment is what licenses the null
    emission: a left row pairs with nulls only once no future right
    row could still match it, so outer results trail the right
    watermark by ``upper_seconds`` (tail rows of a finite stream flush
    only when a later batch advances the watermark past them — the
    equivalence test appends a watermark-pusher row for exactly this).
    The same expression tree runs in batch (watermarks no-op) for the
    equivalence test. Caller pre-renames columns so the sides don't
    collide: left columns ``l_*`` (key ``l_<on>``), right ``r_*``.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    left = _as_event_time(left, left_ts)
    right = _as_event_time(right, right_ts)
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (F.col(f"l_{on}") == F.col(f"r_{on}"))
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    batch_how = "left" if how == "leftOuter" else how
    return l.join(r, cond, how if l.isStreaming else batch_how)


# ---------------------------------------------------------------------
# Custom stateful operator: applyInPandasWithState
# ---------------------------------------------------------------------

def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running totals
    maintained in explicit group state (applyInPandasWithState).

    What the built-in agg cannot express: the state here is an
    arbitrary Python structure updated by arbitrary code per
    micro-batch (running count, value sum, and high-water-mark
    timestamp), the shape of session scoring / per-entity model state
    in a production stream. Emits one row per user per batch with the
    post-batch totals (update-mode semantics, like the reference's
    continuously re-folded reduce views, /root/reference/lib/indexer.js:245-254).

    State is partitioned by the group key, so it scales horizontally
    with executors; memory is O(distinct users), the same bound the
    reference's reduced sublevel has.
    """
    import pandas as pd  # noqa: F811  (worker-side import)
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("n_events", T.LongType(), False),
            T.StructField("sum_value", T.DoubleType(), False),
            T.StructField("last_ts", T.TimestampType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType(), False),
            T.StructField("total", T.DoubleType(), False),
            T.StructField("last_us", T.LongType(), True),
        ]
    )

    def _update(key, pdfs, state: GroupState):
        n, total, last_us = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                batch_max = pdf["ts"].max()
                us = int(batch_max.value // 1000)
                last_us = us if last_us is None else max(last_us, us)
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [total],
                "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_heavy_hitters(
    tok_rows: DataFrame,
    slots: int = 64,
    shards: int = 8,
    token_col: str = "token",
) -> DataFrame:
    """Bounded-state streaming heavy hitters: weighted Misra-Gries
    summaries held in explicit group state (applyInPandasWithState) —
    the streaming twin of operators/text.py::mg_heavy_hitters pass 1.

    Tokens shard by a stable hash (xxhash64 % shards); every
    occurrence of a token lands in the SAME shard, so each shard's MG
    summary carries the standard per-shard survival guarantee: any
    token whose count within the shard exceeds N_shard/(slots+1)
    is present in that shard's summary at every point in the stream.
    State per shard is <= ``slots`` (token, counter) entries — memory
    is O(shards * slots) forever, on an infinite stream.

    Each micro-batch emits the shard's full post-batch summary
    (update-mode semantics): (shard, token, counter, batch_n). The
    latest emission per shard IS its current summary; a periodic
    exact recount over the candidates (pass 2 of the batch operator)
    turns candidates into exact counts whenever needed.
    """
    import pandas as pd  # noqa: F811  (worker-side import)
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState  # noqa: F401

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("token", T.StringType(), False),
            T.StructField("counter", T.LongType(), False),
            T.StructField("batch_n", T.LongType(), False),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("toks", T.ArrayType(T.StringType()), False),
            T.StructField("counts", T.ArrayType(T.LongType()), False),
            T.StructField("seen", T.LongType(), False),
        ]
    )

    def _update(key, pdfs, state):
        if state.exists:
            toks, counts, seen = state.get
            st = dict(zip(toks, counts))
        else:
            st, seen = {}, 0
        for pdf in pdfs:
            vc = pdf[token_col].value_counts()
            seen += int(vc.sum())
            for tok, c in vc.items():
                st[tok] = st.get(tok, 0) + int(c)
            # weighted MG compression: while over budget, subtract the
            # minimum counter from everyone and drop the zeros — each
            # pass evicts >= 1 entry, so this terminates in <= len(st)
            while len(st) > slots:
                d = min(st.values())
                st = {t: v - d for t, v in st.items() if v > d}
        state.update((list(st.keys()), [int(v) for v in st.values()], seen))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(st),
                "token": list(st.keys()),
                "counter": [int(v) for v in st.values()],
                "batch_n": [seen] * len(st),
            }
        )

    sharded = tok_rows.select(
        F.pmod(F.xxhash64(F.col(token_col)), F.lit(shards)).cast("int").alias("shard"),
        F.col(token_col).alias(token_col),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def streaming_cms(
    tok_rows: DataFrame,
    depth: int = 4,
    width_hex: int = 2,
    token_col: str = "token",
) -> DataFrame:
    """Bounded-state streaming count-min sketch: one state group per
    sketch ROW holds that row's full bucket-counter array — the
    streaming twin of text_cms_heavy_hitters' sketch build. Unlike
    Misra-Gries, CMS is EXACTLY mergeable (counters just add), so the
    streamed sketch equals the batch sketch bit-for-bit at every
    point, not merely within bounds — the equivalence test asserts
    equality, the strongest stream/batch contract in the suite.

    Bucketing is the same engine-portable first-``width_hex``-md5-hex
    scheme as the batch operator (seeded per row), computed NATIVELY
    before the shuffle, so only (row, bucket) pairs reach Python.
    State is exactly ``depth`` groups x 16^width_hex counters forever
    on an infinite stream; each micro-batch emits the row's full
    updated counter table (update mode) — the latest emission per row
    IS the sketch.
    """
    import pandas as pd  # noqa: F811  (worker-side import)
    from pyspark.sql import types as T

    width = 16 ** width_hex
    out_schema = T.StructType(
        [
            T.StructField("r", T.IntegerType(), False),
            T.StructField("bucket", T.StringType(), False),
            T.StructField("c", T.LongType(), False),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("buckets", T.ArrayType(T.StringType()), False),
            T.StructField("counts", T.ArrayType(T.LongType()), False),
        ]
    )

    def _update(key, pdfs, state):
        if state.exists:
            buckets, counts = state.get
            st = dict(zip(buckets, counts))
        else:
            st = {}
        for pdf in pdfs:
            vc = pdf["bucket"].value_counts()
            for b, c in vc.items():
                st[b] = st.get(b, 0) + int(c)
        if len(st) > width:  # impossible by construction; fail loudly
            raise ValueError(f"CMS row {key[0]} exceeded width {width}")
        state.update((list(st.keys()), [int(v) for v in st.values()]))
        yield pd.DataFrame(
            {
                "r": [key[0]] * len(st),
                "bucket": list(st.keys()),
                "c": [int(v) for v in st.values()],
            }
        )

    hashed = tok_rows.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("r"),
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cms"),
                                i.cast("string"),
                                F.lit(":"),
                                F.col(token_col),
                            )
                        ),
                        1,
                        width_hex,
                    ).alias("bucket"),
                ),
            )
        ).alias("x")
    ).select(F.col("x.r").alias("r"), F.col("x.bucket").alias("bucket"))
    return hashed.groupBy("r").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def blocklist_fingerprints(
    docs: DataFrame, text_col: str = "text", n: int = 5, hex_chars: int = 16
) -> DataFrame:
    """Distinct rolling n-gram fingerprints of a protected corpus
    (eval sets, licensed text) — the static side of
    streaming_contamination. Same truncated_shingle_fps definition
    as the batch contamination pipeline, so the gate and the offline
    scan agree on what a hit IS."""
    from dat_archive_map_reduce_spark.operators.text import (
        truncated_shingle_fps,
    )

    return docs.select(
        F.explode(truncated_shingle_fps(text_col, n, hex_chars)).alias("fp")
    ).distinct()


def streaming_contamination(
    docs: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    hex_chars: int = 16,
    min_hits: int = 1,
) -> DataFrame:
    """Contamination GATE for continuous training-data ingestion (the
    streaming twin of the batch corpus_contamination scan): every
    arriving document's rolling n-gram fingerprint sketch probes a
    STATIC blocklist broadcast to the executors; documents with >=
    ``min_hits`` banned shingles are emitted as
    (doc_id, n_hits, hit_fps) for quarantine.

    Plan: explode(sketch) -> stream-static BROADCAST inner join on
    the fingerprint (stateless per micro-batch: the static side is
    re-planned and the join keeps NO state store) -> per-doc count.
    Only the final per-doc aggregation is stateful; its state is one
    row per CONTAMINATED document — bounded by the blocklist's actual
    overlap with the stream, not by stream length (clean documents
    leave nothing behind). Batch mode: the identical plan on a batch
    DataFrame, which is what the stream=batch-exact equivalence test
    pins. Scale contract: the blocklist must be broadcast-sized
    (distinct shingles of the protected corpora — eval sets are MBs,
    not TBs); the stream side is never shuffled before the join."""
    from dat_archive_map_reduce_spark.operators.text import (
        truncated_shingle_fps,
    )

    fps = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(truncated_shingle_fps(text_col, n, hex_chars)).alias("fp"),
    )
    hits = fps.join(F.broadcast(blocklist.select("fp").distinct()), "fp")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.array_sort(F.collect_set("fp")).alias("hit_fps"),
        )
        .filter(F.col("n_hits") >= int(min_hits))
    )
