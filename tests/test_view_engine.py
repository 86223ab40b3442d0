"""Behavioral-contract tests for the view engine.

Mirrors the reference's ava suite (/root/reference/test/view.js and
test/compound-keys.js; fixture documented in /root/repo/FIXTURES.md §A):
10 sources x 4 JSON files, 4 views (mapped + count-reduced over two
globs), asserting multimap get, flattened list, range bounds, reverse,
limit, and update/retraction semantics.
"""

import json

import pytest

from dat_archive_map_reduce_spark.engine import MapReduce
from dat_archive_map_reduce_spark.errors import SchemaError

N_ARCHIVES = 4  # reference uses 10; 4 keeps local runtime sane, same shape


def fixture_rows(i: int, version: int = 1, suffix: str = ""):
    """The reference fixture's 4 files for archive i
    (/root/reference/test/view.js:19-25)."""
    origin = f"dat://site{i}"

    def rec(first, second, third):
        return json.dumps({"first": first, "second": second, "third": third})

    return [
        {"origin": origin, "pathname": "/single.json", "version": version,
         "content": rec(f"first{i}{suffix}", i, f"third{i}single")},
        {"origin": origin, "pathname": "/multi/1.json", "version": version,
         "content": rec(f"first{i}{suffix}", (i + 1) * 100, f"third{i}multi1")},
        {"origin": origin, "pathname": "/multi/2.json", "version": version,
         "content": rec(f"first{i}{suffix}", i, f"third{i}multi2")},
        {"origin": origin, "pathname": "/multi/3.json", "version": version,
         "content": rec(f"first{i}{suffix}b", i, f"third{i}multi3")},
    ]


def map_first(content, meta, emit):
    obj = json.loads(content)
    emit(obj["first"], meta["url"])


def map_origin_one(content, meta, emit):
    emit(meta["origin"], 1)


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    db = MapReduce(spark, wh)
    db.define("single", path="/single.json", map=map_first, key_schema=["string"])
    db.define("single-reduced", path="/single.json", map=map_origin_one,
              reduce="count", key_schema=["string"])
    db.define("multi", path="/multi/*.json", map=map_first, key_schema=["string"])
    db.define("multi-reduced", path="/multi/*.json", map=map_origin_one,
              reduce="count", key_schema=["string"])
    for i in range(N_ARCHIVES):
        db.append_changes(fixture_rows(i))
    for i in range(N_ARCHIVES):
        db.index(f"dat://site{i}")
    return db


def test_get_mapped_multimap(db):
    # multi view: first0 emitted by /multi/1.json and /multi/2.json
    res = db.get("multi", "first0")
    assert res is not None
    assert sorted(res["value"]) == [
        "dat://site0/multi/1.json",
        "dat://site0/multi/2.json",
    ]


def test_get_reduced_count(db):
    # reference test/view.js:76-77 — count of files per origin
    assert db.get("single-reduced", "dat://site1") == {"key": "dat://site1", "value": 1}
    assert db.get("multi-reduced", "dat://site1") == {"key": "dat://site1", "value": 3}


def test_get_missing_key(db):
    assert db.get("single", "nope") is None
    assert db.get("single-reduced", "nope") is None


def test_list_full_and_flatten(db):
    # mapped list flattens to one row per (key, value): 3 multi files
    # per archive (test/view.js:97-103)
    rows = db.list("multi")
    assert len(rows) == 3 * N_ARCHIVES
    # sorted by key ascending
    keys = [r["key"] for r in rows]
    assert keys == sorted(keys)


def test_list_bounds(db):
    rows = db.list("single", gte="first1", lt="first3")
    assert {r["key"] for r in rows} == {"first1", "first2"}
    rows = db.list("single", gt="first1", lte="first3")
    assert {r["key"] for r in rows} == {"first2", "first3"}


def test_list_reverse_is_involution(db):
    fwd = db.list("multi")
    rev = db.list("multi", reverse=True)
    assert fwd == rev[::-1]


def test_list_limit_is_prefix(db):
    fwd = db.list("multi")
    lim = db.list("multi", limit=4)
    assert lim == fwd[:4]


def test_update_retracts_old_keys(db):
    # rewrite every file with changed 'first' values, re-index, verify
    # old keys gone / new keys present / counts unchanged
    # (reference test/view.js:150-185)
    for i in range(N_ARCHIVES):
        db.append_changes(fixture_rows(i, version=2, suffix="X"))
    for i in range(N_ARCHIVES):
        db.index(f"dat://site{i}")
    assert db.get("single", "first1") is None
    res = db.get("single", "first1X")
    assert res is not None and res["value"] == ["dat://site1/single.json"]
    assert db.get("multi-reduced", "dat://site1") == {"key": "dat://site1", "value": 3}
    assert len(db.list("multi")) == 3 * N_ARCHIVES


def test_reindex_same_version_is_idempotent(db):
    before = db.list("multi")
    for i in range(N_ARCHIVES):
        db.index(f"dat://site{i}")  # checkpoint guard: no-op
    assert db.list("multi") == before


def test_delete_file_retracts(db):
    db.unindex_file("dat://site2", "/multi/3.json")
    assert db.get("single", "first2Xb") is None or True  # key from multi/3 only
    assert db.get("multi-reduced", "dat://site2") == {"key": "dat://site2", "value": 2}
    # re-add it
    rec = json.dumps({"first": "first2Xb", "second": 2, "third": "third2multi3"})
    db.index_file("dat://site2", "/multi/3.json", rec)
    assert db.get("multi-reduced", "dat://site2") == {"key": "dat://site2", "value": 3}


def test_unindex_origin(db):
    db.unindex("dat://site3")
    assert db.get("single-reduced", "dat://site3") is None
    assert db.get("multi-reduced", "dat://site3") is None
    assert not db.is_indexed("dat://site3")
    # other origins untouched
    assert db.get("multi-reduced", "dat://site0") == {"key": "dat://site0", "value": 3}


def test_schema_validation(spark, tmp_path):
    db2 = MapReduce(spark, str(tmp_path / "wh2"))
    with pytest.raises(SchemaError):
        db2.define("bad", path=123, map=map_first)
    with pytest.raises(SchemaError):
        db2.define("bad", path="/x.json", map="not a function")
    with pytest.raises(SchemaError):
        db2.define("bad", path="/x.json", map=map_first, reduce="not-a-fold")


def test_events_fire(spark, tmp_path):
    db3 = MapReduce(spark, str(tmp_path / "wh3"))
    seen = []
    db3.on("indexes-updated", lambda **kw: seen.append(kw))
    db3.define("v", path="/a.json", map=map_first, key_schema=["string"])
    db3.index_source("dat://e1", [
        {"origin": "dat://e1", "pathname": "/a.json", "version": 1,
         "content": json.dumps({"first": "x", "second": 1, "third": "y"})},
    ])
    assert seen and seen[0]["origin"] == "dat://e1"


def test_lifecycle_and_progress_events(spark, tmp_path):
    """Full event-surface parity with the reference's emitter
    (index.js:53-57, indexer.js:142-175,413-418): ctor-registered
    `open`, per-view indexing/progress/indexed ordering, and
    archive-error on a failing map UDF."""
    log = []
    rec = lambda name: (lambda **kw: log.append((name, kw)))
    db = MapReduce(
        spark,
        str(tmp_path / "wh_ev"),
        listeners={
            "open": [rec("open")],
            "archive-indexing": [rec("indexing")],
            "archive-index-progress": [rec("progress")],
            "archive-indexed": [rec("indexed")],
        },
    )
    assert [n for n, _ in log] == ["open"]
    db.define("v", path="/*.json", map=map_first, key_schema=["string"])
    db.index_source("dat://ev", [
        {"origin": "dat://ev", "pathname": f"/p{i}.json", "version": i + 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(3)
    ])
    names = [n for n, _ in log]
    assert names == ["open", "indexing", "progress", "indexed"]
    progress = dict(log[2][1])
    assert progress["processed"] == progress["total"] == 3

    errs = []
    db.on("archive-error", lambda **kw: errs.append(kw))

    def bad_map(value, meta, emit):
        raise RuntimeError("boom")

    db.define("broken", path="/*.json", map=bad_map, key_schema=["string"])
    with pytest.raises(Exception):
        db.index_source("dat://ev2", [
            {"origin": "dat://ev2", "pathname": "/q.json", "version": 1,
             "content": json.dumps({"first": "a", "second": 1, "third": "t"})},
        ])
    assert errs and errs[0]["origin"] == "dat://ev2"


def test_reduce_collect_roundtrips_original_values(spark, tmp_path):
    """The 'collect' builtin must yield a JSON array of the ORIGINAL
    emitted values — entries.value is already JSON text, so re-encoding
    it would return ['"dat://x/a.json"'] instead of ['dat://x/a.json']."""
    db = MapReduce(spark, str(tmp_path / "wh-collect"))
    db.define("collected", path="/*.json", map=map_first,
              reduce="collect", key_schema=["string"])
    db.index_source("dat://c", [
        {"origin": "dat://c", "pathname": "/a.json", "version": 1,
         "content": json.dumps({"first": "k", "second": 1, "third": "t"})},
        {"origin": "dat://c", "pathname": "/b.json", "version": 1,
         "content": json.dumps({"first": "k", "second": 2, "third": "t"})},
    ])
    got = db.get("collected", "k")
    assert got is not None
    assert sorted(got["value"]) == ["dat://c/a.json", "dat://c/b.json"]
    for v in got["value"]:
        assert not v.startswith('"')  # not double-encoded JSON text


def map_num_key(content, meta, emit):
    obj = json.loads(content)
    emit([meta["origin"], obj["second"]], meta["url"])


def test_list_text_order_mode_matches_reference_quirk(spark, tmp_path):
    """Opt-in text_order reproduces the reference's JSON.stringify byte
    ordering, where numbers in compound keys sort lexicographically
    (100 before 2); default stays typed ordering."""
    db = MapReduce(spark, str(tmp_path / "wh-textorder"))
    db.define("byn", path="/*.json", map=map_num_key,
              key_schema=["string", "long"])
    db.index_source("dat://t", [
        {"origin": "dat://t", "pathname": f"/f{n}.json", "version": 1,
         "content": json.dumps({"first": "x", "second": n, "third": "t"})}
        for n in (2, 100, 30)
    ])
    typed = [r["key"][1] for r in db.list("byn")]
    assert typed == [2, 30, 100]
    text = [r["key"][1] for r in db.list("byn", text_order=True)]
    assert text == [100, 2, 30]  # "100" < "2" < "30" as JSON text
    # bounds also compare as text in this mode
    bounded = [r["key"][1] for r in db.list("byn", text_order=True,
                                            gt=["dat://t", 100])]
    assert bounded == [2, 30]


def test_changelog_scan_prunes_by_origin_partition(spark, tmp_path):
    """Scale contract (round-4 verdict #4): the changelog is written
    origin-partitioned, so a per-source index()/current_version() scan
    prunes to ONE source's directory — the physical plan must carry an
    origin PartitionFilter and no origin PushedFilter (the predicate is
    consumed by partition pruning, never evaluated against row data)."""
    db = MapReduce(spark, str(tmp_path / "wh-part"))
    for i in range(3):
        db.append_changes([
            {"origin": f"dat://p{i}", "pathname": "/a.json", "version": 1,
             "content": json.dumps({"first": f"f{i}", "second": i,
                                    "third": "t"})}
        ])
    import os
    subdirs = sorted(d for d in os.listdir(db.changelog.root)
                     if d.startswith("origin="))
    assert len(subdirs) == 3  # hive layout on disk

    scan = db.changelog.read().filter("origin = 'dat://p1'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the origin predicate must appear INSIDE the partition filters
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "origin" in pf
    assert scan.count() == 1
    assert db.current_version("dat://p1") == 1


def test_changelog_legacy_flat_layout_still_works(spark, tmp_path):
    """Layout migration guard: a warehouse whose changelog was written
    BEFORE origin-partitioning (flat part files in the log dir) must
    keep appending flat — mixing origin=... subdirs into a flat dir
    would make every subsequent read throw Spark's conflicting-
    directory-structures error, bricking the warehouse."""
    import os

    wh = str(tmp_path / "wh-legacy")
    row = {"origin": "dat://old", "pathname": "/a.json", "version": 1,
           "content": json.dumps({"first": "x", "second": 1, "third": "t"})}
    # simulate the old build: write the changelog flat
    db0 = MapReduce(spark, wh)
    db0.changelog.partition_by = ()
    db0.append_changes([row])
    assert any(n.endswith(".parquet")
               for n in os.listdir(db0.changelog.root))

    # a fresh engine on the same warehouse must detect the flat layout
    db1 = MapReduce(spark, wh)
    assert db1.changelog.partition_by == ()
    db1.append_changes([{**row, "origin": "dat://new"}])
    assert not any(n.startswith("origin=")
                   for n in os.listdir(db1.changelog.root))
    assert db1.current_version("dat://old") == 1
    assert db1.current_version("dat://new") == 1


def test_bucket_fn_driver_matches_spark(spark):
    """The merge path derives touched-bucket ids from url strings in
    TWO places — in-plan (F.crc32 % N) and driver-side (zlib.crc32 %
    N, BucketedEntriesTable.bucket_of) — so the two functions must be
    bit-identical or a merge could hardlink a bucket that needed
    retraction."""
    import zlib

    from pyspark.sql import functions as F

    urls = [
        "dat://site0/single.json",
        "dat://sité1/multi/ü.json",  # non-ascii: crc runs on utf-8 bytes
        "", "a", "dat://x/" + "p" * 500,
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["b"]
        for r in df.select(
            "url", F.pmod(F.crc32(F.col("url").cast("string")), F.lit(16)).cast("int").alias("b")
        ).collect()
    }
    for u in urls:
        assert got[u] == zlib.crc32(u.encode("utf-8")) % 16


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100-TB maintenance contract: updating ONE file rewrites only
    the bucket(s) containing it; every other bucket's data files carry
    into the new snapshot as hardlinks (same inode — zero data IO),
    and retraction still removes the file's old entries."""
    import os
    import zlib

    wh = str(tmp_path / "wh-buckets")
    db = MapReduce(spark, wh, entries_buckets=8)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://bucketed"
    rows = [
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(24)
    ]
    db.append_changes(rows)
    db.index(origin)

    store = db._entries_table("single", origin)
    v1 = store._current()

    def inodes(v):
        out = {}
        for b in range(store.n_buckets):
            d = store._bucket_dir(v, b)
            if os.path.isdir(d):
                out[b] = {
                    n: os.stat(os.path.join(d, n)).st_ino
                    for n in os.listdir(d) if n.endswith(".parquet")
                }
        return out

    before = inodes(v1)
    assert len(before) > 1  # 24 files spread over >1 of 8 buckets

    # update one file -> exactly its bucket is rewritten
    url = f"{origin}/docs/5.json"
    hot = zlib.crc32(url.encode()) % store.n_buckets
    db.append_changes([
        {"origin": origin, "pathname": "/docs/5.json", "version": 2,
         "content": json.dumps({"first": "k5-new", "second": 5, "third": "t"})}
    ])
    db.index(origin)

    v2 = store._current()
    assert v2 == v1 + 1
    after = inodes(v2)
    for b, files in before.items():
        if b == hot:
            # rewritten: no file of the old bucket survives by inode
            assert not (set(files.values()) & set(after.get(b, {}).values()))
        else:
            # untouched: identical file set, SAME inodes (hardlinks)
            assert after[b] == files
    # retract-then-add semantics held across the bucketed merge
    assert db.get("single", "k5") is None
    assert db.get("single", "k5-new")["value"] == [url]
    # pre-flip snapshot still readable (time travel across hardlinks)
    assert store.read(v1).count() == 24


def test_offsets_local_io_spark_interop(spark, tmp_path):
    """read_rows/overwrite_rows (driver-local pyarrow) and the Spark
    reader/writer must interoperate on the same snapshot chain."""
    from dat_archive_map_reduce_spark.plans.catalog import (
        OFFSETS_SCHEMA,
        VersionedTable,
    )

    t = VersionedTable(spark, str(tmp_path / "offs"), OFFSETS_SCHEMA)
    assert t.read_rows() == []
    t.overwrite_rows([("v1", "dat://a", 3), ("v2", "dat://b", 7)])
    # Spark reads what pyarrow wrote
    got = {(r["view"], r["origin"]): r["last_version"] for r in t.read().collect()}
    assert got == {("v1", "dat://a"): 3, ("v2", "dat://b"): 7}
    # pyarrow reads what Spark wrote
    t.overwrite(spark.createDataFrame([("v1", "dat://a", 9)], OFFSETS_SCHEMA))
    assert t.read_rows() == [("v1", "dat://a", 9)]
    # empty rewrite round-trips
    t.overwrite_rows([])
    assert t.read_rows() == [] and t.read().count() == 0


def test_bucketed_compact_preserves_layout(spark, tmp_path):
    """OPTIMIZE on a bucketed entries shard must keep the bucket
    layout (the flat rewrite would force the next merge into a full
    re-bucketing pass) and preserve the data."""
    wh = str(tmp_path / "wh-compact")
    db = MapReduce(spark, wh, entries_buckets=8)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://compact"
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(16)
    ])
    db.index(origin)
    store = db._entries_table("single", origin)
    before = {tuple(r) for r in store.read().collect()}
    v = store.compact(sort_cols=["key_json"])
    assert store._current() == v
    assert store.current_is_bucketed()
    assert {tuple(r) for r in store.read().collect()} == before
    # and the next incremental merge stays incremental
    db.append_changes([
        {"origin": origin, "pathname": "/docs/3.json", "version": 2,
         "content": json.dumps({"first": "k3x", "second": 3, "third": "t"})}
    ])
    db.index(origin)
    assert db.get("single", "k3") is None and db.get("single", "k3x") is not None


def test_vacuum_safe_with_hardlinked_snapshots(spark, tmp_path):
    """Vacuuming a superseded snapshot whose data files are hardlinked
    into the current one must leave the current snapshot fully
    readable (same inode, two directory entries — removing one
    directory tree only drops link count)."""
    wh = str(tmp_path / "wh-vac")
    db = MapReduce(spark, wh, entries_buckets=8)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://vac"
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(24)
    ])
    db.index(origin)
    # three single-file drips -> three more snapshots, each hardlink-
    # reusing most buckets from its predecessor
    for v in (2, 3, 4):
        db.append_changes([
            {"origin": origin, "pathname": "/docs/0.json", "version": v,
             "content": json.dumps({"first": f"k0v{v}", "second": 0, "third": "t"})}
        ])
        db.index(origin)
    store = db._entries_table("single", origin)
    assert len(store.versions()) >= 4
    removed = db.vacuum(keep_last=1)
    assert any(removed.values())
    assert store.read().count() == 24
    assert db.get("single", "k0v4") is not None
    assert db.get("single", "k1")["value"] == [f"{origin}/docs/1.json"]


def test_orphan_snapshot_dir_is_ignored_and_overwritten(spark, tmp_path):
    """Crash-safety: a writer that died AFTER writing its snapshot
    directory but BEFORE flipping the manifest leaves an orphan
    vNNNNNNNN dir. Readers must keep serving the manifest's snapshot,
    and the NEXT merge (which targets the same version number) must
    overwrite the orphan and converge."""
    import os

    wh = str(tmp_path / "wh-orphan")
    db = MapReduce(spark, wh, entries_buckets=8)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://orphan"
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(8)
    ])
    db.index(origin)
    store = db._entries_table("single", origin)
    cur = store._current()
    # simulate the dead writer: orphan dir at cur+1 with garbage layout
    orphan = store._snapshot_dir(cur + 1)
    os.makedirs(os.path.join(orphan, "_b=0"), exist_ok=True)
    with open(os.path.join(orphan, "_b=0", "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    # reader still serves the manifest's snapshot
    assert store._current() == cur
    assert db.get("single", "k3") is not None
    # the next merge targets cur+1, overwrites the orphan, and the
    # retract-then-add semantics hold
    db.append_changes([
        {"origin": origin, "pathname": "/docs/3.json", "version": 2,
         "content": json.dumps({"first": "k3new", "second": 3, "third": "t"})}
    ])
    db.index(origin)
    assert store._current() == cur + 1
    assert db.get("single", "k3") is None
    assert db.get("single", "k3new") is not None
    assert store.read().count() == 8


def test_reopen_with_different_bucket_count_stays_correct(spark, tmp_path):
    """The shard pins its bucket count at creation (_buckets.json); an
    engine reopened with a DIFFERENT entries_buckets must keep using
    the pinned count — caller-precomputed bucket ids from the new
    engine config are recomputed against the shard's N (a stale id
    set would hardlink a bucket that needed retraction)."""
    wh = str(tmp_path / "wh-repin")
    db1 = MapReduce(spark, wh, entries_buckets=8)
    db1.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://repin"
    db1.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(12)
    ])
    db1.index(origin)
    db1.close()

    db2 = MapReduce(spark, wh, entries_buckets=32)  # different config
    db2.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    store = db2._entries_table("single", origin)
    assert store.n_buckets == 8  # pinned, not 32
    db2.append_changes([
        {"origin": origin, "pathname": "/docs/5.json", "version": 2,
         "content": json.dumps({"first": "k5new", "second": 5, "third": "t"})}
    ])
    db2.index(origin)
    assert db2.get("single", "k5") is None
    assert db2.get("single", "k5new") is not None
    assert store.read().count() == 12
    assert store.current_is_bucketed()


def test_overwrite_rows_clears_orphaned_snapshot_dir(spark, tmp_path):
    """A crash-orphaned snapshot directory at the next version (a
    legacy Spark overwrite() that died before the pointer flip) must
    not leak its stale part files into the new driver-local snapshot:
    overwrite_rows clears the destination like every other overwrite
    path (r10 advisory)."""
    import os

    from dat_archive_map_reduce_spark.plans.catalog import (
        OFFSETS_SCHEMA,
        VersionedTable,
    )

    t = VersionedTable(spark, str(tmp_path / "offs"), OFFSETS_SCHEMA)
    t.overwrite_rows([("v1", "dat://a", 1)])  # current = v1
    # orphan: a dir at the NEXT version with a stale parquet file,
    # pointer still at v1 (simulates a crashed Spark overwrite)
    orphan = t._snapshot_dir(2)
    t.overwrite(spark.createDataFrame([("stale", "dat://zzz", 99)], OFFSETS_SCHEMA))
    t._set_current(1)  # roll the pointer back: v2 is now an orphan
    assert os.path.isdir(orphan)
    t.overwrite_rows([("v1", "dat://a", 5)])
    assert t.read_rows() == [("v1", "dat://a", 5)]  # no stale merge
    assert t.read().count() == 1


def test_current_is_bucketed_raises_on_missing_snapshot_dir(spark, tmp_path):
    """Pointer set but snapshot directory externally deleted: the
    merge path must fail loudly, not treat the table as empty and
    commit a snapshot holding only the batch's rows (silent data
    loss — r10 advisory)."""
    import shutil

    wh = str(tmp_path / "wh-missing")
    db = MapReduce(spark, wh, entries_buckets=4)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://missing"
    db.append_changes([
        {"origin": origin, "pathname": "/docs/1.json", "version": 1,
         "content": json.dumps({"first": "k1", "second": 1, "third": "t"})}
    ])
    db.index(origin)
    store = db._entries_table("single", origin)
    shutil.rmtree(store._snapshot_dir(store._current()))
    with pytest.raises(FileNotFoundError, match="missing from disk"):
        store.current_is_bucketed()
    # and an index() over new changes surfaces it instead of wiping
    db.append_changes([
        {"origin": origin, "pathname": "/docs/2.json", "version": 2,
         "content": json.dumps({"first": "k2", "second": 2, "third": "t"})}
    ])
    with pytest.raises(Exception):
        db.index(origin)


def _bucket_membership_ok(store):
    """Every parquet file in _b=K holds only rows whose
    crc32(file_url) % n == K — the layout invariant all merge and
    migration paths must preserve."""
    import os
    import zlib

    v = store._current()
    n = store.n_buckets
    for b in range(n):
        d = store._bucket_dir(v, b)
        if not os.path.isdir(d):
            continue
        rows = store.spark.read.schema(store.schema).parquet(d).collect()
        for r in rows:
            assert zlib.crc32(r["file_url"].encode()) % n == b
    return True


def test_rebucket_migration(spark, tmp_path):
    """N->2N bucket-count evolution (r10 verdict #1): rebucket()
    preserves every row and query result, re-pins the layout in the
    NEW snapshot's own meta, keeps old snapshots time-travelable
    under their old count, and merges after the migration are
    incremental against the NEW layout (hardlink proof)."""
    import os
    import zlib

    wh = str(tmp_path / "wh-rebucket")
    db = MapReduce(spark, wh, entries_buckets=4)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://grow"
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(32)
    ])
    db.index(origin)
    store = db._entries_table("single", origin)
    v1 = store._current()
    before = {tuple(r) for r in store.read().collect()}
    assert store.n_buckets == 4

    got = db.rebucket_entries(8, views=["single"], origins=[origin])
    assert got == {store.root: v1 + 1}
    assert store.n_buckets == 8
    assert {tuple(r) for r in store.read().collect()} == before
    assert _bucket_membership_ok(store)
    # old snapshot still time-travels under its old layout
    assert store.read(v1).count() == 32
    # a fresh handle (new engine open) resolves the NEW count from
    # the snapshot meta, not the constructor default
    db2 = MapReduce(spark, wh, entries_buckets=4)
    db2.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    store2 = db2._entries_table("single", origin)
    assert store2.n_buckets == 8

    # merges after the migration: incremental against the NEW layout
    v2 = store._current()

    def inodes(v):
        out = {}
        for b in range(8):
            d = store._bucket_dir(v, b)
            if os.path.isdir(d):
                out[b] = {
                    nm: os.stat(os.path.join(d, nm)).st_ino
                    for nm in os.listdir(d) if nm.endswith(".parquet")
                }
        return out

    pre = inodes(v2)
    url = f"{origin}/docs/7.json"
    hot = zlib.crc32(url.encode()) % 8
    db2.append_changes([
        {"origin": origin, "pathname": "/docs/7.json", "version": 2,
         "content": json.dumps({"first": "k7x", "second": 7, "third": "t"})}
    ])
    db2.index(origin)
    post = inodes(store._current())
    for b, files in pre.items():
        if b == hot:
            assert not (set(files.values()) & set(post.get(b, {}).values()))
        else:
            assert post[b] == files  # hardlinked, not rewritten
    assert db2.get("single", "k7") is None
    assert db2.get("single", "k7x")["value"] == [url]
    assert _bucket_membership_ok(store)


def test_rebucket_crash_leaves_old_layout_current(spark, tmp_path):
    """A mid-migration crash (new snapshot dir partially written, no
    pointer flip) must leave the old snapshot AND its old bucket count
    current; the next merge overwrites the orphan and stays correct."""
    import os

    wh = str(tmp_path / "wh-rebucket-crash")
    db = MapReduce(spark, wh, entries_buckets=4)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://crash"
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(8)
    ])
    db.index(origin)
    store = db._entries_table("single", origin)
    v1 = store._current()
    # simulate the crash: orphan dir at v1+1 with a stale meta claiming
    # a DIFFERENT count, pointer never flipped
    orphan = store._snapshot_dir(v1 + 1)
    os.makedirs(orphan, exist_ok=True)
    store._write_snapshot_meta(orphan, 64)
    assert store._current() == v1
    assert store.n_buckets == 4  # resolved from the CURRENT snapshot
    # next merge commits v1+1 over the orphan, correctly
    db.append_changes([
        {"origin": origin, "pathname": "/docs/2.json", "version": 2,
         "content": json.dumps({"first": "k2x", "second": 2, "third": "t"})}
    ])
    db.index(origin)
    assert store._current() == v1 + 1
    assert store.n_buckets == 4
    assert db.get("single", "k2") is None and db.get("single", "k2x") is not None
    assert store.read().count() == 8
    assert _bucket_membership_ok(store)


def test_compact_auto_rebucket(spark, tmp_path):
    """OPTIMIZE visits every bucket anyway, so bucket-count evolution
    there is free: past the mean-bucket-size threshold, compact lands
    at a doubled count that brings the mean back under it."""
    wh = str(tmp_path / "wh-auto")
    db = MapReduce(spark, wh, entries_buckets=2)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://auto"
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t" * 50})}
        for i in range(24)
    ])
    db.index(origin)
    store = db._entries_table("single", origin)
    before = {tuple(r) for r in store.read().collect()}
    sizes = store.bucket_stats()
    assert sizes and sum(sizes.values()) > 0
    # threshold far below the current mean -> at least one doubling
    thresh = max(1, sum(sizes.values()) // 8)
    pre_mean = sum(sizes.values()) / store.n_buckets
    store.compact(sort_cols=["key_json"], auto_rebucket_bytes=thresh)
    assert store.n_buckets >= 4  # doubled at least once from 2
    # mean bucket size dropped (absolute bounds don't hold at toy
    # scale — parquet footer overhead dominates tiny files)
    assert sum(store.bucket_stats().values()) / store.n_buckets < pre_mean
    assert {tuple(r) for r in store.read().collect()} == before
    assert _bucket_membership_ok(store)
    # and under a generous threshold compact stays at the same count
    n = store.n_buckets
    store.compact(sort_cols=["key_json"], auto_rebucket_bytes=1 << 30)
    assert store.n_buckets == n


def map_pair(content, meta, emit):
    rec = json.loads(content)
    emit(rec["first"], rec["second"])


def test_changelog_expiry_compaction(spark, tmp_path):
    """Changelog retention (r10 verdict #3): rows at or below every
    view's offset collapse to one latest-wins winner per file. The
    rewrite must be invisible to existing views AND to a view defined
    later (winners carry original versions, so a from-zero index over
    the compacted log reconstructs the identical state as full
    history), while actually shrinking the log."""
    wh = str(tmp_path / "wh-expire")
    db = MapReduce(spark, wh, entries_buckets=4)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://retain"
    # 3 update generations for 6 files -> 18 raw CDC rows, plus one
    # deleted file whose tombstone must survive compaction semantics
    for v in (1, 2, 3):
        db.append_changes([
            {"origin": origin, "pathname": f"/docs/{i}.json", "version": v,
             "content": json.dumps({"first": f"k{i}v{v}", "second": i, "third": "t"})}
            for i in range(6)
        ])
    db.append_changes([
        {"origin": origin, "pathname": "/docs/0.json", "version": 4, "type": "del",
         "content": None}
    ])
    db.index(origin)
    state_before = db.list("single")
    assert db.changelog_floors() == {origin: 4}

    n_raw = db.changelog.read().count()
    stats = db.expire_changelog()
    assert stats[origin]["rows_expired"] > 0
    assert stats[origin]["files_removed"] > 0
    n_compact = db.changelog.read().count()
    # 6 winners survive (5 puts + 1 del tombstone), 19 raw rows before
    assert n_raw == 19 and n_compact == 6
    # existing view: state untouched, and new updates still apply
    assert db.list("single") == state_before
    db.append_changes([
        {"origin": origin, "pathname": "/docs/1.json", "version": 5,
         "content": json.dumps({"first": "k1v5", "second": 1, "third": "t"})}
    ])
    db.index(origin)
    assert db.get("single", "k1v3") is None
    assert db.get("single", "k1v5") is not None
    # current_version preserved by the winners' original versions
    assert db.current_version(origin) == 5

    # a view defined AFTER expiry indexes from zero and converges to
    # the same state as the pre-existing view (compaction invisible)
    db.define("late", path="/docs/*.json", map=map_first, key_schema=["string"])
    db.index(origin)
    got = {(r["key"], tuple(r["value"])) for r in db.list("late")}
    want = {(r["key"], tuple(r["value"])) for r in db.list("single")}
    assert got == want


def test_changelog_expiry_floor_guards(spark, tmp_path):
    """Floors: an origin is expirable only when EVERY defined view has
    indexed it (a late-defined view that has not caught up pins the
    floor at 0); expiry under an active stream refuses loudly."""
    wh = str(tmp_path / "wh-floor")
    db = MapReduce(spark, wh, entries_buckets=4)
    db.define("a", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://floored"
    db.append_changes([
        {"origin": origin, "pathname": "/docs/1.json", "version": 1,
         "content": json.dumps({"first": "k1", "second": 1, "third": "t"})}
    ])
    db.index(origin)
    assert db.changelog_floors() == {origin: 1}
    # new view defined, not yet indexed -> floor drops to 0, expiry no-op
    db.define("b", path="/docs/*.json", map=map_first, key_schema=["string"])
    assert db.changelog_floors() == {origin: 0}
    assert db.expire_changelog() == {}
    # after the late view catches up the floor returns
    db.index(origin)
    assert db.changelog_floors() == {origin: 1}
    # active stream -> loud refusal
    q = db.watch_views()  # continuous 500 ms trigger
    try:
        assert q.isActive
        with pytest.raises(RuntimeError, match="active watch stream"):
            db.expire_changelog()
    finally:
        db.close()


def test_changelog_expiry_crash_duplicates_harmless(spark, tmp_path):
    """The swap protocol's crash window leaves duplicate rows (copies
    added, originals not yet deleted). Every consumer goes through
    latest_wins, so the duplicated log must produce the identical
    view state and a later expiry pass cleans it up."""
    wh = str(tmp_path / "wh-dup")
    db = MapReduce(spark, wh, entries_buckets=4)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://dup"
    for v in (1, 2):
        db.append_changes([
            {"origin": origin, "pathname": f"/docs/{i}.json", "version": v,
             "content": json.dumps({"first": f"k{i}v{v}", "second": i, "third": "t"})}
            for i in range(3)
        ])
    db.index(origin)
    state = db.list("single")
    # simulate the crash: stage + rename the compacted copies but
    # KEEP the originals (steps 1-2 of the protocol, no step 3)
    from pyspark.sql import functions as F

    part = db.changelog.read().filter(F.col("origin") == origin)
    from dat_archive_map_reduce_spark.sources.files import latest_wins as _lw

    kept = part.filter(F.col("version") > 2).unionByName(
        _lw(part.filter(F.col("version") <= 2))
    )
    part_dir = db.changelog.partition_dir(origin)
    old_files = set(db.changelog.data_files(part_dir))
    db.changelog.swap_origin_files(origin, kept)
    # re-add "crash survivors": duplicate winner rows next to the copies
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 2,
         "content": json.dumps({"first": f"k{i}v2", "second": i, "third": "t"})}
        for i in range(3)
    ])
    assert db.changelog.read().count() > 3  # duplicates present
    # a fresh engine replaying the duplicated log converges identically
    db2 = MapReduce(spark, wh + "2", entries_buckets=4)
    db2.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    rows = db.changelog.read().collect()
    db2.append_changes([
        {"origin": r["origin"], "pathname": r["pathname"], "version": r["version"],
         "type": r["type"], "content": r["content"]}
        for r in rows
    ])
    db2.index(origin)
    assert db2.list("single") == state
    # and the next expiry pass removes the duplicates
    db.expire_changelog()
    assert db.changelog.read().count() == 3
    assert db.list("single") == state
    del old_files


def test_vacuum_vs_lazy_merge_plan(spark, tmp_path):
    """read_buckets' "resolves NOW" contract meets vacuum (r10 verdict
    #8): a lazy plan pinned to the then-current snapshot must survive
    BOTH a later pointer flip and a keep_last>=2 vacuum running
    between plan construction and materialization — that floor (keep
    current + previous) is exactly what makes the watch cadence safe,
    since every in-batch lazy plan references at worst the previous
    snapshot. keep_last=1 documents the sharp edge: the pinned paths
    are deleted and materialization fails loudly rather than
    returning wrong rows."""
    wh = str(tmp_path / "wh-vac-lazy")
    db = MapReduce(spark, wh, entries_buckets=4)
    db.define("single", path="/docs/*.json", map=map_first, key_schema=["string"])
    origin = "dat://vac"
    db.append_changes([
        {"origin": origin, "pathname": f"/docs/{i}.json", "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(12)
    ])
    db.index(origin)
    store = db._entries_table("single", origin)

    # lazy plan pinned to the CURRENT snapshot's bucket paths
    lazy = store.read_buckets(list(range(store.n_buckets)))
    pinned_version = store._current()
    # a merge flips the pointer past it...
    db.append_changes([
        {"origin": origin, "pathname": "/docs/3.json", "version": 2,
         "content": json.dumps({"first": "k3x", "second": 3, "third": "t"})}
    ])
    db.index(origin)
    assert store._current() == pinned_version + 1
    # ...and a keep_last=2 vacuum runs BEFORE materialization: the
    # pinned (now-previous) snapshot must survive, so the lazy plan
    # still reads the exact pre-merge rows
    db.vacuum(keep_last=2)
    assert pinned_version in store.versions()
    rows = {r["key_json"] for r in lazy.select("key_json").collect()}
    assert '"k3"' in rows and '"k3x"' not in rows  # pre-merge content

    # sharp edge, documented: keep_last=1 deletes the pinned paths and
    # a STILL-LAZY plan must fail loudly, never silently return wrong
    lazy2 = store.read_buckets(list(range(store.n_buckets)))
    v2 = store._current()
    db.append_changes([
        {"origin": origin, "pathname": "/docs/5.json", "version": 3,
         "content": json.dumps({"first": "k5x", "second": 5, "third": "t"})}
    ])
    db.index(origin)
    db.vacuum(keep_last=1)
    assert v2 not in store.versions()
    with pytest.raises(Exception):
        lazy2.select("key_json").collect()


def test_changelog_two_level_layout(spark, tmp_path):
    """hash_levels=1 (r11 verdict #4): the changelog fans out as
    origin_hash=xx/origin=.../ so driver-side per-origin ops list 256
    + origins/256 directory entries instead of one flat million-entry
    dir. Per-origin reads must prune through BOTH levels
    (PartitionFilters carries origin_hash AND origin), engine state
    must equal a flat-layout twin, reopening must adopt the pinned
    layout whatever the constructor says, and retention (expiry's
    partition-dir swap) must work against the nested layout."""
    import hashlib
    import os

    wh = str(tmp_path / "wh-2lvl")
    db = MapReduce(spark, wh, changelog_hash_levels=1)
    db.define("v", path="/d/*.json", map=map_first, key_schema=["string"])
    dbf = MapReduce(spark, str(tmp_path / "wh-flat"))
    dbf.define("v", path="/d/*.json", map=map_first, key_schema=["string"])
    origins = [f"dat://two{i}" for i in range(3)]
    for o in origins:
        for db_ in (db, dbf):
            db_.append_changes([
                {"origin": o, "pathname": "/d/a.json", "version": 1,
                 "content": json.dumps({"first": f"k-{o[-1]}", "second": 1,
                                        "third": "t"})}
            ])
        db.index(o)
        dbf.index(o)
    # on-disk: two directory levels, hash = md5 hex prefix
    top = sorted(d for d in os.listdir(db.changelog.root)
                 if d.startswith("origin_hash="))
    assert top, "expected origin_hash= directories"
    h0 = hashlib.md5(origins[0].encode()).hexdigest()[:2]
    assert f"origin_hash={h0}" in top
    inner = os.listdir(os.path.join(db.changelog.root, f"origin_hash={h0}"))
    assert any(d.startswith("origin=") for d in inner)
    # per-origin scan prunes through BOTH levels
    scan = db.changelog.read_origin(origins[0])
    plan = scan._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:", 1)[1].split("]", 1)[0]
    assert "origin_hash" in pf and "origin#" in pf.replace("origin_hash", "")
    assert scan.count() == 1
    assert db.current_version(origins[0]) == 1
    # engine state identical to the flat twin; no partition column leak
    assert db.list("v") == dbf.list("v")
    assert db.changelog.read().columns == dbf.changelog.read().columns
    # reopen WITHOUT the kwarg: pinned layout adopted from _layout.json
    db2 = MapReduce(spark, wh)
    assert db2.changelog.hash_levels == 1
    db2.define("v", path="/d/*.json", map=map_first, key_schema=["string"])
    db2.append_changes([
        {"origin": origins[0], "pathname": "/d/a.json", "version": 2,
         "content": json.dumps({"first": "k-new", "second": 2, "third": "t"})}
    ])
    db2.index(origins[0])
    assert db2.get("v", "k-new") is not None
    # retention against the nested layout: expiry compacts in place
    got = db2.expire_changelog()
    assert any(origins[0] in k for k in got), got
    assert db2.changelog.read_origin(origins[0]).count() == 1
    db2.index(origins[0])  # still consistent after the swap
    assert db2.get("v", "k-new") is not None


def test_changelog_flat_layout_refuses_hash_upgrade(spark, tmp_path):
    """An existing single-level origin= warehouse must refuse
    hash_levels=1 loudly (in-place migration would interleave two
    directory structures under a live reader)."""
    wh = str(tmp_path / "wh-noup")
    db = MapReduce(spark, wh)
    db.append_changes([
        {"origin": "dat://x", "pathname": "/d/a.json", "version": 1,
         "content": json.dumps({"first": "k", "second": 1, "third": "t"})}
    ])
    with pytest.raises(RuntimeError, match="hash_levels"):
        MapReduce(spark, wh, changelog_hash_levels=1)
    # and the pinned flat layout still opens fine without the flag
    db2 = MapReduce(spark, wh)
    assert db2.changelog.hash_levels == 0


def test_watch_converges_under_two_level_layout(spark, tmp_path):
    """Watch mode over the origin_hash= layout: the stream discovers
    both directory levels, the partition-column leak is normalized
    away, and the drained state equals a batch index."""
    from dat_archive_map_reduce_spark.streaming import watch as W

    db = MapReduce(spark, str(tmp_path / "wh-2s"), changelog_hash_levels=1)
    db.define("v", path="/d/*.json", map=map_first, key_schema=["string"])
    dbb = MapReduce(spark, str(tmp_path / "wh-2b"), changelog_hash_levels=1)
    dbb.define("v", path="/d/*.json", map=map_first, key_schema=["string"])
    rows = [
        {"origin": f"dat://s{i % 3}", "pathname": f"/d/{i}.json",
         "version": 1,
         "content": json.dumps({"first": f"k{i}", "second": i, "third": "t"})}
        for i in range(12)
    ]
    db.append_changes(rows)
    W.watch_until_caught_up(db)
    dbb.append_changes(rows)
    for o in {r["origin"] for r in rows}:
        dbb.index(o)
    assert db.list("v") == dbb.list("v")
    db.close()
    dbb.close()


def test_auto_rebucket_rejects_nonpositive_threshold(spark, tmp_path):
    """auto_rebucket_entries(threshold <= 0) must raise, not loop
    forever doubling new_n on a non-empty shard (total/new_n > 0
    never exits); watch_views validates rebucket_bytes at stream
    setup for the same reason (ADVICE r12)."""
    db = MapReduce(spark, str(tmp_path / "wh-thresh"))
    db.define("v", path="/d/*.json", map=map_first, key_schema=["string"])
    db.index_source("dat://t", [
        {"origin": "dat://t", "pathname": "/d/a.json", "version": 1,
         "content": json.dumps({"first": "k", "second": 1, "third": "t"})}
    ])
    with pytest.raises(ValueError, match="threshold_bytes"):
        db.auto_rebucket_entries(0)
    with pytest.raises(ValueError, match="threshold_bytes"):
        db.auto_rebucket_entries(-5)
    with pytest.raises(ValueError, match="rebucket_bytes"):
        db.watch_views(rebucket_every=1, rebucket_bytes=0)
    db.close()
