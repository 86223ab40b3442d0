"""Tests for the scale patterns: salted join / two-phase agg
equivalence, and bucketed tables joining without a shuffle."""

import pytest
from pyspark.sql import functions as F

from dat_archive_map_reduce_spark.operators.skew import salted_join, two_phase_agg
from dat_archive_map_reduce_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def test_salted_join_equals_plain_join(spark, events):
    """Salted equi-join must produce exactly the rows of the plain
    join (here: per-event join to a per-user dim)."""
    dim = events.groupBy("user_id").agg(F.avg("value").alias("user_avg"))
    plain = (
        events.join(dim, "user_id")
        .select("event_id", F.round("user_avg", 6).alias("user_avg"))
    )
    salted = salted_join(
        events, dim, on="user_id", salt=4, uniquifier=F.col("event_id")
    ).select("event_id", F.round("user_avg", 6).alias("user_avg"))
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_two_phase_agg_collect_list(spark, events):
    """Salted collect_list merge must carry every element exactly once
    (order-insensitive compare)."""
    got = two_phase_agg(
        events,
        "user_id",
        partial_aggs=[F.collect_list("event_id").alias("part")],
        merge_aggs=[F.flatten(F.collect_list("part")).alias("ids")],
        salt=4,
        uniquifier=F.col("event_id"),
    ).select("user_id", F.array_sort("ids").alias("ids"))
    expected = (
        events.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("event_id")).alias("ids"))
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables bucketed+sorted on the join key must sort-merge-join with
    ZERO Exchange nodes — the co-located join strategy for repeated
    fact-to-fact joins at scale."""
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .saveAsTable("b_lineitem")
    )
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually computes the right thing
        assert joined.count() == lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    """Hive-partitioned parquet sink: a filter on the partition column
    must prune at planning time (PartitionFilters), scanning only the
    matching directory — the layout views use for per-origin shards."""
    events = load_table(spark, SF, "events")
    out = str(tmp_path / "by_type")
    (
        events.write.partitionBy("event_type")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    assert back.count() == events.filter(F.col("event_type") == "click").count()


def test_versioned_table_time_travel_and_vacuum(spark, tmp_path):
    """Copy-on-write snapshots: every overwrite is a new immutable
    version readable by number (time travel); vacuum trims history but
    never the current snapshot."""
    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.plans.catalog import VersionedTable

    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    t = VersionedTable(spark, str(tmp_path / "t"), schema)
    for gen in range(3):
        t.overwrite(spark.range(gen + 1).select(F.col("id").alias("x")))
    assert t.versions() == [1, 2, 3]
    assert t.read().count() == 3
    assert t.read(version=1).count() == 1
    assert t.read(version=2).count() == 2
    removed = t.vacuum(keep_last=2)
    assert removed == [1]
    assert t.versions() == [2, 3]
    assert t.read().count() == 3
    with pytest.raises(FileNotFoundError):
        t.read(version=1)


def test_exact_global_ntile_matches_window_ntile(spark, events):
    """exact_global_ntile must reproduce Spark's own global-window
    ntile bit-for-bit (tie-broken total order), including uneven tile
    sizes (remainder rows go to the earliest tiles)."""
    from pyspark.sql import Window

    from dat_archive_map_reduce_spark.operators.ranking import exact_global_ntile

    df = events.select("event_id", "value").filter(F.col("value").isNotNull())
    w = Window.orderBy(F.desc("value"), F.asc("event_id"))
    expected = df.select(
        "event_id", F.ntile(7).over(w).alias("tile")
    )
    got = exact_global_ntile(
        df, "value", 7, descending=True, tie_breakers=[F.asc("event_id")]
    ).select("event_id", "tile")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_exact_global_ntile_fewer_rows_than_tiles(spark):
    """q = 0 edge: with total < n_tiles, row at position p gets tile p
    (SQL NTILE semantics); the CASE guard keeps ANSI mode from a
    divide-by-zero."""
    from dat_archive_map_reduce_spark.operators.ranking import exact_global_ntile

    df = spark.createDataFrame([(1, 10.0), (2, 5.0), (3, 7.5)], "id int, v double")
    rows = exact_global_ntile(df, "v", 8, tie_breakers=[F.asc("id")]).collect()
    by_id = {r["id"]: r["tile"] for r in rows}
    assert by_id == {2: 1, 3: 2, 1: 3}  # ascending v order


def test_exact_global_ntile_plan_has_no_global_window(spark, events):
    """The big-side WindowExec must be partitioned (by bucket) — the
    whole point is avoiding the single-partition global sort window."""
    import io
    from contextlib import redirect_stdout

    from dat_archive_map_reduce_spark.operators.ranking import exact_global_ntile

    df = events.select("event_id", "value")
    got = exact_global_ntile(
        df, "value", 4, tie_breakers=[F.asc("event_id")]
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    # a global-window sort would funnel everything through an
    # "Exchange SinglePartition"; both windows here are partitioned
    # (__gr_bucket on the fact side, the lit(0) constant on the
    # bucket-counts side)
    assert "Exchange SinglePartition" not in plan
    assert "__gr_bucket" in plan


def test_salted_partial_composition_stable_across_partitioning(spark, events):
    """Default salt must derive from row payload, not partition layout:
    the multiset of per-salt partial counts per key is identical no
    matter how the input is partitioned (retry/re-run determinism)."""
    from dat_archive_map_reduce_spark.operators.skew import two_phase_agg

    df = events.select("user_id", "value")

    def partial_profile(d):
        out = two_phase_agg(
            d, "user_id",
            partial_aggs=[F.count(F.lit(1)).alias("part")],
            merge_aggs=[F.sort_array(F.collect_list("part")).alias("parts")],
            salt=8,
        )
        return {r["user_id"]: r["parts"] for r in out.collect()}

    a = partial_profile(df.repartition(3))
    b = partial_profile(df.repartition(17, "value"))
    assert a == b


def test_salted_join_rejects_right_full(spark, events):
    from dat_archive_map_reduce_spark.operators.skew import salted_join

    df = events.select("user_id", "value")
    with pytest.raises(ValueError, match="inner.*left|duplicate"):
        salted_join(df, df, on="user_id", how="right")


def test_exact_global_cumsum_correct_and_distributed(spark, events):
    """Exclusive running sum matches the single-partition window's
    answer while the plan keeps every window partitioned."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import Window

    from dat_archive_map_reduce_spark.operators.ranking import exact_global_cumsum

    df = events.select("event_id", "value").limit(2000)
    got = exact_global_cumsum(df, "event_id", "value", cumsum_col="run")
    want = df.withColumn(
        "run",
        F.coalesce(
            F.sum("value").over(
                Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0.0),
        ),
    )
    g = {r.event_id: r.run for r in got.collect()}
    w = {r.event_id: r.run for r in want.collect()}
    assert set(g) == set(w)
    assert all(abs(g[k] - w[k]) < 1e-6 for k in g)

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange SinglePartition" not in plan
    assert "__gr_bucket" in plan


def test_versioned_table_compact_merges_small_files(spark, tmp_path):
    """Many small appends -> one compacted sorted snapshot: fewer
    files, identical content, pre-compaction version still readable
    (copy-on-write), and the rewrite is range-clustered by the sort
    key so min/max stats prune key-range scans."""
    import glob as pyglob

    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.plans.catalog import VersionedTable

    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    t = VersionedTable(spark, str(tmp_path / "t"), schema)
    t.overwrite(spark.range(0, 10).select(F.col("id").alias("x")))
    for lo in range(10, 100, 10):
        t.append(spark.range(lo, lo + 10).select(F.col("id").alias("x")))
    v_before = t.versions()[-1]
    files_before = pyglob.glob(f"{t._snapshot_dir(v_before)}/*.parquet")
    assert len(files_before) >= 10  # one-plus file per append

    v_new = t.compact(sort_cols=["x"])
    files_after = pyglob.glob(f"{t._snapshot_dir(v_new)}/*.parquet")
    assert len(files_after) < len(files_before)
    got = sorted(r.x for r in t.read().collect())
    assert got == list(range(100))
    # time travel to the pre-compaction snapshot still works
    assert t.read(version=v_before).count() == 100


def test_zorder_compaction_prunes_on_second_column(spark, tmp_path):
    """Z-order layout: parquet min/max stats must prune files for a
    predicate on the SECOND clustered column, where a linear sort on
    the first column cannot skip anything (every file spans all y)."""
    import glob as pyglob

    import pyarrow.parquet as pq

    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.plans.catalog import VersionedTable

    def files_containing(snapshot_dir: str, col: str, val: int) -> tuple[int, int]:
        paths = pyglob.glob(f"{snapshot_dir}/*.parquet")
        hit = 0
        for p in paths:
            md = pq.ParquetFile(p).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            if lo <= val <= hi:
                hit += 1
        return hit, len(paths)

    grid = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / F.lit(64)).cast("long").alias("y")
    )
    schema = T.StructType(
        [T.StructField("x", T.LongType(), False), T.StructField("y", T.LongType(), False)]
    )

    linear = VersionedTable(spark, str(tmp_path / "linear"), schema)
    linear.overwrite(grid)
    v_lin = linear.compact(sort_cols=["x", "y"], target_file_bytes=1 << 10)
    zord = VersionedTable(spark, str(tmp_path / "zord"), schema)
    zord.overwrite(grid)
    v_z = zord.compact(sort_cols=["x", "y"], target_file_bytes=1 << 10, zorder=True)

    lin_hit, lin_total = files_containing(linear._snapshot_dir(v_lin), "y", 7)
    z_hit, z_total = files_containing(zord._snapshot_dir(v_z), "y", 7)
    assert lin_total >= 8 and z_total >= 8  # enough files for pruning to matter
    assert lin_hit == lin_total  # linear x-sort: every file spans all y
    assert z_hit <= z_total // 2  # z-order: most files exclude y=7
    # and content survives the rewrite
    assert zord.read().count() == 64 * 64


def test_shuffle_hash_join_hint_avoids_sort(spark, events):
    """When a dim is too big to broadcast but one side fits a hash
    table per partition, the shuffle_hash hint picks ShuffledHashJoin
    — skipping both sides' sorts that sort-merge would pay. The
    contract: the hint is honored (Spark may silently fall back)."""
    import io
    from contextlib import redirect_stdout

    fact = events.select("user_id", "value")
    dim = events.select("user_id").distinct().withColumn("w", F.lit(1))
    joined = fact.join(dim.hint("shuffle_hash"), "user_id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "ShuffledHashJoin" in plan
    assert joined.count() > 0


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """When the broadcast path is off (sides too big at scale), Spark
    can still inject a BLOOM-FILTER runtime filter: the selective dim
    side's join keys build a bloom filter that pre-filters the fact
    scan before the shuffle — the 100 TB answer to 'shuffle join with
    a selective dim'. Assert the optimizer actually injects it
    (might_contain on the fact side) under explicit thresholds, so a
    Spark upgrade or conf regression that silently drops the filter
    fails here."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        l = load_table(spark, "/root/testdata/sf0.01", "lineitem")
        o = load_table(spark, "/root/testdata/sf0.01", "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloomfilter" in plan or "might_contain" in plan
        assert j.count() == 1
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_versioned_table_schema_evolution_add_column(spark, tmp_path):
    """ADD COLUMN evolution contract: a handle opened with the widened
    schema reads new snapshots fully and time-travels into
    pre-evolution snapshots with the added column backfilled as NULL —
    the lakehouse add-column semantics (schema-on-read projection over
    immutable snapshot dirs; no rewrite of history)."""
    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.plans.catalog import VersionedTable

    root = str(tmp_path / "tbl")
    v1_schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("a", T.StringType())]
    )
    t1 = VersionedTable(spark, root, v1_schema)
    t1.overwrite(spark.createDataFrame([(1, "x"), (2, "y")], v1_schema))

    v2_schema = v1_schema.add(T.StructField("b", T.LongType()))
    t2 = VersionedTable(spark, root, v2_schema)
    t2.overwrite(spark.createDataFrame([(1, "x", 10), (3, "z", 30)], v2_schema))

    cur = {r["k"]: (r["a"], r["b"]) for r in t2.read().collect()}
    assert cur == {1: ("x", 10), 3: ("z", 30)}
    old = {r["k"]: (r["a"], r["b"]) for r in t2.read(version=1).collect()}
    assert old == {1: ("x", None), 2: ("y", None)}
    # a pre-evolution handle still reads its own schema from history
    assert sorted(r["a"] for r in t1.read(version=1).collect()) == ["x", "y"]


def test_versioned_table_merge_upsert_and_delete(spark, tmp_path):
    """MERGE upsert: matched keys update, unmatched insert, others
    carry over — as a new copy-on-write snapshot with the previous
    version still time-travel readable. DELETE writes a snapshot
    without the matching rows and reports the count."""
    from pyspark.sql import types as T

    from dat_archive_map_reduce_spark.plans.catalog import VersionedTable

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    t = VersionedTable(spark, str(tmp_path / "t"), schema)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema))
    v1 = t.versions()[-1]

    t.merge_upsert(
        spark.createDataFrame([(2, "B"), (4, "d")], schema), key_cols=["k"]
    )
    now = {r["k"]: r["val"] for r in t.read().collect()}
    assert now == {1: "a", 2: "B", 3: "c", 4: "d"}
    # snapshot isolation: version 1 still serves the pre-merge rows
    old = {r["k"]: r["val"] for r in t.read(version=v1).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}

    from pyspark.sql import functions as F

    n = t.delete_where(F.col("k") % 2 == 0)
    assert n == 2
    assert {r["k"] for r in t.read().collect()} == {1, 3}


def test_versioned_table_diff_change_data_feed(spark, tmp_path):
    """diff(v1, v2) must classify inserts/deletes (row-valued) and,
    keyed, split changed keys into update_pre/update_post — the CDF a
    downstream incremental consumer replays."""
    from pyspark.sql import types as T
    from pyspark.sql import functions as F

    from dat_archive_map_reduce_spark.plans.catalog import VersionedTable

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("val", T.StringType(), True),
        ]
    )
    t = VersionedTable(spark, str(tmp_path / "t"), schema)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema))
    v1 = t.versions()[-1]
    t.merge_upsert(spark.createDataFrame([(2, "B"), (4, "d")], schema), key_cols=["k"])
    t.delete_where(F.col("k") == 3)
    v3 = t.versions()[-1]

    rowdiff = {(r["k"], r["val"], r["_change"]) for r in t.diff(v1, v3).collect()}
    assert rowdiff == {
        (2, "B", "insert"), (4, "d", "insert"),
        (2, "b", "delete"), (3, "c", "delete"),
    }

    keyed = {(r["k"], r["val"], r["_change"]) for r in
             t.diff(v1, v3, key_cols=["k"]).collect()}
    assert keyed == {
        (4, "d", "insert"),
        (3, "c", "delete"),
        (2, "b", "update_pre"), (2, "B", "update_post"),
    }
    # no-op diff is empty
    assert t.diff(v3, v3).count() == 0
