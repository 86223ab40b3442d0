"""Named, oracle-checkable queries — the engine's operator inventory
exercised over the synthetic tables (/root/repo/TESTDATA.md).

Every entry here is registered with BOTH a PySpark DataFrame builder and
an equivalent ANSI-SQL string for the DuckDB oracle (driver contract in
/root/repo/__spark_entry__.py). Column names are aliased identically on
both sides; double-valued aggregates are rounded to a fixed precision on
both sides so value-hashes are insensitive to summation order.

Organization mirrors SURVEY.md §2: the reference's own view-engine
contract recast onto the `events` table, then the standard relational
surface, then the LLM-pipeline extensions (dedup / similarity / text).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dat_archive_map_reduce_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =====================================================================
# A. Reference view-engine contract recast on `events`
#    (map/emit, reduce folds, get/list semantics — SURVEY.md §2.1)
# =====================================================================

@query(
    "flagship_recent_per_key",
    oracle="""
    SELECT event_type, ts, event_id, user_id
    FROM (
      SELECT event_type, ts, event_id, user_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 5
    """,
)
def flagship_recent_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference README's canonical use-case — 'the N most
    recent posts per site' (/root/reference/README.md:41-53: compound
    key [origin, timestamp], reverse=true, limit=N) — recast as
    'the 5 most recent events per event_type'.

    Spark-first: one window + row_number, no self-join, no collect.
    The window shuffles once on the partition key; at 100 TB the same
    plan holds (hash-partition by event_type, sort within partition).
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "ts", "event_id", "user_id")
    )


@query(
    "view_map_entries",
    oracle="""
    SELECT event_type AS k0, ts AS k1, event_id AS value, 'events' AS file_url
    FROM events
    WHERE value >= 10.0
    """,
)
def view_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map/emit contract as a native plan: emit([event_type, ts],
    event_id) for qualifying rows (filter+project+key-shaping — the
    0/1-emit cases of /root/reference/lib/indexer.js:228-239)."""
    e = _t(spark, sf_dir, "events")
    return e.filter(F.col("value") >= 10.0).select(
        F.col("event_type").alias("k0"),
        F.col("ts").alias("k1"),
        F.col("event_id").alias("value"),
        F.lit("events").alias("file_url"),
    )


@query(
    "view_reduce_count",
    oracle="""
    SELECT event_type AS key, count(*) AS value
    FROM events GROUP BY event_type
    """,
)
def view_reduce_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's canonical reduce `(acc||0)+1`
    (/root/reference/README.md:66-68) IS F.count — lowered to a native
    partial-aggregating groupBy, not a Python fold."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(F.col("event_type").alias("key")).agg(F.count(F.lit(1)).alias("value"))


@query(
    "view_list_range",
    oracle="""
    SELECT event_type AS k0, ts AS k1, event_id AS value
    FROM events
    WHERE event_type >= 'click' AND event_type < 'purchase'
    ORDER BY k0 DESC, k1 DESC, value DESC
    LIMIT 100
    """,
)
def view_list_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list({gte, lt, reverse, limit}) on a compound typed key —
    range predicate + ORDER BY DESC + LIMIT lowers to Spark's
    TakeOrderedAndProject (reference lib/util-level.js:76-84)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter((F.col("event_type") >= "click") & (F.col("event_type") < "purchase"))
        .select(
            F.col("event_type").alias("k0"),
            F.col("ts").alias("k1"),
            F.col("event_id").alias("value"),
        )
        .orderBy(F.desc("k0"), F.desc("k1"), F.desc("value"))
        .limit(100)
    )


@query(
    "view_get_multimap",
    oracle="""
    SELECT user_id AS key, count(*) AS n_values, min(event_id) AS first_value
    FROM events
    WHERE user_id = 7
    GROUP BY user_id
    """,
)
def view_get_multimap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point get() on a mapped view: all values at one key
    (multimap semantics, /root/reference/lib/view.js:51-61) —
    summarized as count+min so the hash is order-insensitive."""
    e = _t(spark, sf_dir, "events")
    return (
        e.filter(F.col("user_id") == 7)
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_values"), F.min("event_id").alias("first_value"))
    )


@query(
    "cdc_latest_wins",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def cdc_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog latest-wins compaction (reference
    scanArchiveHistoryForUpdates, lib/indexer.js:355-368): keep only the
    newest record per key before any downstream processing."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@query(
    "map_json_schema_on_read",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    """,
)
def map_json_schema_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON parsing inside map (the reference's
    JSON.parse at README.md:22) — native get_json_object, no Python."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select("event_id", F.get_json_object("props", "$.k").cast("long").alias("k"))
        .filter(F.col("k") >= 50)
    )


# =====================================================================
# B. Relational surface (SURVEY.md §2.2) over the TPC-H-ish tables
# =====================================================================

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: multi-aggregate groupBy with
    arithmetic inside the aggregate — all JVM-side, map-side partials."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
