"""Loaders for the synthetic test tables (/root/repo/TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst gets column
pruning + predicate pushdown for free; never cache here — callers decide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # Defensive shim for TIMESTAMP(NANOS) events data (earlier
        # testdata generations used it; current files store micros and
        # read as TIMESTAMP_NTZ, making this a no-op). If nanos come
        # back, Spark's vectorized reader rejects them outright: read
        # nanos as raw int64 (legacy conf) and convert to a micros
        # timestamp exactly the way DuckDB's reader does (integer
        # truncation) so oracle values match.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            # Integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed the
            # 2^53 exact-double range, so float division rounds the low
            # microseconds and the oracle hash diverges by ±1 µs.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
