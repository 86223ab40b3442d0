"""Structured source formats beyond Parquet: JSON-lines, CSV, and
whole-file text — the standard lakehouse ingestion formats.

The reference reads opaque file blobs and leaves parsing to the map
UDF (/root/reference/lib/indexer.js:221, README.md:22 JSON.parse);
Spark-first, we instead read structured formats straight into typed
DataFrames so Catalyst can prune/push down — the map-UDF route stays
available via sources/files.read_directory_corpus for truly opaque
content.

Always pass an explicit schema in production: schema inference runs a
full extra scan of the data (at 100 TB, an extra 100 TB read) and can
silently widen types between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_jsonl", "read_csv", "read_orc", "write_orc"]


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    glob: str | None = None,
) -> DataFrame:
    """Newline-delimited JSON. Without ``schema``, inference scans the
    data once extra — fine for tests, wrong at scale."""
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    glob: str | None = None,
) -> DataFrame:
    """CSV with header; explicit schema strongly preferred (CSV has no
    embedded types, so inference must scan AND guess)."""
    reader = spark.read.option("header", str(header).lower())
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    glob: str | None = None,
) -> DataFrame:
    """ORC — the other columnar lakehouse format Spark reads natively;
    same predicate-pushdown and column-pruning behavior as parquet."""
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
