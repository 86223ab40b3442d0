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

__all__ = ["read_jsonl", "read_csv", "read_orc", "write_orc", "read_fixed_width", "write_fixed_width"]


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


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """XML via Spark 4's NATIVE xml source (the spark-xml package
    folded into core): one record per ``row_tag`` element, schema
    inferred (attributes become ``_attr`` columns) or supplied.
    Feed-style enterprise inputs (sitemaps, RSS/Atom, SOAP dumps)
    land in the same DataFrame pipeline as every other source.

    Scale note: like JSON/CSV, schema inference is an extra pass —
    pass ``schema`` in production; files split per-file (a single
    giant XML document does not parallelize within the file)."""
    reader = spark.read.option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.xml(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).option("rowTag", row_tag).option(
        "rootTag", root_tag
    ).xml(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
    trim: bool = True,
) -> DataFrame:
    """Fixed-width records (COBOL extracts, mainframe feeds, printf
    logs): one `spark.read.text` scan + native substring/cast
    projections per column — no Python, splittable, and column
    PRUNING still applies (unused substrings fold away at the
    projection). ``colspecs`` = (name, start, length, type) with
    1-based start, types as Spark DDL strings ("int", "double",
    "string", ...). Numeric casts treat whitespace-only fields as
    NULL (ANSI-safe trim-then-nullif).
    """
    from pyspark.sql import functions as F

    df = spark.read.text(path)
    cols = []
    for name, start, length, dtype in colspecs:
        raw = F.substring(F.col("value"), start, length)
        c = F.trim(raw) if trim else raw
        if dtype != "string":
            c = F.nullif(F.trim(raw), F.lit("")).cast(dtype)
        cols.append(c.alias(name))
    return df.select(*cols)


def write_fixed_width(
    df: DataFrame, path: str, widths: list[int], mode: str = "overwrite"
) -> None:
    """Render every column left-padded to its width and write as one
    text column — the inverse of read_fixed_width, for round-trip
    tests and legacy-feed producers. Values must fit their widths
    (asserted per row with raise_error, so truncation can never
    corrupt a feed silently)."""
    from pyspark.sql import functions as F

    parts = []
    for (name, w) in zip(df.columns, widths):
        s = F.col(name).cast("string")
        guarded = F.when(
            F.length(s) > w,
            F.raise_error(
                F.concat(F.lit(f"value too wide for {name}({w}): "), s)
            ),
        ).otherwise(F.rpad(s, w, " "))
        parts.append(guarded)
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)


def read_json_multiline(
    spark: SparkSession, path: str, glob: str | None = None, schema=None
):
    """Whole-file JSON documents (a single object or a top-level ARRAY
    per file), as opposed to read_jsonl's record-per-line framing.

    Scale caveat, the mirror of the gzip-JSONL one: multiLine JSON is
    NOT splittable — each file parses as one unit on one task, so
    parallelism = file count. Fine for config/manifest ingestion
    (many small files); for bulk data, convert to JSONL or parquet at
    the edge. Pass an explicit schema in production — inference reads
    every byte twice.
    """
    reader = spark.read.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = None,
    sep: str = ",",
) -> None:
    """CSV sink with header + optional codec (gzip produces the
    non-splittable-but-interchange-friendly export shape; leave None
    for splittable plain text)."""
    writer = df.write.mode(mode).option("header", str(header).lower()).option("sep", sep)
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)
