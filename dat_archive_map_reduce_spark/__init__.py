"""dat_archive_map_reduce_spark — a PySpark-native incremental map-reduce
view engine with the query and data-processing capabilities of
``beakerbrowser/dat-archive-map-reduce`` (reference: /root/reference, v1).

The reference is a CouchDB-style incremental map-reduce view engine over
versioned file collections (Dat archives): users define views as
(path-glob, map UDF with emit(key, value), optional reduce fold), the
engine incrementally indexes file change logs into a sorted KV store and
serves point ``get`` and range ``list`` queries
(/root/reference/index.js:96-141, lib/indexer.js:121-179).

This package re-expresses that model Spark-first:

- source corpus     -> DataFrame of file records with (origin, pathname,
                       url, version, type, content) columns
- map (emit UDTF)   -> native Column expressions when possible, else an
                       Arrow-batched mapInPandas adapter
- reduce (fold)     -> groupBy().agg() with built-in aggregates, or a
                       deterministic sorted F.aggregate fold
- entries store     -> Parquet tables, sorted within partitions by key
- get/list          -> predicate-pushdown filter + ORDER BY + LIMIT
- watch mode        -> Structured Streaming with foreachBatch upsert
- incremental index -> changelog latest-wins compaction + offsets table

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from dat_archive_map_reduce_spark.session import get_spark, stop_spark
from dat_archive_map_reduce_spark.plans.view_def import ViewDefinition, validate_view_def
from dat_archive_map_reduce_spark.errors import SchemaError, SourceNotFoundError
from dat_archive_map_reduce_spark.engine import MapReduce

__all__ = [
    "get_spark",
    "stop_spark",
    "ViewDefinition",
    "validate_view_def",
    "SchemaError",
    "SourceNotFoundError",
    "MapReduce",
]

__version__ = "0.1.0"
