"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Run: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dat_archive_map_reduce_spark.queries import QUERIES
from dat_archive_map_reduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("bench")
    # Steady-state warmup so per-query timings measure the query, not
    # one-time session costs: JVM + parquet footers, the events-table
    # nanos shim, whole-stage codegen compilation, and the Python
    # worker daemon pool (forked on first Arrow UDF use).
    from pyspark.sql import functions as F

    from dat_archive_map_reduce_spark.sources.tables import load_table

    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    ev = load_table(spark, SF_DIR, "events")
    ev.groupBy("event_type").agg(F.count(F.lit(1))).count()
    ev.limit(32).mapInPandas(lambda it: it, schema=ev.schema).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()  # force full execution
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
