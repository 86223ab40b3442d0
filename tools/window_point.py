"""Isolated windowed-stream measurement — the bench's event-time
windowed-aggregation section (8-file source, 2 files per trigger,
foreachBatch complete-mode sink) in a fresh process with nothing else
in the JVM. Role: A/B probe for window_rows_per_sec swings, NOT the
headline protocol (bench.py measures it after the maintain benches in
a warm, loaded JVM — see README's maintain-protocol note; the same
cold-vs-in-process caveat applies here).

Usage: python tools/window_point.py [--sf DIR]
Prints one JSON line {"window_wall_sec": ..., "window_rows_per_sec": ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dat_archive_map_reduce_spark.session import get_spark
from dat_archive_map_reduce_spark.sources.tables import load_table
from dat_archive_map_reduce_spark.streaming.watch import windowed_counts


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("window-point")
    root = tempfile.mkdtemp(prefix="winpt-")
    try:
        ev = load_table(spark, sf_dir, "events")
        src, ckpt, sink = f"{root}/ev-src", f"{root}/ev-ckpt", f"{root}/ev-out"
        ev.repartition(8).write.parquet(src)
        n_events = ev.count()
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        agg = windowed_counts(stream, window="1 hour", streaming=True)
        batches: list[int] = []

        def _sink(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(sink)
            batches.append(batch_id)

        t0 = time.perf_counter()
        q = (
            agg.writeStream.foreachBatch(_sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "window_rows": n_events,
                    "window_batches": len(batches),
                    "window_wall_sec": round(wall, 4),
                    "window_rows_per_sec": round(n_events / wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
