"""Per-query job-count + wall profiler — optimization-round diagnostic.

For each named query: one warm-up execution, then a measured execution
run inside its own job group so the Spark status tracker can count the
jobs the query's actions launched (every job is one driver-side action
wave: approxQuantile pre-passes, iterative-loop rounds, persists,
first()/collect() fetches). Queries that pay many jobs are the ones
whose steady time is dominated by action-loop fixed costs rather than
by any single plan.

Usage:
    python tools/profile_query.py <query> [...] [--sf DIR] [--runs N]
Prints one line per query: warm wall (median of N), job count, and the
job descriptions seen.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dat_archive_map_reduce_spark.queries import QUERIES
from dat_archive_map_reduce_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    if not args:
        print(__doc__)
        sys.exit(2)
    spark = get_spark("profile")
    sc = spark.sparkContext
    for name in args:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()  # warm (bench's cold slot)
        cold = time.perf_counter() - t0
        walls, jobs = [], 0
        # NO clearCache between runs — bench.py clears only after a
        # query's 3 runs, so steady-state runs see the prior run's
        # persists exactly like this
        for r in range(runs):
            group = f"prof-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        spark.catalog.clearCache()
        print(
            f"{name}: cold={cold:.3f}s warm={statistics.median(walls):.3f}s "
            f"(min={min(walls):.3f} max={max(walls):.3f}) jobs={jobs}"
        )


if __name__ == "__main__":
    main()
