"""Interleaved old-commit-vs-HEAD A/B bench — the variance protocol's
final arbiter for suspected per-query regressions.

Single-run bench deltas on this host swing 0.886x-1.43x with load
(documented r10), so a regression call needs paired samples taken
close together in time: this script materializes the old commit in a
git worktree and ALTERNATES old/new measurement processes (A B A B
...), so slow host phases hit both sides equally. Each process is a
fresh JVM that warms the query once (cold compile excluded) and
reports the median of 3 warm runs; the verdict compares the medians
of the per-round medians.

Usage:
    python tools/ab_bench.py <old_commit> <query> [<query> ...]
        [--rounds N] [--sf-dir DIR]

Prints one JSON line per (round, side, query) and a final verdict
table. Run SOLO (no concurrent Spark work), like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, statistics, sys, time
from dat_archive_map_reduce_spark.session import get_spark
from dat_archive_map_reduce_spark.queries import QUERIES

sf = sys.argv[1]
names = sys.argv[2:]
spark = get_spark("ab")
out = {}
for name in names:
    fn = QUERIES[name]
    fn(spark, sf).count()  # cold run: codegen + footer warmup
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, sf).count()
        runs.append(time.perf_counter() - t0)
    out[name] = round(statistics.median(runs), 4)
    spark.catalog.clearCache()
print("ABRESULT " + json.dumps(out))
"""


def run_side(tree: str, sf_dir: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ, PYTHONPATH=tree)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, sf_dir, *names],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"no ABRESULT from {tree}: rc={p.returncode}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_commit")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    wt = f"/tmp/ab-{args.old_commit[:10]}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.old_commit],
            cwd=REPO,
            check=True,
        )
    results: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in args.queries
    }
    for rnd in range(args.rounds):
        for side, tree in (("old", wt), ("new", REPO)):
            try:
                la = os.getloadavg()[0]
            except OSError:
                la = -1.0
            got = run_side(tree, args.sf_dir, args.queries)
            for q, sec in got.items():
                results[q][side].append(sec)
            print(
                json.dumps(
                    {"round": rnd, "side": side, "loadavg1": round(la, 2), **got}
                ),
                flush=True,
            )
    print("\n== verdict (median of per-process warm medians) ==")
    for q in args.queries:
        old = statistics.median(results[q]["old"])
        new = statistics.median(results[q]["new"])
        ratio = new / old if old else float("inf")
        call = "NOISE" if ratio < 1.25 else ("REGRESSION" if ratio >= 1.5 else "GRAY")
        print(f"{q}: old={old:.3f}s new={new:.3f}s ratio={ratio:.3f} -> {call}")


if __name__ == "__main__":
    main()
