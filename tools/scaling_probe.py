"""Scaling-exponent probe for the expensive query tail (r12 verdict #8).

Times the costliest registry queries at sf0.01 AND sf0.1 (10x the
data), fits the scaling exponent per query —

    exponent = log10(t_01 / t_001)        (data grew 10x)

— and flags anything super-linear. The per-query fixed overhead
(session, plan, scheduling: ~0.2-0.5 s) dominates small-SF timings, so
the exponent is computed on OVERHEAD-ADJUSTED times: each SF's floor
is estimated as the median wall of the three cheapest registry probes
run at that SF, and subtracted. An exponent near 1.0 means linear
scaling (what a single-pass plan should give); >SUPERLINEAR_AT after
adjustment is flagged for plan review. Queries whose adjusted time at
either SF is under MIN_ADJ_SEC are reported as "too cheap to fit"
rather than fitted (a 0.1 s residual fits garbage).

Usage:
    python tools/scaling_probe.py [--out SCALING_PROBE.json] [query ...]

Default query set: the 5 most expensive from the last committed
BENCH_full_local.json plus any names passed on the CLI.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/testdata/sf0.01"
BIG = "/root/testdata/sf0.1"
SUPERLINEAR_AT = 1.3  # adjusted exponent above this flags the query
MIN_ADJ_SEC = 0.25
# cheap single-scan probes used to estimate the per-query fixed floor
FLOOR_PROBES = ("view_map_entries", "view_reduce_count", "cdc_latest_wins")


def _time_query(qfn, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        qfn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = "SCALING_PROBE.json"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--out":
            out_path = sys.argv[1:][i + 1]
            args = [x for x in args if x != out_path]

    from dat_archive_map_reduce_spark.queries import QUERIES
    from dat_archive_map_reduce_spark.session import get_spark

    names = list(args)
    if not names:
        try:
            with open("BENCH_full_local.json") as f:
                bench = json.load(f)
            names = [
                n
                for n, _ in sorted(
                    bench.get("queries", {}).items(),
                    key=lambda kv: -kv[1],
                )[:5]
            ]
        except (OSError, json.JSONDecodeError):
            names = []
    names = [n for n in names if n in QUERIES]
    if not names:
        print("no queries to probe", file=sys.stderr)
        return 2

    spark = get_spark("scaling-probe")
    floors = {}
    for sf in (SMALL, BIG):
        walls = sorted(_time_query(QUERIES[p], spark, sf) for p in FLOOR_PROBES)
        floors[sf] = walls[len(walls) // 2]

    result = {
        "sf_small": SMALL,
        "sf_big": BIG,
        "floor_sec": {sf: round(v, 4) for sf, v in floors.items()},
        "superlinear_at": SUPERLINEAR_AT,
        "queries": {},
        "flagged": [],
    }
    for name in names:
        t_s = _time_query(QUERIES[name], spark, SMALL)
        t_b = _time_query(QUERIES[name], spark, BIG)
        adj_s = max(t_s - floors[SMALL], 0.0)
        adj_b = max(t_b - floors[BIG], 0.0)
        entry = {
            "sec_small": round(t_s, 4),
            "sec_big": round(t_b, 4),
            "adj_small": round(adj_s, 4),
            "adj_big": round(adj_b, 4),
        }
        if adj_s < MIN_ADJ_SEC or adj_b < MIN_ADJ_SEC:
            entry["exponent"] = None
            entry["verdict"] = "too_cheap_to_fit"
        else:
            exp = math.log10(adj_b / adj_s)
            entry["exponent"] = round(exp, 3)
            entry["verdict"] = (
                "superlinear" if exp > SUPERLINEAR_AT else "ok"
            )
            if exp > SUPERLINEAR_AT:
                result["flagged"].append(name)
        result["queries"][name] = entry
        print(f"{name}: {entry}", file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
