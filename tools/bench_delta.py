"""Round-close bench adjudication helper (README checklist step 6):
compare a fresh bench JSON against a prior round's committed
BENCH_full_local.json — shared-query steady aggregate ratio, the
worst per-query swings, and the streaming section deltas. Pure JSON;
run it after bench.py, before writing the round log.

Usage: python tools/bench_delta.py <old.json> <new.json> [--top N]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=8)
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    os_, ns = old["queries_steady"], new["queries_steady"]
    shared = sorted(set(os_) & set(ns))
    to, tn = sum(os_[q] for q in shared), sum(ns[q] for q in shared)
    print(
        f"shared queries: {len(shared)}  steady total: "
        f"{to:.1f} -> {tn:.1f} s  ratio {tn / to:.3f}"
    )
    only_new = sorted(set(ns) - set(os_))
    if only_new:
        print(f"new-only queries ({len(only_new)}): {', '.join(only_new)}")
    swings = sorted(
        ((ns[q] / os_[q] if os_[q] else float('inf'), q) for q in shared),
        reverse=True,
    )
    print(f"\nworst {args.top} slowdowns (steady ratio, old -> new):")
    for r, q in swings[: args.top]:
        print(f"  {q}: {r:.2f}x  ({os_[q]:.2f} -> {ns[q]:.2f} s)")
    print(f"\nbest {args.top} speedups:")
    for r, q in swings[-args.top:][::-1]:
        print(f"  {q}: {r:.2f}x  ({os_[q]:.2f} -> {ns[q]:.2f} s)")
    so, sn = old.get("streaming", {}), new.get("streaming", {})
    print("\nstreaming:")
    for k in sorted(set(so) & set(sn)):
        vo, vn = so[k], sn[k]
        if isinstance(vo, (int, float)) and isinstance(vn, (int, float)) and vo:
            print(f"  {k}: {vo} -> {vn}  ({vn / vo:.2f}x)")
    for k in sorted(set(sn) - set(so)):
        print(f"  NEW {k}: {json.dumps(sn[k])}")
    lf_o = old.get("load_fingerprint", {})
    lf_n = new.get("load_fingerprint", {})
    print(f"\nload fingerprints: old={lf_o} new={lf_n}")


if __name__ == "__main__":
    main()
