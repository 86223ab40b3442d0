"""Z-order (Morton) clustering — multi-column data layout for pruning.

A single-key sort gives parquet min/max pruning on ONE column: every
file spans the full range of every other column, so predicates on
those never skip a file. Interleaving the bits of several columns'
bucket ranks orders rows along a space-filling curve; each file then
covers a small hyper-rectangle, and min/max stats prune scans on ANY
of the clustered columns. This is the OPTIMIZE ZORDER BY of lakehouse
engines, built from native expressions:

1. bucket each column into 2^bits ranks by approxQuantile cut points
   (mergeable sketch, one pass — same machinery as operators/ranking);
2. interleave the rank bits into one long (pure bit arithmetic,
   whole-stage codegen);
3. range-partition + sort by the key at write time.

Everything is a deterministic pure-row function of the data, so the
layout is reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ZKEY = "__zorder_key"


def _bucket_rank(col: str, bounds: list[float]) -> Column:
    """0-based bucket index of ``col`` under sorted cut points."""
    c = F.col(col)
    rank = F.lit(0)
    for b in bounds:
        rank = rank + F.when(c > F.lit(b), F.lit(1)).otherwise(F.lit(0))
    return rank.cast("long")


def interleave_bits(rank_cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` bits of each rank column."""
    n = len(rank_cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(rank_cols):
            bit = F.shiftrightunsigned(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    quantile_err: float = 0.01,
    key_col: str = _ZKEY,
) -> DataFrame:
    """Add the Z-order key for ``cols`` (numeric, non-null). ``bits``
    buckets per column = 2^bits; 8 is plenty — pruning granularity is
    files, not rows, so finer ranks buy nothing once files are small
    hyper-rectangles."""
    n_buckets = 1 << bits
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    ranks = []
    for c in cols:
        bounds = sorted(set(df.stat.approxQuantile(c, fracs, quantile_err)))
        ranks.append(_bucket_rank(c, bounds))
    return df.withColumn(key_col, interleave_bits(ranks, bits))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> DataFrame:
    """Rows arranged for writing: range-partitioned and sorted by the
    Z-key so each output file covers a compact hyper-rectangle of the
    clustered columns. Drop-in for the sort step of a compaction."""
    keyed = with_zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(n_files, _ZKEY)
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
    )
