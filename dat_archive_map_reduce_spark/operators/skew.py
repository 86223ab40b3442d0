"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most runtime skew
by splitting oversized partitions, but two cases still need explicit
salting at 100 TB:

* a shuffle join where ONE key holds a double-digit percentage of the
  fact side (AQE splits the partition, but every split still collides
  with the same dim row — replication is the fix, not splitting);
* holistic aggregations (collect_list, exact percentile) where partial
  aggregation cannot combine map-side, so one hot group lands on one
  reducer.

Both helpers are deterministic (salt derived by hashing a uniquifier
column, never rand()) so re-runs and retried tasks produce identical
results — the same reason the engine's map adapter orders emits by
(file_url, emit_seq).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "two_phase_agg"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    uniquifier: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `left[on]` is heavily skewed and `right` is too
    large to broadcast: spread each hot left key over `salt` shuffle
    partitions, replicating right rows salt times.

    left rows get salt_id = xxhash64(uniquifier) % salt (deterministic
    spread); right rows are exploded to all salt ids. The join key
    becomes (on, salt_id): a key that formerly hashed to one reducer
    now hashes to `salt` of them. Shuffle volume grows by |right|×salt
    — the explicit price of levelling; pick salt ≈ hot-key share ×
    parallelism.

    ``uniquifier`` defaults to a hash over ALL left columns — derived
    from row payload, so retried tasks salt identically regardless of
    partition layout (monotonically_increasing_id would not). Pass an
    explicit id/row-number column when available; payload hashing puts
    exact-duplicate rows in the same salt bucket, which is correct but
    levels slightly worse when duplicates dominate.

    Only 'inner' and 'left' are valid: under 'right'/'full', unmatched
    right rows survive in ALL `salt` replicas and would duplicate.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (right/full would "
            f"duplicate unmatched right rows across salts), got {how!r}"
        )
    uniq = uniquifier if uniquifier is not None else F.xxhash64(*left.columns)
    l_s = left.withColumn("_salt", F.pmod(F.xxhash64(uniq), F.lit(salt)).cast("int"))
    r_s = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = l_s.join(r_s, [on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str | Sequence[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salt: int = 16,
    uniquifier: Column | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation for holistic aggregates.

    Phase 1 groups by (key, salt) — hot groups split across `salt`
    reducers; phase 2 merges the partials per key. The caller supplies
    both phases because holistic merges are agg-specific, e.g.::

        two_phase_agg(events, "user_id",
            partial_aggs=[F.collect_list("value").alias("part")],
            merge_aggs=[F.flatten(F.collect_list("part")).alias("values")])

    For algebraic aggs (sum/count/min/max) Spark's own map-side partial
    aggregation already does this — use plain groupBy there.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # payload-derived default salt: reproducible across partitionings
    # and task retries (see salted_join)
    uniq = uniquifier if uniquifier is not None else F.xxhash64(*df.columns)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(uniq), F.lit(salt)).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)
