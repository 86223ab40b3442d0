"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input so a compute-heavy stage
    (Pandas UDF, per-row hashing, explode of long arrays) uses every
    core.

    Single-file / single-row-group parquet arrives as ONE scan
    partition regardless of core count — any Arrow/Python stage chained
    on it runs serially. A real 100 TB table never has this problem
    (thousands of splits), so the repartition only fires when the input
    has fewer partitions than the session's parallelism; the shuffle it
    inserts moves exactly the operator's input columns, which callers
    should have pruned first.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def eager_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Materialize ``result`` into its own cache, then release the fat
    intermediate persists it was built from.

    Operators that persist mid-pipeline relations (shingle sets,
    minhash/simhash signatures, candidate lists) call this on their
    final output so the GB-scale intermediates never outlive the
    operator call — previously they leaked until something swept the
    whole cache, evicting legitimately shared blocks along with them.
    The caller owns only the returned result's cache, which for every
    dedup operator is the verified pair list (rows ~ true-duplicate
    density, orders of magnitude smaller than the corpus); unpersist
    it whenever.
    """
    out = result.persist()
    out.count()
    for df in intermediates:
        df.unpersist()
    return out
