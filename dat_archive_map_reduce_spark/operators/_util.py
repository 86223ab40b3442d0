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
    reads fewer FILES than the session's parallelism; the shuffle it
    inserts moves exactly the operator's input columns, which callers
    should have pruned first.

    The guard reads ``df.inputFiles()`` — pure driver-side scan
    metadata. It must NOT consult ``df.rdd`` (the pre-r15 form):
    converting to an RDD finalizes the AQE plan, which EXECUTES every
    upstream query stage eagerly — for a fan_out fed by a join that
    ran the join once for the probe and again for the real plan
    (measured 3.6 s vs 0.03 s for the metadata probe on a broadcast
    semi-join input at sf0.1).
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        # no file-based source below (local relation, stream) — the
        # repartition is tiny for the former and the latter never
        # routes through fan_out
        pass
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
    try:
        out.count()
    except BaseException:
        # the materialize failed: drop the result's (unmaterialized)
        # storage level too, so nothing from this call outlives it
        out.unpersist()
        raise
    finally:
        # release the intermediates on success AND failure — without
        # this a failed count() leaked them for the session lifetime
        for df in intermediates:
            df.unpersist()
    return out
