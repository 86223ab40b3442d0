"""Round-15 (optimization): the multi-action persist family.

The rank scaffold's cut-point collect and the 1-row totals broadcast
builds are separate Spark ACTIONS, so 13 stat queries now lazily
persist the reduced rollup they all read (guide §5/§1.2-1 — without
the cache each extra action re-ran the fact-rollup lineage). These
tests pin the two load-bearing contracts of that change:

- `_dense_daily_counts(cached=True)` returns the SAME rows as the
  uncached form and actually carries a storage level (the lazy
  persist), while the default stays uncached — single-action callers
  must not pay a cache they can't use.
- the persisting queries release their intermediates: after the
  query's own eager_release materialization, running the returned
  DataFrame leaves no fact-sized persists behind beyond the
  caller-owned result cache (the eager_release ownership convention).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_dense_daily_counts_cached_matches_uncached(spark):
    from dat_archive_map_reduce_spark.queries import _dense_daily_counts

    plain = _dense_daily_counts(spark, SF, with_totals=True)
    # the default stays uncached (single-action callers share the
    # duplicated daily subtree via exchange reuse inside one plan).
    # Checked BEFORE the cached twin exists: storageLevel consults the
    # CacheManager by plan equality, so the twin's persist would alias
    # onto this handle afterwards.
    assert not plain.storageLevel.useMemory
    rows_p = sorted(map(tuple, plain.collect()))
    cached = _dense_daily_counts(spark, SF, with_totals=True, cached=True)
    try:
        # the opt-in form is a LAZY persist: a storage level before any
        # action (no eager materialization wave)
        assert cached.storageLevel.useMemory
        rows_c = sorted(map(tuple, cached.collect()))
        assert rows_p == rows_c and len(rows_p) > 0
    finally:
        cached.unpersist()


@pytest.mark.parametrize(
    "name",
    [
        "events_cuped_adjustment",
        "events_kruskal_wallis",
        "events_ks_two_sample",
        "eval_roc_auc",
        "events_lorenz_gini",
        "corpus_pack_chunks",
        "agg_weighted_percentiles",
        "events_cusum_changepoint",
    ],
)
def test_persisting_queries_release_intermediates(spark, name):
    """Build + run each persisting query, then assert the only cache
    entries left alive are result-sized (the eager_release contract:
    intermediates are unpersisted inside the query function)."""
    from dat_archive_map_reduce_spark.queries import QUERIES

    spark.catalog.clearCache()
    df = QUERIES[name](spark, SF)
    n = df.count()
    assert n > 0
    jsc = spark.sparkContext._jsc.sc()
    # persistentRdds holds every cached RDD with materialized blocks;
    # after eager_release only the caller-owned result cache (and the
    # blocks backing it) may remain — nothing fact-scan-sized. The
    # sf0.001 fact tables are ~1-10k rows, results <= a few hundred;
    # a leaked fact-rollup would hold >= one block per shuffle
    # partition. Cheap structural proxy: every surviving cached RDD
    # belongs to the returned result's lineage, so dropping the result
    # empties the cache entirely.
    df.unpersist()
    # capture BEFORE clearCache: clearCache would sweep a leaked
    # intermediate itself and make this assertion unfalsifiable
    remaining = jsc.getPersistentRDDs().size()
    spark.catalog.clearCache()  # teardown only
    assert remaining == 0
