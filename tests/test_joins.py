"""Tests for the temporal join operators (operators/joins.py):
as-of join tie/boundary semantics and range-join bin correctness —
checked against tiny hand-computed fixtures plus a brute-force
cross-join reference on real data."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dat_archive_map_reduce_spark.operators.joins import asof_join, range_join_binned

SF = "/root/testdata/sf0.001"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    from dat_archive_map_reduce_spark.sources.tables import load_table

    return load_table(spark, SF, "events").cache()


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),  # after r at 09:00 -> matches 09:00
            (1, _ts("2024-01-01T09:00:00"), "p2"),  # EQUAL ts -> inclusive match
            (1, _ts("2024-01-01T08:00:00"), "p3"),  # before all right rows -> no match
            (2, _ts("2024-01-01T12:00:00"), "p4"),  # key with no right rows
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 10.0),
            (1, _ts("2024-01-01T09:30:00"), 20.0),
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        r["tag"]: (r["click_ts"], r["click_value"])
        for r in asof_join(
            left, right, on="user_id",
            right_cols={"ts": "click_ts", "value": "click_value"}, how="left",
        ).collect()
    }
    assert out["p1"] == (_ts("2024-01-01T09:30:00"), 20.0)
    assert out["p2"] == (_ts("2024-01-01T09:00:00"), 10.0)  # inclusive >=
    assert out["p3"] == (None, None)
    assert out["p4"] == (None, None)
    inner = asof_join(
        left, right, on="user_id",
        right_cols={"ts": "click_ts"}, how="inner",
    )
    assert {r["tag"] for r in inner.collect()} == {"p1", "p2"}


def test_asof_matches_bruteforce_on_events(events):
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    got = asof_join(
        purchases, clicks, on="user_id", right_cols={"ts": "click_ts"}, how="inner"
    ).select("event_id", "click_ts")
    brute = (
        purchases.alias("p")
        .join(
            clicks.alias("c"),
            (F.col("p.user_id") == F.col("c.user_id")) & (F.col("p.ts") >= F.col("c.ts")),
        )
        .groupBy(F.col("p.event_id").alias("event_id"))
        .agg(F.max(F.col("c.ts")).alias("click_ts"))
    )
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0


def test_range_join_matches_bruteforce(events):
    e = events.select("event_id", "user_id", "ts", "value")
    got = (
        range_join_binned(
            e.select("event_id", "user_id", "ts"),
            e.select("user_id", "ts", "value"),
            on="user_id",
            upper_seconds=3600,
            bin_seconds=600,  # deliberately much smaller than the window
        )
        .groupBy("l_event_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    brute = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy(F.col("a.event_id").alias("l_event_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.exceptAll(brute).count() == 0
    assert brute.exceptAll(got).count() == 0


def test_range_join_no_dup_across_bins(spark):
    """A right row on a bin boundary must pair exactly once."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 100)], "user_id int, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:10:00"), 1),   # inside
            (1, _ts("2024-01-01T01:00:00"), 2),   # exactly at upper bound -> inclusive
            (1, _ts("2024-01-01T01:00:01"), 3),   # just past -> excluded
            (1, _ts("2024-01-01T00:00:00"), 4),   # equal to left ts -> excluded (strict >)
        ],
        "user_id int, ts timestamp, rid int",
    )
    out = range_join_binned(
        left, right, on="user_id", upper_seconds=3600, bin_seconds=600
    )
    assert sorted(r["r_rid"] for r in out.collect()) == [1, 2]


def test_asof_null_payload_is_a_match(spark):
    """A matched right row whose payload value is legitimately NULL must
    be kept under how='inner' and must NOT be replaced by an older
    right row's non-null value."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1")],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T08:00:00"), 5.0),   # older, non-null
            (1, _ts("2024-01-01T09:00:00"), None),  # newest match, NULL payload
        ],
        "user_id int, ts timestamp, value double",
    )
    rows = asof_join(
        left, right, on="user_id",
        right_cols={"ts": "click_ts", "value": "click_value"}, how="inner",
    ).collect()
    assert len(rows) == 1
    assert rows[0]["click_ts"] == _ts("2024-01-01T09:00:00")
    assert rows[0]["click_value"] is None  # not 5.0 stitched from the older row


def test_asof_equal_ts_tie_is_deterministic(spark):
    """Multiple right rows at the SAME (key, ts): the winner must be
    stable across arbitrary input partitionings."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1")],
        "user_id int, ts timestamp, tag string",
    )
    right_rows = [(1, _ts("2024-01-01T09:00:00"), float(v)) for v in (7, 3, 9, 1)]
    results = set()
    for parts in (1, 2, 7):
        right = spark.createDataFrame(
            right_rows, "user_id int, ts timestamp, value double"
        ).repartition(parts)
        out = asof_join(
            left, right, on="user_id",
            right_cols={"value": "click_value"}, how="inner",
        ).collect()
        results.add(out[0]["click_value"])
    assert len(results) == 1


def test_asof_rejects_unknown_how(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"))], "user_id int, ts timestamp")
    with pytest.raises(ValueError, match="inner.*left"):
        asof_join(left, left, on="user_id", how="full")


def test_asof_join_matches_pandas_merge_asof(spark):
    """Every (direction, tolerance, how) combination must reproduce
    pandas merge_asof exactly on randomized keyed event data —
    including inclusive equal-ts matches and nearest's backward tie."""
    import random

    import pandas as pd

    from dat_archive_map_reduce_spark.operators.joins import asof_join

    rng = random.Random(7)
    left_rows = [
        (k, float(rng.randint(0, 120)), i)
        for i, k in enumerate(rng.choices(["a", "b", "c"], k=120))
    ]
    right_rows = [
        (k, float(rng.randint(0, 120)), 1000 + i)
        for i, k in enumerate(rng.choices(["a", "b", "c"], k=80))
    ]
    # unique (key, ts) on the right so the match is uniquely defined
    seen = set()
    right_rows = [
        r for r in right_rows if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    ldf = spark.createDataFrame(left_rows, "k string, t double, lid long")
    rdf = spark.createDataFrame(right_rows, "k string, t double, rid long")
    lpd = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "t", "rid"]).sort_values("t", kind="stable")

    for direction in ["backward", "forward", "nearest"]:
        for tol in [None, 10.0]:
            got_df = asof_join(
                ldf, rdf, on="k", left_ts="t", right_ts="t",
                right_cols={"rid": "rid"}, how="left",
                direction=direction, tolerance=tol,
            )
            got = {r["lid"]: r["rid"] for r in got_df.collect()}
            want_pd = pd.merge_asof(
                lpd, rpd, on="t", by="k", direction=direction, tolerance=tol,
            )
            want = {
                int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                for r in want_pd.itertuples()
            }
            assert got == want, f"direction={direction} tol={tol}"


def test_asof_join_string_ts_backward_still_works_and_axis_raises(spark):
    """Ordering-only backward joins keep working on orderable string
    timestamps; asking for tolerance/nearest on them raises loudly
    instead of silently nulling the axis."""
    import pytest

    from dat_archive_map_reduce_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1)], "k string, t string, lid long")
    rdf = spark.createDataFrame(
        [("a", "2024-01-01 09:00:00", 10)], "k string, t string, rid long")
    out = asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                    right_cols={"rid": "rid"}, how="left").collect()
    assert out[0]["rid"] == 10
    with pytest.raises(TypeError, match="timestamp/date/numeric"):
        asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                  right_cols={"rid": "rid"}, direction="nearest")
