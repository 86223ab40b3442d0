"""Temporal join operators Spark lacks as built-ins: as-of join and
banned/binned range join.

The reference engine has no joins at all (SURVEY.md §2.2 — its
cross-site views are per-key partitions, /root/reference/README.md
"cross-site" examples); these are part of the standard relational
surface the new engine ships. Both are implemented as compositions of
existing DataFrame ops — no UDFs, fully codegen-able — using the two
standard distributed formulations:

* as-of join: union + ordered window `last(ignorenulls)` — one shuffle
  on the join key, linear in rows, no range-join row explosion. This
  is how you do "attribute each purchase to the user's last preceding
  click" on 100 TB: the alternative (equi-join on user then filter
  ts-range then window) materializes |L|x|R| per key first.
* range join: bin the time axis so the theta condition becomes an
  equi-join on (key, bin) with a residual filter — candidate pairs
  are only those within one bin-width, not the full per-key cross
  product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_binned"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: dict[str, str] | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join with full pandas ``merge_asof`` semantics: for every
    left row, the single matching right row within the same ``on`` key
    group —

    * ``direction='backward'`` (default): greatest ``right_ts <=
      left_ts`` (inclusive);
    * ``direction='forward'``: smallest ``right_ts >= left_ts``
      (inclusive);
    * ``direction='nearest'``: whichever of the two is closer in time
      (tie -> backward, pandas behavior).

    ``tolerance`` (seconds for timestamp axes, same units as the
    column for numeric axes) drops matches farther than that from the
    left row's time.

    Formulation: tag and union both sides, sort each key partition by
    (ts, side), and carry the right payload across with
    ``last(ignorenulls)`` over an unbounded-preceding frame (backward)
    and/or ``first(ignorenulls)`` over a following frame (forward) —
    for 'nearest' both frames share the ONE sort and exchange, so
    every direction costs one shuffle, one sort, and no pair
    materialization; an inequality join would square where this stays
    linear.

    ``right_cols`` maps right column -> output alias; defaults to
    ``{right_ts: "asof_" + right_ts}``. ``how`` is 'inner' (drop left
    rows with no match) or 'left'.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    if right_cols is None:
        right_cols = {right_ts: f"asof_{right_ts}"}
    out_aliases = list(right_cols.values())

    from pyspark.sql import types as T

    def _axis(col: Column, dt) -> Column:
        # common numeric event-time axis for distance/tolerance math;
        # NTZ casts through TIMESTAMP (session tz is pinned UTC).
        # Unsupported axis types (e.g. string timestamps — fine for the
        # ordering-only backward path) must fail loudly: a silent
        # cast('double') would null the axis and drop every
        # tolerance/nearest match.
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return F.unix_micros(col.cast("timestamp")) / 1e6
        if isinstance(dt, T.NumericType):
            return col.cast("double")
        raise TypeError(
            f"asof_join tolerance/direction math needs a timestamp/date/"
            f"numeric event-time column, got {dt.simpleString()}"
        )

    # Side ordering at equal timestamps decides inclusivity: for the
    # backward (and nearest) carry, right rows sort FIRST so the
    # unbounded-preceding last() sees an equal-ts right row (inclusive
    # right_ts <= left_ts); for pure forward, right rows sort AFTER the
    # left row so the following-frame first() sees them (inclusive
    # right_ts >= left_ts). In 'nearest', equal-ts rights are therefore
    # strictly-future to the forward frame — harmless, the backward
    # carry already holds them at distance 0 and wins the tie.
    #
    # The whole right payload rides in ONE struct with a constant _m
    # marker, for two reasons: (a) a matched-but-NULL payload value must
    # not read as "no match" (the struct is non-null even when every
    # payload field is null), and (b) last(ignorenulls) over separate
    # columns could stitch the output from DIFFERENT right rows when
    # payload values are null; over the struct it is all-or-nothing.
    # The struct's _t field is the numeric event-time axis used for
    # tolerance / nearest-distance math.
    l_side, r_side = (0, 1) if direction == "forward" else (1, 0)
    r_dt = right.schema[right_ts].dataType
    # the numeric axis is only needed for distance math; without it the
    # join is ordering-only, so any orderable ts type (incl. strings)
    # keeps working and _t/_lt are constant placeholders
    need_axis = tolerance is not None or direction == "nearest"
    r_axis = _axis(F.col(right_ts), r_dt) if need_axis else F.lit(0.0)
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.struct(
            F.lit(True).alias("_m"),
            r_axis.alias("_t"),
            *[F.col(src).alias(dst) for src, dst in right_cols.items()],
        ).alias("_rpay"),
    )
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
    )
    l_tag = l_tag.withColumn("_rpay", F.lit(None).cast(r_tag.schema["_rpay"].dataType))
    r_tag = r_tag.withColumn("_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType))
    # _rpay as the final sort key makes ties among right rows with equal
    # (key, ts) deterministic (backward takes the struct-greatest
    # payload, forward the struct-least), independent of partitioning
    # or task retries.
    base = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rpay").asc())
    )
    unioned = l_tag.unionByName(r_tag)
    carries = ["_side", "_lrow"]
    if direction in ("backward", "nearest"):
        carries.append(
            F.last("_rpay", ignorenulls=True)
            .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("_bpay")
        )
    if direction in ("forward", "nearest"):
        carries.append(
            F.first("_rpay", ignorenulls=True)
            .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
            .alias("_fpay")
        )
    # the axis expression evaluates over the UNION-coerced _ts column,
    # so classify by the unioned schema's dtype, not the pre-union
    # left type: with mixed ts families (date+timestamp, int+double)
    # the coercion widens _ts and the pre-union classification could
    # silently pick the wrong conversion, skewing tolerance/nearest
    # distances
    lt = (
        _axis(F.col("_ts"), unioned.schema["_ts"].dataType)
        if need_axis
        else F.lit(0.0)
    )
    matched = unioned.select(*carries, lt.alias("_lt")).filter(
        F.col("_side") == l_side
    )
    bpay = F.col("_bpay") if direction in ("backward", "nearest") else None
    fpay = F.col("_fpay") if direction in ("forward", "nearest") else None
    if tolerance is not None:
        tol = float(tolerance)
        if bpay is not None:
            bpay = F.when(F.col("_lt") - bpay["_t"] <= tol, bpay)
        if fpay is not None:
            fpay = F.when(fpay["_t"] - F.col("_lt") <= tol, fpay)
    if direction == "backward":
        pay = bpay
    elif direction == "forward":
        pay = fpay
    else:  # nearest: closer side wins, tie -> backward (pandas)
        pay = (
            F.when(bpay.isNull(), fpay)
            .when(fpay.isNull(), bpay)
            .when(fpay["_t"] - F.col("_lt") < F.col("_lt") - bpay["_t"], fpay)
            .otherwise(bpay)
        )
    out = matched.withColumn("_pay", pay)
    if how == "inner":
        out = out.filter(F.col("_pay").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join how must be 'inner' or 'left', got {how!r}")
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_pay.{dst}").alias(dst) for dst in out_aliases],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: int = 0,
    upper_seconds: int = 86400,
    bin_seconds: int | None = None,
) -> DataFrame:
    """Interval join: pair (l, r) where ``l.key == r.key`` and
    ``l_ts + lower < r_ts <= l_ts + upper`` — e.g. "events by the same
    user within the day after".

    Each left row is exploded to the (few) time bins its window
    covers; each right row lives in exactly one bin; the theta
    condition becomes an equi-join on (key, bin) plus a residual
    filter. Candidate pairs are bounded by bin co-residency instead of
    the full per-key cross product, so the shuffle carries
    O(|L| * windows/bin + |R|) rows — the standard way to keep an
    interval join from quadratic blowup when keys are hot.

    Output: all left columns (as ``l_<name>``) + all right columns
    (as ``r_<name>``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if bin_seconds is None:
        bin_seconds = max(upper_seconds - lower_seconds, 1)

    # integer MICROSECONDS end-to-end: unix_timestamp() truncates to
    # seconds, which silently drops sub-second pairs at the strict
    # lower bound (an anchor and a follower inside the same second
    # compare 26 > 26 and vanish — caught by the first full-registry
    # sf0.1 gate, where same-second event pairs first appear)
    bin_us = F.lit(int(bin_seconds) * 1_000_000)
    l_epoch = F.unix_micros(F.col(left_ts).cast("timestamp"))
    lo = l_epoch + F.lit(int(lower_seconds) * 1_000_000)
    hi = l_epoch + F.lit(int(upper_seconds) * 1_000_000)
    l_bins = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        lo.alias("_lo"),
        hi.alias("_hi"),
        F.explode(
            F.sequence(
                F.floor(lo / bin_us).cast("long"),
                F.floor(hi / bin_us).cast("long"),
            )
        ).alias("_bin"),
    )
    r_bins = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_rts"),
    ).withColumn("_bin", F.floor(F.col("_rts") / bin_us).cast("long"))

    # equi-condition on (keys..., bin) so the hash/SMJ shuffle
    # partitions on the full compound key, not the bin alone
    cond: Column = l_bins["_bin"] == r_bins["_bin"]
    for k in keys:
        cond = cond & (F.col(f"l_{k}") == F.col(f"r_{k}"))
    return (
        l_bins.join(r_bins, cond)
        .filter((F.col("_rts") > F.col("_lo")) & (F.col("_rts") <= F.col("_hi")))
        .drop("_bin", "_lo", "_hi", "_rts")
    )
