"""Independent pure-Python references for the round-11 statistics
queries: each test recomputes the statistic from the sf0.001 parquet
with plain pandas/numpy sequential code — a SECOND oracle besides the
DuckDB SQL replay, immune to any shared-SQL-dialect blind spot (both
engines agreeing on a wrong formula would still fail here)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from dat_archive_map_reduce_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def _daily_dense(events_pdf: pd.DataFrame) -> np.ndarray:
    ev = events_pdf[events_pdf["ts"].notna()]
    days = (ev["ts"].values.astype("datetime64[D]")).astype("int64")
    lo, hi = days.min(), days.max()
    counts = np.zeros(hi - lo + 1, dtype=np.int64)
    for d in days:
        counts[d - lo] += 1
    return counts


def test_mann_kendall_matches_python(spark, events_pdf):
    xs = _daily_dense(events_pdf)
    n = len(xs)
    s = sum(
        int(np.sign(xs[j] - xs[i]))
        for i in range(n)
        for j in range(i + 1, n)
    )
    _, tie_counts = np.unique(xs, return_counts=True)
    tie_sum = int(sum(t * (t - 1) * (2 * t + 5) for t in tie_counts))
    var18 = n * (n - 1) * (2 * n + 5) - tie_sum
    row = QUERIES["events_mann_kendall"](spark, SF).collect()[0]
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert row["var18"] == var18
    if var18 > 0:
        sd = math.sqrt(var18 / 18.0)
        z = (s - 1) / sd if s > 0 else (s + 1) / sd if s < 0 else 0.0
        assert abs(row["z_stat"] - z) < 1e-6
    else:
        assert row["z_stat"] is None


def test_holt_linear_matches_python(spark, events_pdf):
    xs = _daily_dense(events_pdf).astype(float)
    l, b = xs[0], 0.0
    for y in xs[1:]:
        nl = 0.5 * y + 0.5 * (l + b)
        nb = 0.25 * (0.5 * y + 0.5 * (l + b) - l) + 0.75 * b
        l, b = nl, nb
    row = QUERIES["events_holt_linear"](spark, SF).collect()[0]
    assert row["n_days"] == len(xs)
    assert abs(row["level"] - l) < 1e-5
    assert abs(row["trend"] - b) < 1e-5
    assert abs(row["forecast_7"] - (l + 7 * b)) < 1e-5


def test_gini_matches_python(spark, events_pdf):
    x = np.sort(
        events_pdf.groupby("user_id").size().values.astype(np.int64)
    )
    n, t = len(x), int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    gnum = int(((2 * i - n - 1) * x).sum())
    row = QUERIES["events_lorenz_gini"](spark, SF).collect()[0]
    assert row["n_users"] == n
    assert row["total_events"] == t
    assert row["gini_num"] == gnum
    assert abs(row["gini"] - gnum / (n * t)) < 1e-5


def test_survival_km_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["ts"].notna()]
    days = ev["ts"].values.astype("datetime64[D]").astype("int64")
    pu = pd.DataFrame({"u": ev["user_id"].values, "d": days}).groupby("u")[
        "d"
    ]
    f, l = pu.min(), pu.max()
    m = int(l.max())
    span = (l - f).astype(int)
    dead = (l <= m - 1).astype(int)
    # sequential reference mirroring the query's micro-log recipe
    rows = []
    at_risk = len(span)
    cum_micro = 0
    hit_zero = False
    for t in sorted(span.unique()):
        d_t = int(dead[span == t].sum())
        c_all = int((span == t).sum())
        if d_t > 0:
            if d_t >= at_risk:
                hit_zero = True
            else:
                cum_micro += round(1e6 * math.log(1 - d_t / at_risk))
            s = 0.0 if hit_zero else math.exp(cum_micro / 1e6)
            rows.append((t, at_risk, d_t, s))
        at_risk -= c_all
    got = sorted(
        (
            (r["span_days"], r["n_at_risk"], r["n_deaths"], r["s_cum"])
            for r in QUERIES["events_survival_km"](spark, SF).collect()
        )
    )
    assert len(got) == len(rows)
    for (gt, gn, gd, gs), (rt, rn, rd, rs) in zip(got, rows):
        assert (gt, gn, gd) == (rt, rn, rd)
        assert abs(gs - rs) < 1e-3


def test_pr_auc_matches_sklearn_style_python(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb[emb["embedding"].notna() & emb["label"].notna()]
    score = emb["embedding"].map(lambda v: float(v[0])).values
    pos = (emb["label"].values == 0).astype(int)
    order = np.argsort(-score, kind="stable")
    score, pos = score[order], pos[order]
    # group by distinct score (descending), step AP
    ap = 0.0
    tp = fp = 0
    i = 0
    n = len(score)
    while i < n:
        j = i
        p = c = 0
        while j < n and score[j] == score[i]:
            p += pos[j]
            c += 1
            j += 1
        tp += p
        fp += c - p
        ap += p * tp / (tp + fp)
        i = j
    n_pos = int(pos.sum())
    row = QUERIES["eval_pr_auc"](spark, SF).collect()[0]
    assert row["n_pos"] == n_pos
    assert abs(row["avg_precision"] - ap / n_pos) < 1e-4


def test_attribution_position_credit_sums_to_conversions(spark, events_pdf):
    """Every converting user with a non-empty path distributes EXACTLY
    one unit of credit (up to the documented nano-rounding of middle
    shares), so total credit == number of credited paths."""
    out = QUERIES["events_attribution_position"](spark, SF).collect()
    total_credit = sum(r["credit"] for r in out)
    ev = events_pdf
    conv = ev[ev["event_type"] == "purchase"].groupby("user_id")["ts"].min()
    n_paths = 0
    for u, cts in conv.items():
        pre = ev[
            (ev["user_id"] == u)
            & (ev["ts"] < cts)
            & (ev["event_type"] != "purchase")
        ]
        if len(pre):
            n_paths += 1
    assert abs(total_credit - n_paths) < 1e-3 * max(n_paths, 1)


def test_calibration_and_brier_match_python(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb[emb["embedding"].notna() & emb["label"].notna()]
    score = emb["embedding"].map(lambda v: float(v[0])).values
    pos = (emb["label"].values == 0).astype(int)
    lo, hi = score.min(), score.max()
    bins = np.minimum(((score - lo) / (hi - lo) * 10).astype(int), 9)
    rows = {
        r["bin"]: r
        for r in QUERIES["eval_calibration_ece"](spark, SF).collect()
    }
    for b in np.unique(bins):
        m = bins == b
        assert rows[int(b)]["n"] == int(m.sum())
        assert rows[int(b)]["n_pos"] == int(pos[m].sum())
        assert abs(rows[int(b)]["acc"] - pos[m].mean()) < 1e-5
        # conf folds nano-rounded scores; tolerance covers the quantum
        assert abs(rows[int(b)]["conf"] - score[m].mean()) < 1e-5
    # Murphy identity: brier == REL - RES + UNC up to the binning
    # residual (within-bin confidence variance) and the nano quantum
    d = QUERIES["eval_brier_decomposition"](spark, SF).collect()[0]
    brier = ((score - pos) ** 2).mean()
    assert abs(d["brier"] - brier) < 1e-5
    base = pos.mean()
    assert abs(d["uncertainty"] - base * (1 - base)) < 1e-5
    rel = sum(
        (score[bins == b].mean() - pos[bins == b].mean()) ** 2
        * (bins == b).sum()
        for b in np.unique(bins)
    ) / len(score)
    res = sum(
        (pos[bins == b].mean() - base) ** 2 * (bins == b).sum()
        for b in np.unique(bins)
    ) / len(score)
    assert abs(d["reliability"] - rel) < 1e-5
    assert abs(d["resolution"] - res) < 1e-5
    # the decomposition identity holds up to within-bin score variance
    wbv = sum(
        ((score[bins == b] - score[bins == b].mean()) ** 2).sum()
        for b in np.unique(bins)
    ) / len(score)
    assert abs((d["reliability"] - d["resolution"] + d["uncertainty"] + wbv)
               - brier) < 1e-3
