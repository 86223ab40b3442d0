"""Independent pure-Python references for the round-13 statistics /
LM queries (Welch t, Benjamini-Hochberg, held-out KN perplexity):
each test recomputes the statistic from the sf0.001 parquet with
plain pandas/python sequential code — a SECOND oracle besides the
DuckDB SQL replay, immune to any shared-SQL-dialect blind spot."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from dat_archive_map_reduce_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _dense_daily(events_pdf):
    ev = events_pdf[events_pdf["ts"].notna()]
    days = ev["ts"].values.astype("datetime64[D]").astype("int64")
    counts = Counter(days.tolist())
    lo, hi = min(counts), max(counts)
    return [(d, counts.get(d, 0)) for d in range(lo, hi + 1)]


def _group_stats(sample):
    n = len(sample)
    s = sum(sample)
    ss = sum(x * x for x in sample)
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    return n, mean, var


def _ffloor(x, dp):
    return math.floor(x * 10 ** dp + 0.5) / 10 ** dp


def test_welch_ttest_matches_python(spark, events_pdf):
    dense = _dense_daily(events_pdf)
    wk = [n for d, n in dense if (d + 3) % 7 < 5]
    we = [n for d, n in dense if (d + 3) % 7 >= 5]
    n1, m1, v1 = _group_stats(wk)
    n2, m2, v2 = _group_stats(we)
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
    row = QUERIES["events_welch_ttest"](spark, SF).collect()[0]
    assert (row["n_weekday"], row["n_weekend"]) == (n1, n2)
    assert abs(row["mean_weekday"] - m1) < 1e-6
    assert abs(row["mean_weekend"] - m2) < 1e-6
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["df"] - df) < 1e-3


def _norm_sf(z):
    """Abramowitz-Stegun 26.2.17 upper-tail of the standard normal —
    the same polynomial both engines carry."""
    za = abs(z)
    t = 1.0 / (1.0 + 0.2316419 * za)
    poly = t * (0.319381530 + t * (-0.356563782 + t * (
        1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    return 0.3989422804014327 * math.exp(-0.5 * za * za) * poly


def test_bh_discoveries_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["ts"].notna()]
    days = ev["ts"].values.astype("datetime64[D]").astype("int64")
    g = pd.DataFrame({"day": days, "et": ev["event_type"].values})
    lo, hi = int(days.min()), int(days.max())
    stats = {}
    for et, sub in g.groupby("et"):
        counts = Counter(sub["day"].tolist())
        dense = [(d, counts.get(d, 0)) for d in range(lo, hi + 1)]
        wk = [n for d, n in dense if (d + 3) % 7 < 5]
        we = [n for d, n in dense if (d + 3) % 7 >= 5]
        n1, m1, v1 = _group_stats(wk)
        n2, m2, v2 = _group_stats(we)
        z = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
        stats[et] = (z, 2 * _norm_sf(z))
    m = len(stats)
    ranked = sorted(
        ((_ffloor(p, 8), et, z) for et, (z, p) in stats.items())
    )
    k = 0
    for i, (pf, _et, _z) in enumerate(ranked, start=1):
        if pf <= i * 0.05 / m:
            k = i
    rows = QUERIES["events_bh_discoveries"](spark, SF).collect()
    assert len(rows) == m
    for i, row in enumerate(rows):
        pf, et, z = ranked[i]
        assert row["event_type"] == et
        assert row["rnk"] == i + 1 and row["m"] == m
        assert abs(row["z_stat"] - z) < 1e-5
        assert abs(row["p_value"] - pf) < 1e-7
        assert row["rejected"] == (i + 1 <= k)
    # the test is vacuous if the cut never separates: require both a
    # rejected and a non-rejected region OR document that all/none
    # rejected is the data's true answer (still a valid pin on k)
    assert all(r["rejected"] == (r["rnk"] <= k) for r in rows)


def test_kn_perplexity_filter_matches_python(spark, docs_pdf):
    in_a = {
        int(d): hashlib.md5(str(d).encode()).hexdigest()[0] < "8"
        for d in docs_pdf["doc_id"]
    }
    cab = Counter()
    for d, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        if not in_a[int(d)]:
            continue
        t = str(text).lower().split(" ")
        for a, b in zip(t, t[1:]):
            cab[(a, b)] += 1
    ca = Counter()
    n1p_a = Counter()
    n1p_b = Counter()
    for (a, b), c in cab.items():
        ca[a] += c
        n1p_a[a] += 1
        n1p_b[b] += 1
    nbt = len(cab)
    vb = len(n1p_b)
    scores = {}
    for d, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        d = int(d)
        if in_a[d]:
            continue
        t = str(text).lower().split(" ")
        lps = []
        for a, b in zip(t, t[1:]):
            pc = (n1p_b.get(b, 0) + 1.0) / (nbt + vb + 1)
            if (a, b) in cab:
                p = (cab[(a, b)] - 0.75) / ca[a] \
                    + 0.75 * n1p_a[a] / ca[a] * pc
            elif a in ca:
                p = 0.75 * n1p_a[a] / ca[a] * pc
            else:
                p = pc
            lps.append(math.log(p))
        if lps:
            scores[d] = (len(lps), round(-sum(lps) / len(lps), 4))
    top = sorted(
        ((x, d) for d, (_n, x) in scores.items())
    )[:20]
    rows = QUERIES["text_kn_perplexity_filter"](spark, SF).collect()
    got = [(r["xent"], r["doc_id"], r["n_bigrams"]) for r in rows]
    want = [(x, d, scores[d][0]) for x, d in top]
    # xent via python round vs engine round-half-up can differ at the
    # exact .00005 boundary — compare at tolerance, order by value
    assert [g[1] for g in got] == [w[1] for w in want]
    for g, w in zip(got, want):
        assert g[2] == w[2]
        assert abs(g[0] - w[0]) < 1e-4
    # sanity: perplexity filter spans a real range (not degenerate)
    assert got[0][0] < got[-1][0]
