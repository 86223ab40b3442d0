"""Independent pure-Python references for the round-12 statistics /
text / graph queries: each test recomputes the statistic from the
sf0.001 parquet with plain pandas/numpy sequential code — a SECOND
oracle besides the DuckDB SQL replay, immune to any shared-SQL-dialect
blind spot (both engines agreeing on a wrong formula still fails
here)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

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


def test_kendall_tau_daily_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["ts"].notna()]
    days = ev["ts"].values.astype("datetime64[D]").astype("int64")
    g = pd.DataFrame({"day": days, "user_id": ev["user_id"].values})
    daily = g.groupby("day").agg(
        n=("user_id", "size"), u=("user_id", "nunique")
    ).sort_index()
    xn, xu = daily["n"].to_numpy(), daily["u"].to_numpy()
    m = len(xn)
    s_prod = tie_n = tie_u = 0
    for i in range(m):
        for j in range(i + 1, m):
            s_prod += int(np.sign(xn[j] - xn[i]) * np.sign(xu[j] - xu[i]))
            tie_n += int(xn[j] == xn[i])
            tie_u += int(xu[j] == xu[i])
    row = QUERIES["events_kendall_tau_daily"](spark, SF).collect()[0]
    assert row["n_days"] == m
    assert row["s_prod"] == s_prod
    assert (row["tie_n"], row["tie_u"]) == (tie_n, tie_u)
    n0 = m * (m - 1) // 2
    if n0 - tie_n > 0 and n0 - tie_u > 0:
        tau = s_prod / math.sqrt((n0 - tie_n) * (n0 - tie_u))
        assert abs(row["tau_b"] - tau) < 1e-6
    else:
        assert row["tau_b"] is None


def test_chi_square_weekday_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["ts"].notna()].copy()
    # weekday LABELS differ between engines but chi2 is invariant to
    # relabeling — any consistent weekday key gives the same stat
    ev["wd"] = pd.to_datetime(ev["ts"]).dt.normalize().dt.dayofweek
    obs = ev.groupby(["event_type", "wd"]).size().unstack(fill_value=0)
    o = obs.to_numpy(dtype=np.int64)
    r_tot = o.sum(axis=1, keepdims=True)
    c_tot = o.sum(axis=0, keepdims=True)
    n = o.sum()
    e = r_tot * c_tot / n
    chi2 = float(((o - e) ** 2 / e).sum())
    row = QUERIES["events_chi_square_weekday"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["n_types"] == o.shape[0] and row["n_days"] == o.shape[1]
    assert row["dof"] == (o.shape[0] - 1) * (o.shape[1] - 1)
    assert abs(row["chi2"] - chi2) < 1e-5


def _two_samples(events_pdf):
    ev = events_pdf[events_pdf["value"].notna()]
    x = ev.loc[ev["event_type"] == "click", "value"].to_numpy(float)
    y = ev.loc[ev["event_type"] == "purchase", "value"].to_numpy(float)
    return x, y


def test_ks_two_sample_matches_python(spark, events_pdf):
    x, y = _two_samples(events_pdf)
    n1, n2 = len(x), len(y)
    grid = np.unique(np.concatenate([x, y]))
    f1 = np.searchsorted(np.sort(x), grid, side="right")
    f2 = np.searchsorted(np.sort(y), grid, side="right")
    d_num = int(np.abs(n2 * f1 - n1 * f2).max())
    row = QUERIES["events_ks_two_sample"](spark, SF).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["d_num"] == d_num
    ks = d_num / (n1 * n2)
    assert abs(row["ks_stat"] - ks) < 1e-6
    assert abs(row["ks_scaled"] - ks * math.sqrt(n1 * n2 / (n1 + n2))) < 1e-6


def test_mann_whitney_matches_python(spark, events_pdf):
    x, y = _two_samples(events_pdf)
    n1, n2 = len(x), len(y)
    allv = np.concatenate([x, y])
    order = pd.Series(allv).rank(method="average").to_numpy()
    r1 = float(order[:n1].sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    _, t = np.unique(allv, return_counts=True)
    tie_cube = int((t.astype(np.int64) ** 3 - t).sum())
    nn = n1 + n2
    var = (n1 * n2 / 12) * ((nn + 1) - tie_cube / (nn * (nn - 1)))
    row = QUERIES["events_mann_whitney"](spark, SF).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u2"] == int(round(2 * u1))
    assert row["tie_cube"] == tie_cube
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    assert abs(row["z_stat"] - z) < 1e-6


def test_runs_test_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["ts"].notna()]
    days = ev["ts"].values.astype("datetime64[D]").astype("int64")
    lo, hi = days.min(), days.max()
    xs = np.zeros(hi - lo + 1, dtype=np.int64)
    for d in days:
        xs[d - lo] += 1
    srt = np.sort(xs)
    m = len(srt)
    med2 = int(srt[(m + 1) // 2 - 1]) + int(srt[m // 2])
    sg = [1 if 2 * v > med2 else -1 for v in xs if 2 * v != med2]
    a = sum(1 for s in sg if s == 1)
    b = len(sg) - a
    runs = 0 if not sg else 1 + sum(
        sg[i] != sg[i - 1] for i in range(1, len(sg))
    )
    row = QUERIES["events_runs_test"](spark, SF).collect()[0]
    assert row["n_days"] == m
    assert (row["n_above"], row["n_below"]) == (a, b)
    assert row["runs"] == runs
    if a > 0 and b > 0 and a + b > 1:
        mu = 2 * a * b / (a + b) + 1
        sig = math.sqrt(
            2 * a * b * (2 * a * b - a - b)
            / ((a + b) ** 2 * (a + b - 1))
        )
        assert abs(row["z_stat"] - (runs - mu) / sig) < 1e-6
    else:
        assert row["z_stat"] is None


def test_kruskal_wallis_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["value"].notna()]
    vals = ev["value"].to_numpy(float)
    ranks = pd.Series(vals).rank(method="average").to_numpy()
    n = len(vals)
    h = 0.0
    for _t, grp in ev.groupby("event_type"):
        idx = ev["event_type"].to_numpy() == _t
        rj = float(ranks[idx].sum())
        h += rj * rj / idx.sum()
    h = 12 / (n * (n + 1)) * h - 3 * (n + 1)
    _, t = np.unique(vals, return_counts=True)
    tie_cube = int((t.astype(np.int64) ** 3 - t).sum())
    corr = 1 - tie_cube / (n**3 - n)
    row = QUERIES["events_kruskal_wallis"](spark, SF).collect()[0]
    assert row["n"] == n
    assert row["n_groups"] == ev["event_type"].nunique()
    assert row["tie_cube"] == tie_cube
    assert abs(row["h_stat"] - h) < 1e-5
    assert abs(row["h_tie_corrected"] - h / corr) < 1e-5


def _split_token_counts(docs_pdf):
    ca: Counter = Counter()
    cb: Counter = Counter()
    for doc_id, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        side = hashlib.md5(str(doc_id).encode()).hexdigest()[0] < "8"
        toks = [
            t
            for t in re.split("[^a-z]+", str(text).lower())
            if 3 <= len(t) <= 24
        ]
        (ca if side else cb).update(toks)
    return ca, cb


def test_dunning_llr_matches_python(spark, docs_pdf):
    ca, cb = _split_token_counts(docs_pdf)
    ta, tb = sum(ca.values()), sum(cb.values())
    scores = {}
    for w in set(ca) | set(cb):
        a, b = ca.get(w, 0), cb.get(w, 0)
        # full 4-term Dunning G^2 over the 2x2 table (w vs not-w,
        # split A vs B) — the standard form external implementations
        # compute, incl. the complement cells
        rest = ta + tb - a - b
        ea = ta * (a + b) / (ta + tb)
        eb = tb * (a + b) / (ta + tb)
        eca = ta * rest / (ta + tb)
        ecb = tb * rest / (ta + tb)
        llr = 2 * (
            (a * math.log(a / ea) if a else 0.0)
            + (b * math.log(b / eb) if b else 0.0)
            + ((ta - a) * math.log((ta - a) / eca) if ta - a > 0 else 0.0)
            + ((tb - b) * math.log((tb - b) / ecb) if tb - b > 0 else 0.0)
        )
        scores[w] = (a, b, math.floor(llr * 1e6 + 0.5) / 1e6)
    top = sorted(scores.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
    rows = QUERIES["text_dunning_llr"](spark, SF).collect()
    assert [(r["w"], r["a"], r["b"], r["llr"]) for r in rows] == [
        (w, a, b, llr) for w, (a, b, llr) in top
    ]


def test_js_divergence_matches_python(spark, docs_pdf):
    ca, cb = _split_token_counts(docs_pdf)
    ta, tb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    jsd = 0.0
    for w in vocab:
        p = ca.get(w, 0) / ta
        q = cb.get(w, 0) / tb
        mix = (p + q) / 2
        jsd += (0.5 * p * math.log(p / mix) if p else 0.0) + (
            0.5 * q * math.log(q / mix) if q else 0.0
        )
    row = QUERIES["text_js_divergence"](spark, SF).collect()[0]
    assert (row["ta"], row["tb"]) == (ta, tb)
    assert row["n_vocab"] == len(vocab)
    assert abs(row["jsd_nats"] - jsd) < 1e-6
    # JSD in nats is bounded by ln 2
    assert 0 <= row["jsd_nats"] <= math.log(2)


def test_adamic_adar_matches_python(spark, docs_pdf):
    n = len(docs_pdf)
    und = set()
    for u in docs_pdf["doc_id"]:
        u = int(u)
        for j in range(1, 2 + u % 3):
            v = (u * 131071 + j * 524287) % n
            if v != u:
                und.add((min(u, v), max(u, v)))
    adj = defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    scores = {}
    for z, nbrs in adj.items():
        nb = sorted(nbrs)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                u, w = nb[i], nb[j]
                if (u, w) in und:
                    continue
                c, s = scores.get((u, w), (0, 0.0))
                scores[(u, w)] = (c + 1, s + 1 / math.log(len(adj[z])))
    floored = {
        k: (c, math.floor(s * 1e6 + 0.5) / 1e6)
        for k, (c, s) in scores.items()
    }
    top = sorted(floored.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    rows = QUERIES["graph_adamic_adar"](spark, SF).collect()
    assert [
        (r["u"], r["w"], r["n_common"], r["adamic_adar"]) for r in rows
    ] == [(u, w, c, s) for (u, w), (c, s) in top]


def test_spearman_daily_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["ts"].notna()]
    days = ev["ts"].values.astype("datetime64[D]").astype("int64")
    g = pd.DataFrame({"day": days, "user_id": ev["user_id"].values})
    daily = g.groupby("day").agg(
        n=("user_id", "size"), u=("user_id", "nunique")
    ).sort_index()
    rn = daily["n"].rank(method="average").to_numpy()
    ru = daily["u"].rank(method="average").to_numpy()
    rho = float(np.corrcoef(rn, ru)[0, 1])
    row = QUERIES["events_spearman_daily"](spark, SF).collect()[0]
    assert row["n_days"] == len(daily)
    # doubled-rank sums re-derived independently
    assert row["s_x"] == int(round((2 * rn).sum()))
    assert row["s_y"] == int(round((2 * ru).sum()))
    assert abs(row["spearman_rho"] - rho) < 1e-6


def test_cohens_kappa_matches_python(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    emb = emb[emb["label"].notna() & emb["embedding"].notna()]
    r1 = (emb["label"] == 0).astype(int).to_numpy()
    r2 = np.array([1 if e[0] > 0 else 0 for e in emb["embedding"]])
    n = len(r1)
    n11 = int(((r1 == 1) & (r2 == 1)).sum())
    n10 = int(((r1 == 1) & (r2 == 0)).sum())
    n01 = int(((r1 == 0) & (r2 == 1)).sum())
    n00 = int(((r1 == 0) & (r2 == 0)).sum())
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
    kappa = (po - pe) / (1 - pe)
    row = QUERIES["eval_cohens_kappa"](spark, SF).collect()[0]
    assert (row["n"], row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n, n11, n10, n01, n00)
    assert abs(row["kappa"] - kappa) < 1e-6


def test_anova_oneway_matches_python(spark, events_pdf):
    ev = events_pdf[events_pdf["value"].notna()]
    vals = ev["value"].to_numpy(float)
    n = len(vals)
    grand = vals.mean()
    ssb = ssw = 0.0
    k = 0
    for _t, grp in ev.groupby("event_type"):
        x = grp["value"].to_numpy(float)
        ssb += len(x) * (x.mean() - grand) ** 2
        ssw += ((x - x.mean()) ** 2).sum()
        k += 1
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = QUERIES["events_anova_oneway"](spark, SF).collect()[0]
    assert (row["n"], row["k"]) == (n, k)
    assert (row["dof_between"], row["dof_within"]) == (k - 1, n - k)
    assert abs(row["ss_between"] - ssb) < 1e-4
    assert abs(row["ss_within"] - ssw) < 1e-4
    assert abs(row["f_stat"] - f) < 1e-5
