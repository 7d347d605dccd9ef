"""Hypothesis-testing operators (engine/stats.py) vs pure-Python replays."""

import math

import numpy as np
import pandas as pd
import pytest

from engine import stats


def test_two_proportion_ztest_matches_brute(spark):
    rng = np.random.default_rng(7)
    rows = []
    for exp in range(3):
        for variant, rate in (("A", 0.30), ("B", 0.20), ("C", 0.99)):
            for _ in range(120):
                rows.append((exp, variant,
                             int(rng.random() < rate)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["exp", "variant", "conv"]))
    got = {r["exp"]: r for r in stats.two_proportion_ztest(
        df, ["exp"], "variant", "conv", "A", "B").collect()}
    assert len(got) == 3
    for exp in range(3):
        arms = {"A": [c for e, v, c in rows if e == exp and v == "A"],
                "B": [c for e, v, c in rows if e == exp and v == "B"]}
        na, xa = len(arms["A"]), sum(arms["A"])
        nb, xb = len(arms["B"]), sum(arms["B"])
        r = got[exp]
        assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (na, xa, nb, xb)
        pool = (xa + xb) / (na + nb)
        se = math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
        assert r["p_a"] == xa / na and r["p_b"] == xb / nb
        assert r["z"] == (xa / na - xb / nb) / se
    # degenerate: all successes in both arms -> pooled variance 0 -> NULL z
    dg = spark.createDataFrame(
        pd.DataFrame([(0, "A", 1)] * 3 + [(0, "B", 1)] * 3,
                     columns=["exp", "variant", "conv"]))
    row = stats.two_proportion_ztest(
        dg, ["exp"], "variant", "conv", "A", "B").collect()[0]
    assert row["z"] is None and row["p_a"] == 1.0
    # empty arm: B never appears -> evidence rides, z NULL
    ea = spark.createDataFrame(
        pd.DataFrame([(0, "A", 1), (0, "A", 0)],
                     columns=["exp", "variant", "conv"]))
    row = stats.two_proportion_ztest(
        ea, ["exp"], "variant", "conv", "A", "B").collect()[0]
    assert (row["n_b"], row["x_b"]) == (0, 0)
    assert row["z"] is None and row["p_b"] is None


def test_chi2_independence_matches_brute(spark):
    rng = np.random.default_rng(11)
    # dependent table: category skews the column distribution
    rows = []
    for _ in range(600):
        r = int(rng.integers(0, 3))
        c = int(rng.integers(0, 3)) if r != 0 else int(rng.integers(0, 2))
        rows.append((f"r{r}", c))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["rr", "cc"]))
    out = {(r["r"], r["c"]): r
           for r in stats.chi2_independence(df, "rr", "cc").collect()}
    obs = {}
    for r, c in rows:
        obs[(r, c)] = obs.get((r, c), 0) + 1
    n = len(rows)
    rt = {}
    ct = {}
    for (r, c), o in obs.items():
        rt[r] = rt.get(r, 0) + o
        ct[c] = ct.get(c, 0) + o
    assert set(out) == set(obs)
    chi2 = 0.0
    for (r, c), o in obs.items():
        g = out[(r, c)]
        assert (g["o"], g["row_total"], g["col_total"]) == \
            (o, rt[r], ct[c])
        assert g["expected"] == (float(rt[r]) * float(ct[c])) / float(n)
        d = float(o * n - rt[r] * ct[c])
        want = d * d / (float(n) * float(rt[r]) * float(ct[c]))
        assert g["contrib"] == want
        chi2 += (o - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
    # consumer-side statistic agrees with the textbook form
    got_stat = sum(v["contrib"] for v in out.values())
    assert got_stat == pytest.approx(chi2, rel=1e-12)


def test_welch_ttest_matches_brute(spark):
    rng = np.random.default_rng(13)
    rows = []
    for key in ("k1", "k2"):
        shift = 40 if key == "k2" else 0
        for _ in range(80):
            rows.append((key, "A", int(rng.integers(0, 100)) + shift))
        for _ in range(50):
            rows.append((key, "B", int(rng.integers(20, 140))))
        rows.append((key, "C", 10 ** 6))  # ignored arm
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "v", "x"]))
    got = {r["k"]: r for r in stats.welch_ttest(
        df, ["k"], "v", "x", "A", "B").collect()}
    for key in ("k1", "k2"):
        a = [x for k, v, x in rows if k == key and v == "A"]
        b = [x for k, v, x in rows if k == key and v == "B"]
        r = got[key]
        assert (r["n_a"], r["s_a"], r["ss_a"]) == \
            (len(a), sum(a), sum(x * x for x in a))
        assert (r["n_b"], r["s_b"], r["ss_b"]) == \
            (len(b), sum(b), sum(x * x for x in b))

        def tree(vals):
            n, s, ss = len(vals), float(sum(vals)), \
                float(sum(x * x for x in vals))
            m = s / n
            var = (ss - s * (s / n)) / float(n - 1)
            return n, m, var

        na, ma, va = tree(a)
        nb, mb, vb = tree(b)
        qa, qb = va / na, vb / nb
        q = qa + qb
        assert r["t"] == (ma - mb) / math.sqrt(q)
        assert r["df_welch"] == q * q / (qa * qa / (na - 1)
                                         + qb * qb / (nb - 1))
    # constant data: q lands at/below 0 -> NULL t (the rounding guard)
    cd = spark.createDataFrame(
        pd.DataFrame([("k", "A", 5)] * 4 + [("k", "B", 5)] * 4,
                     columns=["k", "v", "x"]))
    row = stats.welch_ttest(cd, ["k"], "v", "x", "A", "B").collect()[0]
    assert row["t"] is None and row["df_welch"] is None
    # n < 2 in an arm -> NULL t, evidence rides
    small = spark.createDataFrame(
        pd.DataFrame([("k", "A", 1), ("k", "A", 9), ("k", "B", 4)],
                     columns=["k", "v", "x"]))
    row = stats.welch_ttest(small, ["k"], "v", "x", "A", "B").collect()[0]
    assert row["t"] is None and row["n_b"] == 1
    # envelope: n*max|x| >= 2^31 raises
    big = spark.createDataFrame(
        pd.DataFrame([("k", "A", 1 << 31), ("k", "B", 1)],
                     columns=["k", "v", "x"]))
    with pytest.raises(ValueError):
        stats.welch_ttest(big, ["k"], "v", "x", "A", "B")


def _midranks(a):
    """Average (mid) ranks, 1-based, ties share the mean rank."""
    a = np.asarray(a)
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), dtype=float)
    sa = a[order]
    i, r = 0, 1
    while i < len(a):
        j = i
        while j < len(a) and sa[j] == sa[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2.0
        r += j - i
        i = j
    return ranks


def test_mann_whitney_u_matches_brute(spark):
    rng = np.random.default_rng(13)
    rows = []
    for key in ("k0", "k1", "k2"):
        for variant, shift in (("A", 0), ("B", 3), ("C", 99)):
            # coarse grid => heavy ties, the hard case for midranks
            for _ in range(80):
                rows.append((key, variant, int(rng.integers(0, 12)) + shift))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "variant", "v"]))
    got = {r["k"]: r for r in stats.mann_whitney_u(
        df, ["k"], "variant", "v", "A", "B").collect()}
    assert len(got) == 3
    for key in ("k0", "k1", "k2"):
        va = np.array([v for k, var, v in rows if k == key and var == "A"])
        vb = np.array([v for k, var, v in rows if k == key and var == "B"])
        pooled = np.concatenate([va, vb])
        ranks = _midranks(pooled)
        ra = ranks[: len(va)].sum()
        na, nb = len(va), len(vb)
        u_a = ra - na * (na + 1) / 2.0
        _, counts = np.unique(pooled, return_counts=True)
        tie = int((counts.astype(object) ** 3 - counts).sum())
        r = got[key]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["u2_a"] == int(round(2 * u_a))
        assert r["tie_term"] == tie
        n = na + nb
        sig2 = (float(na) * float(nb) / 12.0
                * ((float(n) + 1.0) - float(tie) / float(n * (n - 1))))
        z = (float(r["u2_a"]) / 2.0
             - float(na) * float(nb) / 2.0) / math.sqrt(sig2)
        assert r["z"] == z
    # all-tied values -> tie-corrected variance 0 -> NULL z
    dg = spark.createDataFrame(
        pd.DataFrame([("x", "A", 7)] * 4 + [("x", "B", 7)] * 4,
                     columns=["k", "variant", "v"]))
    row = stats.mann_whitney_u(dg, ["k"], "variant", "v", "A", "B"
                               ).collect()[0]
    assert row["z"] is None and row["u2_a"] == 4 * 9 - 4 * 5
    # empty arm: evidence rides, z NULL
    ea = spark.createDataFrame(
        pd.DataFrame([("x", "A", 1), ("x", "A", 2)],
                     columns=["k", "variant", "v"]))
    row = stats.mann_whitney_u(ea, ["k"], "variant", "v", "A", "B"
                               ).collect()[0]
    assert row["n_b"] == 0 and row["z"] is None
    # envelope raise: > 2^20 rows in one key
    big = spark.range((1 << 20) + 8).selectExpr(
        "'x' AS k",
        "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS variant",
        "CAST(id % 50 AS LONG) AS v")
    with pytest.raises(ValueError, match="envelope"):
        stats.mann_whitney_u(big, ["k"], "variant", "v", "A", "B")


def test_spearman_rho_matches_brute(spark):
    rng = np.random.default_rng(17)
    rows = []
    for key in ("k0", "k1"):
        for _ in range(150):
            x = int(rng.integers(0, 25))
            # monotone-ish link + noise, with ties on both axes
            y = x * 3 + int(rng.integers(0, 10))
            rows.append((key, x, y))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "x", "y"]))
    got = {r["k"]: r for r in stats.spearman_rho(
        df, ["k"], "x", "y").collect()}
    for key in ("k0", "k1"):
        xs = np.array([x for k, x, y in rows if k == key])
        ys = np.array([y for k, x, y in rows if k == key])
        n = len(xs)
        dx = (2 * _midranks(xs) - (n + 1)).astype(np.int64)
        dy = (2 * _midranks(ys) - (n + 1)).astype(np.int64)
        sxy, sxx, syy = (int((dx * dy).sum()), int((dx * dx).sum()),
                         int((dy * dy).sum()))
        r = got[key]
        assert (r["n"], r["sxy"], r["sxx"], r["syy"]) == (n, sxy, sxx, syy)
        assert r["rho"] == float(sxy) / math.sqrt(float(sxx) * float(syy))
        # sanity: strong positive monotone link
        assert r["rho"] > 0.85
    # constant column -> NULL rho, evidence rides
    cg = spark.createDataFrame(
        pd.DataFrame([("x", 5, 1), ("x", 5, 2), ("x", 5, 3)],
                     columns=["k", "x", "y"]))
    row = stats.spearman_rho(cg, ["k"], "x", "y").collect()[0]
    assert row["sxx"] == 0 and row["rho"] is None
    # perfect antitone permutation -> exactly -1.0
    pg = spark.createDataFrame(
        pd.DataFrame([("x", i, 10 - i) for i in range(10)],
                     columns=["k", "x", "y"]))
    row = stats.spearman_rho(pg, ["k"], "x", "y").collect()[0]
    assert row["rho"] == -1.0


def test_ks_2samp_matches_brute(spark):
    rng = np.random.default_rng(19)
    rows = []
    for key in ("k0", "k1"):
        for _ in range(120):
            rows.append((key, "A", int(rng.integers(0, 30))))
        for _ in range(90):   # unequal arms, shifted distribution
            rows.append((key, "B", int(rng.integers(5, 40))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "variant", "v"]))
    got = {r["k"]: r for r in stats.ks_2samp(
        df, ["k"], "variant", "v", "A", "B").collect()}
    for key in ("k0", "k1"):
        va = np.array([v for k, var, v in rows if k == key and var == "A"])
        vb = np.array([v for k, var, v in rows if k == key and var == "B"])
        na, nb = len(va), len(vb)
        grid = np.unique(np.concatenate([va, vb]))
        cum_a = np.searchsorted(np.sort(va), grid, side="right")
        cum_b = np.searchsorted(np.sort(vb), grid, side="right")
        d_num = int(np.abs(nb * cum_a.astype(np.int64)
                           - na * cum_b.astype(np.int64)).max())
        r = got[key]
        assert (r["n_a"], r["n_b"], r["d_num"]) == (na, nb, d_num)
        assert r["d"] == float(d_num) / float(na * nb)
        # scipy-free sanity: shifted distributions => detectable gap
        assert r["d"] > 0.1
    # identical single-point arms -> D = 0
    dg = spark.createDataFrame(
        pd.DataFrame([("x", "A", 3)] * 5 + [("x", "B", 3)] * 5,
                     columns=["k", "variant", "v"]))
    row = stats.ks_2samp(dg, ["k"], "variant", "v", "A", "B").collect()[0]
    assert row["d_num"] == 0 and row["d"] == 0.0
    # empty arm -> NULL D
    ea = spark.createDataFrame(
        pd.DataFrame([("x", "A", 1)], columns=["k", "variant", "v"]))
    row = stats.ks_2samp(ea, ["k"], "variant", "v", "A", "B").collect()[0]
    assert row["n_b"] == 0 and row["d"] is None
