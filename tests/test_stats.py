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
