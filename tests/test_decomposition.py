"""Distributed PCA / truncated SVD (engine/decomposition.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import decomposition as dc


def _planted(spark, n=300, dim=64, seed=3):
    """Isotropic noise + a strong planted rank-1 direction."""
    rng = np.random.RandomState(seed)
    u = rng.randn(dim)
    u /= np.linalg.norm(u)
    c = rng.randn(n) * 3.0
    X = rng.randn(n, dim) * 0.1 + np.outer(c, u)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (spark.createDataFrame(rows, ["vec_id", "embedding"]), X, u)


def test_float_pca_numpy_golden(spark):
    """Float mode == direct numpy PCA on the collected matrix: same
    eigenvalues, same components up to sign, same projections."""
    df, X, _ = _planted(spark)
    out, comps, evals = dc.pca(df, k=3)
    Xc = X - X.mean(0)
    C = Xc.T @ Xc / (len(X) - 1)
    ev, evec = np.linalg.eigh(C)
    want_evals = ev[::-1][:3]
    assert np.allclose(evals, want_evals, rtol=1e-9)
    got = (out.orderBy("vec_id").toPandas().scores).tolist()
    got = np.asarray(got)
    for j in range(3):
        w = evec[:, ::-1][:, j]
        sign = np.sign(np.dot(comps[j], w)) or 1.0
        assert np.allclose(comps[j], sign * w, atol=1e-9), j
        assert np.allclose(got[:, j], sign * (Xc @ w), rtol=1e-8,
                           atol=1e-9), j


def test_quant_direction_recovers_planted_pc1(spark):
    """The integer power iteration finds the planted direction: the
    quant scores correlate with the true PC1 projection at |cos| >= 0.99
    (measured 0.9999+; the gate leaves margin for the 2^-10 component
    grid and the fixed 8 rounds)."""
    df, X, _ = _planted(spark)
    s = (dc.pca_power_quant(df).orderBy("vec_id").toPandas()
         .pc1_score.to_numpy().astype(np.float64))
    Xc = X - X.mean(0)
    ev, evec = np.linalg.eigh(Xc.T @ Xc)
    proj = Xc @ evec[:, -1]
    cos = abs(np.dot(s, proj)) / (np.linalg.norm(s) * np.linalg.norm(proj))
    assert cos >= 0.99, cos


def test_quant_is_deterministic_under_repartition(spark):
    """Quant mode is bit-portable BY CONSTRUCTION: int64 Gram sums are
    order-independent, so repartitioning the input cannot change one
    output value."""
    df, _, _ = _planted(spark, n=120)
    a = sorted((r.vec_id, r.pc1_score)
               for r in dc.pca_power_quant(df).collect())
    b = sorted((r.vec_id, r.pc1_score)
               for r in dc.pca_power_quant(df.repartition(13)).collect())
    assert a == b


def test_validation_raises(spark):
    df, _, _ = _planted(spark, n=10)
    with pytest.raises(ValueError):
        dc.pca_power_quant(df, rounds=0)
    with pytest.raises(ValueError):
        dc.pca(df, k=0)
    with pytest.raises(ValueError):
        dc.pca(df, k=65)
    empty = df.filter(F.lit(False))
    with pytest.raises(ValueError):
        dc.pca_power_quant(empty)
    zero = df.select("vec_id", F.transform(
        "embedding", lambda _: F.lit(0.25)).alias("embedding"))
    with pytest.raises(ValueError):
        dc.pca_power_quant(zero)  # all-constant -> zero centered Gram


def test_quant_int64_envelope_raises(spark, monkeypatch):
    """The provable-int64 envelope (|G| <= n*2^40 fits int64 only for
    n < 2^23) is ENFORCED: past it the Gram sums would wrap silently.
    The guard fires on the row count alone, before any Gram work, so a
    stats stub exercises it without 8.4M real rows."""
    df, _, _ = _planted(spark, n=10)
    monkeypatch.setattr(dc, "_quant_stats",
                        lambda emb, dim: (1 << 23, [0] * dim))
    with pytest.raises(ValueError, match="envelope"):
        dc.pca_power_quant(df)
