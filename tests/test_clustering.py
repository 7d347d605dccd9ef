"""Lloyd k-means (engine/clustering.py): parity vs an independent numpy
implementation, empty-cluster handling, and the map-only assignment plan."""

import numpy as np
import pandas as pd
import pytest

from engine import clustering


def _numpy_lloyd(vecs: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Independent single-threaded Lloyd with the engine's exact
    semantics: floor(x*1024+0.5) quantization, init = k lowest ids,
    score = c.c - 2 x.c, argmin tiebreak lowest cluster, empty clusters
    keep their previous centroid."""
    q = np.floor(vecs.astype(np.float64) * 1024.0 + 0.5)
    order = np.argsort(ids, kind="stable")
    cents = q[order[:k]].copy()
    assign = None
    for it in range(iters):
        scores = (cents * cents).sum(axis=1)[None, :] - 2.0 * (q @ cents.T)
        assign = np.argmin(scores, axis=1)  # argmin takes first on ties
        if it == iters - 1:
            break
        for j in range(k):
            members = q[assign == j]
            if len(members):
                cents[j] = members.sum(axis=0) / len(members)
    return {int(i): int(c) for i, c in zip(ids, assign)}


def test_kmeans_matches_numpy_oracle(spark):
    rng = np.random.default_rng(17)
    n, dim, k, iters = 300, 16, 5, 4
    centers = rng.normal(size=(k, dim)) * 3.0
    vecs = (centers[rng.integers(0, k, n)]
            + rng.normal(size=(n, dim)) * 0.5).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)
    got = {r["vec_id"]: r["cl"]
           for r in clustering.kmeans_lloyd(df, k=k, iters=iters).collect()}
    want = _numpy_lloyd(vecs, ids, k, iters)
    assert got == want
    # the test is only meaningful if iterations actually move assignments
    got1 = {r["vec_id"]: r["cl"]
            for r in clustering.kmeans_lloyd(df, k=k, iters=1).collect()}
    assert got1 != got


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # ids 0 and 1 quantize identically -> cluster 1 ties everywhere and
    # loses every argmin tiebreak; the update round must keep its
    # centroid (not crash / NaN) and the output must stay total.
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]),
            (3, [0.9, 0.1]), (4, [0.1, 0.9])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    first = {r["vec_id"]: r["cl"]
             for r in clustering.kmeans_lloyd(df, k=3, iters=1).collect()}
    assert 1 not in set(first.values())  # loses every round-0 tiebreak
    out = clustering.kmeans_lloyd(df, k=3, iters=3).collect()
    got = {r["vec_id"]: r["cl"] for r in out}
    assert sorted(got) == [0, 1, 2, 3, 4]
    want = _numpy_lloyd(np.array([r[1] for r in rows], dtype=np.float32),
                        np.array([r[0] for r in rows]), 3, 3)
    assert got == want


def test_kmeans_assignment_is_map_only(spark):
    rows = [(i, [float(i % 7), float(i % 3)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = clustering.kmeans_lloyd(df, k=4, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_validates_args(spark):
    df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        clustering.kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        clustering.kmeans_lloyd(df, k=5, iters=2)


def test_kmeans_prune_matches_numpy(spark):
    """Prune keeps exactly ceil(frac * |cluster|) per cluster, the
    closest-to-centroid by (dist^2, vec_id) — checked against an
    independent numpy replay of the full Lloyd + rank pipeline."""
    import math
    rng = np.random.default_rng(23)
    n, dim, k, iters, frac = 200, 8, 4, 3, 0.4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(map(list, vecs))})
    df = spark.createDataFrame(pdf)
    out = clustering.kmeans_prune(df, k=k, iters=iters,
                                  keep_frac=frac).collect()
    # numpy replay
    q = np.floor(vecs.astype(np.float64) * 1024.0 + 0.5)
    cents = q[np.argsort(ids, kind="stable")[:k]].copy()
    assign = None
    for it in range(iters):
        scores = (cents * cents).sum(axis=1)[None, :] - 2.0 * (q @ cents.T)
        assign = np.argmin(scores, axis=1)
        if it == iters - 1:
            break
        for j in range(k):
            m = q[assign == j]
            if len(m):
                cents[j] = m.sum(axis=0) / len(m)
    d2 = (q * q).sum(axis=1) + scores[np.arange(n), assign]
    want = {}
    for j in range(k):
        members = sorted((d2[i], ids[i]) for i in np.where(assign == j)[0])
        cut = math.ceil(frac * len(members))
        for rk, (_, vid) in enumerate(members[:cut], start=1):
            want[int(vid)] = (j, rk)
    got = {r["vec_id"]: (r["cl"], r["rk"]) for r in out}
    assert got == want


def _brute_dbscan(pts, eps, min_pts):
    """Independent DBSCAN replay with the engine's deterministic rules:
    closed neighborhood, min-core-id cluster label, border -> min
    neighboring core cluster."""
    ids = [p[0] for p in pts]
    xy = {i: (x, y) for i, x, y in pts}
    nbr = {i: [j for j in ids
               if (xy[j][0] - xy[i][0]) ** 2
               + (xy[j][1] - xy[i][1]) ** 2 <= eps * eps]
           for i in ids}
    core = {i for i in ids if len(nbr[i]) >= min_pts}
    # components over core-core eps edges (BFS), label = min core id
    label = {}
    for s in sorted(core):
        if s in label:
            continue
        comp, stack = [], [s]
        seen = {s}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbr[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (len(nbr[i]), "core", label[i])
        else:
            cand = [label[j] for j in nbr[i] if j in core and j != i]
            if cand:
                out[i] = (len(nbr[i]), "border", min(cand))
            else:
                out[i] = (len(nbr[i]), "noise", None)
    return out


def test_dbscan_grid_matches_brute(spark):
    rng = np.random.default_rng(7)
    # two planted blobs + uniform noise
    pts = []
    k = 0
    for cx, cy in ((10, 10), (60, 55)):
        for _ in range(25):
            pts.append((k, cx + int(rng.integers(-4, 5)),
                        cy + int(rng.integers(-4, 5))))
            k += 1
    for _ in range(30):
        pts.append((k, int(rng.integers(0, 100)), int(rng.integers(0, 100))))
        k += 1
    # planted chain: 7 stacked cores, a bridge core, and a guaranteed
    # border point that sees only the bridge (n=2 < min_pts)
    for x, y in [(200, 200)] * 7 + [(205, 200), (210, 200)]:
        pts.append((k, x, y))
        k += 1
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["i", "x", "y"]))
    out = clustering.dbscan_grid(df, "i", "x", "y", eps=5, min_pts=6)
    got = {r["i"]: (r["n_neighbors"], r["role"], r["cluster"])
           for r in out.collect()}
    want = _brute_dbscan(pts, 5, 6)
    assert got == want
    roles = {v[1] for v in got.values()}
    assert roles == {"core", "border", "noise"}
    # the two blobs land in (at least) two distinct clusters
    assert len({v[2] for v in got.values() if v[2] is not None}) >= 2
    with pytest.raises(ValueError):
        clustering.dbscan_grid(df, "i", "x", "y", eps=5, min_pts=0)


def _brute_dbscan_geo(pts, eps_m, min_pts):
    """Geodesic brute: same deterministic rules over numpy haversine."""
    from engine.geo import haversine_m
    ids = [p[0] for p in pts]
    ll = {i: (la, lo) for i, la, lo in pts}
    nbr = {i: [j for j in ids
               if haversine_m(ll[i][0], ll[i][1],
                              ll[j][0], ll[j][1]) <= eps_m]
           for i in ids}
    core = {i for i in ids if len(nbr[i]) >= min_pts}
    label = {}
    for s in sorted(core):
        if s in label:
            continue
        comp, stack, seen = [], [s], {s}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbr[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (len(nbr[i]), "core", label[i])
        else:
            cand = [label[j] for j in nbr[i] if j in core and j != i]
            out[i] = ((len(nbr[i]), "border", min(cand)) if cand
                      else (len(nbr[i]), "noise", None))
    return out


def test_dbscan_geo_matches_brute(spark):
    """Geodesic DBSCAN equals the numpy-haversine brute replay on a
    layout the planar variant cannot handle: a cluster straddling the
    antimeridian, a high-latitude blob, a core chain and noise.  All
    planted distances sit far from the eps boundary, so the known
    1-ulp JVM-vs-libm trig divergence cannot flip any decision."""
    rng = np.random.default_rng(13)
    pts, k = [], 0
    # antimeridian blob: lons near +179.9 / -179.9 are ~20 km apart
    for _ in range(8):
        lon = 179.9 if rng.integers(2) else -179.9
        pts.append((k, 0.0 + float(rng.integers(-5, 6)) / 100.0, lon))
        k += 1
    # high-latitude blob (lon spacing shrinks by cos(70 deg))
    for _ in range(8):
        pts.append((k, 70.0 + float(rng.integers(-5, 6)) / 100.0,
                    10.0 + float(rng.integers(-5, 6)) / 10.0))
        k += 1
    # chain: cores every 50 km along the equator + a far border
    for j in range(5):
        pts.append((k, 0.0, 10.0 + 0.45 * j))
        pts.append((k + 1, 0.05, 10.0 + 0.45 * j))
        pts.append((k + 2, -0.05, 10.0 + 0.45 * j))
        k += 3
    # isolated noise
    pts += [(k, -45.0, 60.0), (k + 1, 30.0, -120.0)]
    k += 2
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["i", "lat",
                                                          "lon"]))
    out = clustering.dbscan_geo(df, "i", "lat", "lon",
                                eps_m=60000.0, min_pts=3)
    got = {r["i"]: (r["n_neighbors"], r["role"], r["cluster"])
           for r in out.collect()}
    want = _brute_dbscan_geo(pts, 60000.0, 3)
    assert got == want
    # the antimeridian blob is ONE cluster despite the lon seam
    am = {got[i][2] for i in range(8)}
    assert len(am) == 1 and None not in am
    assert {v[1] for v in got.values()} == {"core", "border", "noise"} \
        or {v[1] for v in got.values()} >= {"core", "noise"}
    with pytest.raises(ValueError):
        clustering.dbscan_geo(df, "i", "lat", "lon", eps_m=1000.0,
                              min_pts=0)


def _brute_st_dbscan(pts, eps, eps_t, min_pts):
    """Independent ST-DBSCAN replay: neighborhood requires BOTH
    dist2 <= eps^2 AND |dt| <= eps_t; same deterministic rules as the
    spatial brute (closed neighborhoods, min-core-id labels, border ->
    min neighboring core cluster)."""
    ids = [p[0] for p in pts]
    d = {i: (x, y, t) for i, x, y, t in pts}
    nbr = {i: [j for j in ids
               if (d[j][0] - d[i][0]) ** 2 + (d[j][1] - d[i][1]) ** 2
               <= eps * eps and abs(d[j][2] - d[i][2]) <= eps_t]
           for i in ids}
    core = {i for i in ids if len(nbr[i]) >= min_pts}
    label = {}
    for s in sorted(core):
        if s in label:
            continue
        comp, stack, seen = [], [s], {s}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbr[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (len(nbr[i]), "core", label[i])
        else:
            cand = [label[j] for j in nbr[i] if j in core and j != i]
            out[i] = (len(nbr[i]), "border", min(cand)) if cand \
                else (len(nbr[i]), "noise", None)
    return out


def test_st_dbscan_matches_brute(spark):
    rng = np.random.default_rng(17)
    pts, k = [], 0
    # blob A: tight in space AND time
    for _ in range(12):
        pts.append((k, 10 + int(rng.integers(-3, 4)),
                    10 + int(rng.integers(-3, 4)),
                    1000 + int(rng.integers(-40, 41))))
        k += 1
    # blob B: SAME coordinates as A but revisited far outside eps_t —
    # plain DBSCAN would merge these; ST-DBSCAN must NOT
    for _ in range(12):
        pts.append((k, 10 + int(rng.integers(-3, 4)),
                    10 + int(rng.integers(-3, 4)),
                    90000 + int(rng.integers(-40, 41))))
        k += 1
    # temporal chain: spatially glued, each step eps_t-adjacent only to
    # its neighbors -> long chainy component (the max_iters stressor)
    for j in range(10):
        for _ in range(2):
            pts.append((k, 200, 200, 5000 + 90 * j)); k += 1
            pts.append((k, 201, 200, 5000 + 90 * j)); k += 1
    # uniform noise
    for _ in range(20):
        pts.append((k, int(rng.integers(0, 300)),
                    int(rng.integers(0, 300)),
                    int(rng.integers(0, 100000))))
        k += 1
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["i", "x", "y", "t"]))
    out = clustering.st_dbscan(df, "i", "x", "y", "t",
                               eps=5, eps_t=100, min_pts=5)
    got = {r["i"]: (r["n_neighbors"], r["role"], r["cluster"])
           for r in out.collect()}
    want = _brute_st_dbscan(pts, 5, 100, 5)
    assert got == want
    # the revisit property: blob A and blob B share space but NOT cluster
    la = {got[i][2] for i in range(12) if got[i][2] is not None}
    lb = {got[i][2] for i in range(12, 24) if got[i][2] is not None}
    assert la and lb and not (la & lb)
    with pytest.raises(ValueError):
        clustering.st_dbscan(df, "i", "x", "y", "t",
                             eps=5, eps_t=100, min_pts=0)
