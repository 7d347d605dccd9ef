"""PageRank (engine/graph.py): parity vs an independent numpy power
iteration with the engine's exact integer semantics, plus invariants
(dangling leakage only shrinks mass; sink accumulation ranks highest)."""

import numpy as np
import pandas as pd
import pytest

from engine.graph import (DAMP_DEN, DAMP_NUM, RANK_SCALE, bfs_levels,
                          k_core, label_propagation, pagerank,
                          triangle_counts)


def _numpy_pagerank(edges: list[tuple[int, int]], iters: int):
    """Independent replay of the integer contract: rank in int64
    micro-units, contrib = (85 * r) // (100 * outdeg), dangling dropped."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    odeg = np.zeros(len(nodes), dtype=np.int64)
    for s, _ in edges:
        odeg[idx[s]] += 1
    base = (DAMP_DEN - DAMP_NUM) * RANK_SCALE // DAMP_DEN
    r = np.full(len(nodes), RANK_SCALE, dtype=np.int64)
    for _ in range(iters):
        nxt = np.full(len(nodes), base, dtype=np.int64)
        for s, d in edges:
            nxt[idx[d]] += (DAMP_NUM * r[idx[s]]) // (DAMP_DEN * odeg[idx[s]])
        r = nxt
    return {n: int(r[idx[n]]) for n in nodes}


def _run(spark, edges, iters):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]))
    out = pagerank(df, iters=iters).collect()
    return {r["node"]: r["rank_q"] for r in out}


def test_pagerank_matches_numpy_oracle(spark):
    rng = np.random.default_rng(23)
    n = 40
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, size=(300, 2))
                    if a != b})
    assert _run(spark, edges, 5) == _numpy_pagerank(edges, 5)


def test_pagerank_sink_and_dangling(spark):
    # star into node 9 (a dangling sink): 9 outranks every spoke, and
    # total mass strictly shrinks each round (dangling leakage).
    edges = [(i, 9) for i in range(9)]
    got = _run(spark, edges, 3)
    assert got == _numpy_pagerank(edges, 3)
    assert all(got[9] > got[i] for i in range(9))
    assert sum(got.values()) < 10 * RANK_SCALE


def test_pagerank_rejects_zero_iters(spark):
    df = spark.createDataFrame(pd.DataFrame({"src": [0], "dst": [1]}))
    with pytest.raises(ValueError):
        pagerank(df, iters=0)

# ---------------------------------------------------------------- BFS


def _python_bfs(edges, seeds, rounds):
    """Independent level-synchronous BFS: dict node -> first-reach hop."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for r in range(1, rounds + 1):
        nxt = {d for s in frontier for d in adj.get(s, ())} - dist.keys()
        if not nxt:
            break
        dist.update({n: r for n in nxt})
        frontier = nxt
    return dist


def _run_bfs(spark, edges, seeds, rounds):
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    s = spark.createDataFrame(pd.DataFrame({"node": sorted(seeds)}))
    out = bfs_levels(e, s, rounds=rounds).collect()
    return {r["node"]: r["dist"] for r in out}


def test_bfs_matches_python_oracle(spark):
    rng = np.random.default_rng(41)
    n = 60
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, size=(200, 2))
                    if a != b})
    seeds = [0, 7, 13]
    for rounds in (0, 1, 3, 6):
        assert _run_bfs(spark, edges, seeds, rounds) == \
            _python_bfs(edges, seeds, rounds)


def test_bfs_directed_chain_and_early_stop(spark):
    # 0->1->2->3: distances follow the chain; rounds cap truncates; the
    # reverse direction is never reached (directed semantics); a cap far
    # past exhaustion early-stops at the same answer.
    edges = [(0, 1), (1, 2), (2, 3)]
    assert _run_bfs(spark, edges, [0], 2) == {0: 0, 1: 1, 2: 2}
    assert _run_bfs(spark, edges, [0], 50) == {0: 0, 1: 1, 2: 2, 3: 3}
    assert _run_bfs(spark, edges, [3], 50) == {3: 0}


def test_bfs_rejects_negative_rounds(spark):
    e = spark.createDataFrame(pd.DataFrame({"src": [0], "dst": [1]}))
    s = spark.createDataFrame(pd.DataFrame({"node": [0]}))
    with pytest.raises(ValueError):
        bfs_levels(e, s, rounds=-1)


# ------------------------------------------------------- triangle counts


def _python_triangles(edges):
    """Independent brute-force replay of the definition: canonicalize to
    an undirected simple graph, enumerate u<v<w triples via adjacency
    sets, count per-node participation."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {n: 0 for n in adj}
    for u, v in sorted(und):
        for w in sorted(adj[u] & adj[v]):
            if w > v:
                counts[u] += 1
                counts[v] += 1
                counts[w] += 1
    return counts


def _run_tri(spark, edges):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    out = triangle_counts(df).collect()
    return {r["node"]: r["n_triangles"] for r in out}


def test_triangles_match_python_oracle(spark):
    rng = np.random.default_rng(7)
    n = 30
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, size=(260, 2))
                    if a != b})
    got = _run_tri(spark, edges)
    want = _python_triangles(edges)
    assert got == want
    assert sum(got.values()) % 3 == 0  # each triangle counted thrice


def test_triangles_direction_and_duplicates_collapse(spark):
    # K3 stated with mixed directions + duplicates + a self loop: exactly
    # one triangle; the pendant node 3 participates in none.
    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (0, 3)]
    assert _run_tri(spark, edges) == {0: 1, 1: 1, 2: 1, 3: 0}


def test_triangles_skewed_hub(spark):
    # hub 0 linked to all spokes plus a spoke ring: triangles are exactly
    # the (hub, i, i+1) wedges closed by the ring — the degree-ordered
    # orientation must not double- or under-count around the hot hub.
    n = 12
    edges = [(0, i) for i in range(1, n)] + \
            [(i, i + 1) for i in range(1, n - 1)]
    got = _run_tri(spark, edges)
    assert got == _python_triangles(edges)
    assert got[0] == n - 2  # hub in every ring triangle


# -------------------------------------------------------------- k-core


def _python_kcore(edges, k, rounds):
    """Independent replay of the exact contract: `rounds` edge-peeling
    passes (early stop on no change), then the final degree>=k node
    selection over surviving edges."""
    e = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    for _ in range(rounds):
        deg = {}
        for u, v in e:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        ne = {(u, v) for u, v in e if u in keep and v in keep}
        if ne == e:
            break
        e = ne
    deg = {}
    for u, v in e:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return {n: d for n, d in deg.items() if d >= k}


def _run_kcore(spark, edges, k, rounds):
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    return {r["node"]: r["deg"]
            for r in k_core(df, k=k, rounds=rounds).collect()}


def test_kcore_matches_python(spark):
    rng = np.random.default_rng(19)
    n = 40
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, size=(260, 2))
                    if a != b})
    for k in (3, 6, 9):
        for rounds in (0, 1, 2, 10):
            assert _run_kcore(spark, edges, k, rounds) == \
                _python_kcore(edges, k, rounds)


def test_kcore_planted_clique_survives(spark):
    # K6 clique (every node degree 5) + a pendant chain: at k=3 the
    # chain peels away completely, the clique survives intact.
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    chain = [(5, 10), (10, 11), (11, 12)]
    got = _run_kcore(spark, clique + chain, 3, 10)
    assert got == {i: 5 for i in range(6)}
    import pytest as _pt
    df = spark.createDataFrame(pd.DataFrame(clique, columns=["src", "dst"]))
    with _pt.raises(ValueError):
        k_core(df, k=0, rounds=3)
    with _pt.raises(ValueError):
        k_core(df, k=2, rounds=-1)


# ------------------------------------------------- label propagation


def _python_lpa(edges, rounds):
    """Independent synchronous min-tie LPA replay."""
    und = {tuple(sorted(p)) for p in edges if p[0] != p[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            freq = {}
            for m in nbrs:
                freq[lab[m]] = freq.get(lab[m], 0) + 1
            best = min(freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[n] = best
        lab = new
    return lab


def test_lpa_matches_python(spark):
    rng = np.random.default_rng(47)
    n = 36
    edges = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, size=(180, 2))
                    if a != b})
    for rounds in (0, 1, 3, 5):
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["src", "dst"]))
        got = {r["node"]: r["label"]
               for r in label_propagation(df, rounds=rounds).collect()}
        assert got == _python_lpa(edges, rounds)


def test_lpa_two_cliques_bridge(spark):
    # two K4 cliques joined by one bridge: after a few rounds each
    # clique converges to its min node id; labels never cross the bridge
    # enough to merge under the min-frequency-tie rule.
    c1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    c2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r["node"]: r["label"]
           for r in label_propagation(df, rounds=6).collect()}
    assert got == _python_lpa(edges, 6)
    assert all(got[i] == 0 for i in range(4))
    assert len({got[i] for i in range(10, 14)}) == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        label_propagation(df, rounds=-1)


def test_link_prediction_cn_matches_brute(spark):
    from engine.graph import link_prediction_cn
    rng = np.random.default_rng(11)
    raw = {(int(rng.integers(0, 30)), int(rng.integers(0, 30)))
           for _ in range(120)}
    df = spark.createDataFrame(pd.DataFrame(list(raw),
                                            columns=["src", "dst"]))
    got = {(r["u"], r["w"]): (r["cn"], r["deg_u"], r["deg_w"])
           for r in link_prediction_cn(df, min_common=1).collect()}
    # brute: canonical undirected simple graph
    ce = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    nbr = {}
    for a, b in ce:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(nbr)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if (u, w) in ce:
                continue
            cn = len(nbr[u] & nbr[w])
            if cn >= 1:
                want[(u, w)] = (cn, len(nbr[u]), len(nbr[w]))
    assert got == want
    # min_common filters; envelope raises on tiny cap
    got2 = link_prediction_cn(df, min_common=3).collect()
    assert all(r["cn"] >= 3 for r in got2)
    assert {(r["u"], r["w"]) for r in got2} == \
        {k for k, v in want.items() if v[0] >= 3}
    with pytest.raises(ValueError):
        link_prediction_cn(df, max_wedges=1)


def test_catchment_rounds_matches_brute(spark):
    import pandas as pd
    import pytest as _pt
    from pyspark.sql import functions as F
    from engine.graph import catchment_rounds
    # planted: node 4 is equidistant (cost 2) from seeds 0 and 1 -> tie
    # must go to catchment 0; node 5 only reachable in round 2; node 9
    # unreachable
    edges = [(0, 2, 1), (2, 4, 1), (1, 3, 1), (3, 4, 1),
             (4, 5, 7), (1, 4, 9), (9, 9, 1)]
    e = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst", "w"]))
    seeds = spark.createDataFrame(pd.DataFrame({"node": [0, 1]}))

    def brute(rounds):
        best = {0: (0, 0), 1: (0, 1)}
        cur = dict(best)
        for _ in range(rounds):
            nxt = dict(cur)
            for s, d, w in edges:
                if s in cur:
                    cand = (cur[s][0] + w, cur[s][1])
                    if d not in nxt or cand < nxt[d]:
                        nxt[d] = cand
            # the engine folds old ∪ relaxed, so keep the running min
            for k, v in cur.items():
                if k not in nxt or v < nxt[k]:
                    nxt[k] = v
            cur = nxt
        return {n: v for n, v in cur.items()}

    for rounds in (0, 1, 2, 3):
        got = {r["node"]: (r["dist"], r["catchment"])
               for r in catchment_rounds(e, seeds, rounds).collect()}
        assert got == brute(rounds), rounds
    got3 = {r["node"]: (r["dist"], r["catchment"])
            for r in catchment_rounds(e, seeds, 3).collect()}
    assert got3[4] == (2, 0)      # the planted tie -> smaller seed
    assert got3[5] == (9, 0)      # via node 4's winning label
    assert 9 not in got3          # unreachable from any seed
    with _pt.raises(ValueError):
        catchment_rounds(e, seeds, -1)
    neg = e.withColumn("w", F.col("w") - 5)
    with _pt.raises(ValueError):
        catchment_rounds(neg, seeds, 2)
