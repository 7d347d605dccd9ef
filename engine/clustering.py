"""Lloyd k-means over an embedding column — the coarse-quantizer /
corpus-clustering primitive a training-data pipeline uses for
cluster-balanced sampling, semantic dedup buckets, and IVF cell training.

Spark shape (the MLlib KMeans pattern, re-expressed on DataFrames):
  * each iteration's ASSIGN step is MAP-ONLY — the k x dim centroid
    matrix is embedded as literals in a codegen expression (same closure
    strategy as `engine.episodes.knn_assign_collected`), so the corpus is
    never shuffled for assignment;
  * the UPDATE step is a posexplode -> groupBy(cl, dim) partial-agg: the
    exchange carries at most (partitions x k x dim) pre-combined rows,
    never the vectors; the k x dim result is collected to the driver
    (tiny — this is exactly what MLlib's runAlgorithm does per step);
  * total per iteration: one corpus scan + one k*dim-row shuffle.
  At 100 TB this is the right plan: assignment cost is the unavoidable
  O(n*k*dim) scan, and nothing vector-shaped ever crosses an exchange.

Exact cross-engine determinism (the oracle contract): vectors are
quantized to INTEGER-VALUED doubles (floor(x*Q + 0.5), Q = 1024).  Sums
of integer-valued doubles are exact and ORDER-INDEPENDENT below 2^53, so
the per-(cluster, dim) sums match any execution order bit-for-bit;
centroid = sum/count is one IEEE division.  Assignment compares
score(j) = dot(c_j, c_j) - 2*dot(x, c_j), each dot evaluated as a
strictly LEFT-TO-RIGHT fold (Spark `F.aggregate`; DuckDB `list_reduce`),
so both engines produce identical doubles and identical (score, cl)
argmin decisions.  Envelope: exactness of the update sums needs
n_cluster_rows * Q * max|x| < 2^53 per (cluster, dim) — ~10^9 rows per
cluster at Q=1024 on unit-scale embeddings; beyond that the result is
still deterministic per engine but no longer bit-portable.

Ties: argmin tiebreak is lowest cluster id.  Empty clusters keep their
previous centroid (both engines).  Init: the k vectors with the lowest
ids, cluster j = j-th lowest (deterministic, SQL-expressible; a k-means++
init would add seeded randomness the oracle can't replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1024.0


def quantize_vec(vec: Column, scale: float = QUANT_SCALE) -> Column:
    """float vector -> integer-valued double vector (exact-sum domain)."""
    return F.transform(
        vec.cast("array<double>"),
        lambda x: F.floor(x * F.lit(scale) + F.lit(0.5)).cast("double"))


def _dot_lit(e: Column, c: list[float]) -> Column:
    """Left-to-right dot(e, literal c) — mirrors DuckDB list_reduce."""
    arr = F.array(*[F.lit(float(v)) for v in c])
    return F.aggregate(F.zip_with(e, arr, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, v: acc + v)


def _self_dot(c: list[float]) -> float:
    acc = 0.0
    for v in c:
        acc = acc + v * v
    return acc


def _assign_expr(cents: list[list[float]], vec: Column | None = None) -> Column:
    """argmin_j [ dot(c_j,c_j) - 2*dot(x,c_j) ], tiebreak lowest j.
    One codegen expression over the k-literal centroid closure; returns
    the winning (score, cl) struct.  `score` is dist^2 minus the
    per-row-constant dot(x,x) term (constant shifts don't move argmin).
    `vec` overrides the default `e` column (PQ assigns on subvector
    slices of the same quantized vector)."""
    e = F.col("e") if vec is None else vec
    cands = F.array(*[
        F.struct(
            (F.lit(_self_dot(c)) - 2.0 * _dot_lit(e, c))
            .alias("score"),
            F.lit(j).cast("long").alias("cl"))
        for j, c in enumerate(cents)])
    return F.array_min(cands)


def _kmeans_core(df: DataFrame, k: int, iters: int, vec_col: str,
                 id_col: str, scale: float) -> DataFrame:
    """Shared Lloyd loop; returns ((vec_id, e, cl, score) DataFrame under
    the final centroids, final centroid lists) — score = dist^2 - dot(x,x)
    (see _assign_expr)."""
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    q = df.select(F.col(id_col).cast("long").alias("vec_id"),
                  quantize_vec(F.col(vec_col), scale).alias("e"))
    q = q.persist()
    try:
        init = sorted(q.orderBy("vec_id").limit(k).collect(),
                      key=lambda r: r["vec_id"])
        if len(init) < k:
            raise ValueError(f"k={k} exceeds {len(init)} input vectors")
        cents = [list(r["e"]) for r in init]
        dim = len(cents[0])
        assigned = None
        for it in range(iters):
            best = _assign_expr(cents)
            assigned = q.withColumn("cl", best["cl"]) \
                        .withColumn("score", best["score"])
            if it == iters - 1:
                break
            stats = (assigned
                     .select("cl", F.posexplode("e").alias("dim", "x"))
                     .groupBy("cl", "dim")
                     .agg(F.sum("x").alias("s"),
                          F.count(F.lit(1)).alias("n"))
                     .collect())
            upd: dict[int, list] = {}
            for r in stats:
                upd.setdefault(r["cl"], [None] * dim)[r["dim"]] = \
                    r["s"] / r["n"]
            cents = [upd[j] if j in upd else cents[j] for j in range(k)]
        return assigned, cents
    finally:
        q.unpersist()


def kmeans_lloyd(df: DataFrame, k: int = 8, iters: int = 4,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 scale: float = QUANT_SCALE) -> DataFrame:
    """`iters` Lloyd rounds; returns (vec_id, cl) — the assignment under
    the (iters-1)-times-updated centroids.  See module docstring for the
    distributed shape and the exactness contract."""
    core, _ = _kmeans_core(df, k, iters, vec_col, id_col, scale)
    return core.select("vec_id", "cl")


def kmeans_prune(df: DataFrame, k: int = 8, iters: int = 4,
                 keep_frac: float = 0.5,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 scale: float = QUANT_SCALE) -> DataFrame:
    """Centroid-distance prototype selection (the SemDeDup-family
    curation step): run k-means, then within each cluster keep the
    ceil(keep_frac * cluster_size) members CLOSEST to their centroid —
    (vec_id, cl, rk), rk 1-based by (dist^2 asc, vec_id asc).

    dist^2 = dot(x,x) + score with the same left-to-right folds as
    assignment, so the rank order is bit-portable (oracle contract).

    Scale note: the ranking is a window partitioned by cluster — k
    partitions, so at web scale (10^9 rows / cluster) this stage is
    k-way skewed by construction.  The 100-TB path replaces the exact
    rank with a per-cluster dist^2 threshold from a distributed quantile
    (approx_percentile over cl), turning the cut into a broadcast-join
    filter; the exact window form here is the oracle-able contract the
    quantile form approximates."""
    from pyspark.sql import Window
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError("keep_frac must be in (0, 1]")
    core, _ = _kmeans_core(df, k, iters, vec_col, id_col, scale)
    xx = F.aggregate(F.zip_with(F.col("e"), F.col("e"),
                                lambda a, b: a * b),
                     F.lit(0.0), lambda acc, v: acc + v)
    d2 = core.withColumn("d2", xx + F.col("score"))
    w = Window.partitionBy("cl")
    wo = w.orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    ranked = (d2.withColumn("rk", F.row_number().over(wo).cast("long"))
                .withColumn("n_cl", F.count(F.lit(1)).over(w)))
    keep = ranked.filter(
        F.col("rk") <= F.ceil(F.lit(float(keep_frac)) * F.col("n_cl"))
                        .cast("long"))
    return keep.select("vec_id", "cl", "rk")
