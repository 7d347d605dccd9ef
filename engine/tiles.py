"""Raster<->vector KDE tiling + point-in-polygon join + skew utilities.

SURVEY.md §2.8 (graft-mandated tiling), §2.3 J4 (PIP join), §4.2 (hot-cell
salting).  This is the GLOBAL (cross-host) twin of the per-host KDE kernel:

  raster:  cell_density    groupBy(cell).sum(mass)        — 1 shuffle
           kring_smooth    Gaussian ring-stencil join      — 1 shuffle
           rollup_pyramid  groupBy(parent(cell)) per level — native bit math,
                                                             1 shuffle/level
  vector:  extract_components  threshold + connected components via
                               iterative min-label propagation (ring-1
                               equi-join, O(log diameter) rounds)
  J4:      pip_join        two-phase: equi-join on exploded polygon cell
                           cover (cheap prefilter) then exact vectorized
                           ray-casting refine per polygon group.

All cell ops are level-tagged int64 ids from engine.geo; parent is a native
column expression (no UDF), so pyramid rollups stay in whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import geo
from .config import DEFAULT, EngineConfig
from .functions import explode_kring_native, parent_cell_col


def site_cells(sites: DataFrame, cfg: EngineConfig = DEFAULT,
               level: int | None = None) -> DataFrame:
    """Attach cell ids to KDE mass sites (trace_prep.interpolate_sites)."""
    lvl = level if level is not None else cfg.cell_level
    from .functions import encode_cell_native
    return encode_cell_native(sites, "site_lat", "site_lon", "cell_id", lvl)


def cell_density(sites: DataFrame, cfg: EngineConfig = DEFAULT,
                 level: int | None = None,
                 by_host: bool = False,
                 salted: bool = False) -> DataFrame:
    """A2-global raster: total dwell-seconds per cell (optionally per host).

    With salted=True (BASELINE.json 'salted repartitioning for hot-cell
    skew'; used by the production pipeline in submit.py/bench.py) the sum
    runs as a two-stage aggregation: partial sums on (keys..., salt) then
    final on keys.  This bounds any single reduce task to ~1/salt_buckets of
    a hot cell's rows even when hash partial-aggregation falls back to
    sort-spill on a dominant key.
    """
    df = site_cells(sites, cfg, level)
    keys = (["host", "cell_id"] if by_host else ["cell_id"])
    if not salted:
        return df.groupBy(*keys).agg(F.sum("mass_s").alias("mass_s"))
    salt = F.pmod(F.xxhash64("site_lat", "site_lon", "mass_s"),
                  F.lit(cfg.salt_buckets))
    partial = (df.withColumn("_salt", salt)
               .groupBy(*keys, "_salt").agg(F.sum("mass_s").alias("_m")))
    return partial.groupBy(*keys).agg(F.sum("_m").alias("mass_s"))


def _ring_weights(k: int, sigma_cells: float) -> list[float]:
    off = np.arange(-k, k + 1, dtype=np.float64)
    g1 = np.exp(-0.5 * (off / sigma_cells) ** 2)
    g2 = np.outer(g1, g1)  # row-major matches cell_neighbors offset order
    g2 /= g2.sum()
    return [float(v) for v in g2.ravel()]


def kring_smooth(density: DataFrame, cfg: EngineConfig = DEFAULT,
                 level: int | None = None, k: int = 1,
                 sigma_cells: float = 1.0) -> DataFrame:
    """Gaussian ring-stencil smoothing of a cell raster (one shuffle).

    Each cell scatters its mass into its (2k+1)^2 neighborhood with
    normalized Gaussian weights; total mass is conserved.  The ring ids
    come from the native decode->offset->re-encode chain
    (engine.functions.explode_kring_native, bit-exact twin of
    geo.cell_neighbors and offset-ordered row-major like the weights), so
    the whole stencil stays in whole-stage codegen — no Python round-trip.
    """
    lvl = level if level is not None else cfg.cell_level
    w = F.lit(_ring_weights(k, sigma_cells))
    exploded = (explode_kring_native(density.select("cell_id", "mass_s"),
                                     lvl, k=k)
                .select(F.col("ncell").alias("_ncell"),
                        (F.col("mass_s")
                         * F.element_at(w, F.col("pos") + 1)).alias("m")))
    return (exploded.groupBy(F.col("_ncell").alias("cell_id"))
            .agg(F.sum("m").alias("mass_s")))


def rollup_pyramid(density: DataFrame, cfg: EngineConfig = DEFAULT,
                   levels: tuple[int, ...] | None = None,
                   base_level: int | None = None,
                   hierarchical: bool = False) -> DataFrame:
    """Tile pyramid: union of per-level rollups (level, cell_id, mass_s).

    Parent ids are pure bit math (parent_cell_col) — stays in codegen; each
    level is one partial-aggregated shuffle of the already-small raster.

    ``hierarchical=True`` aggregates each coarser level from the FINEST
    already-computed finer level instead of from the base: total
    aggregation input drops from n_levels x base to ~1.33 x base (the
    classic pyramid build — the shape that matters when the base raster
    is corpus-sized).  Only exact for integer-valued masses (sums of
    sums regroup float rounding), which is why the default stays False:
    the float-mass path's per-cell values remain bit-identical to the
    flat form, and the integer-ms callers opt in.
    """
    lvls = levels if levels is not None else cfg.tile_levels
    base = base_level if base_level is not None else cfg.cell_level
    out = None
    done: list[tuple[int, DataFrame]] = []
    for lvl in lvls:
        if lvl == base:
            d = density.select(F.lit(lvl).alias("level"), "cell_id", "mass_s")
        else:
            src, src_lvl = density, base
            if hierarchical:
                finer = [(sl, sd) for sl, sd in done if sl > lvl]
                if finer:
                    src_lvl, src = min(finer, key=lambda t: t[0] - lvl)
            d = (src
                 .groupBy(parent_cell_col(F.col("cell_id"), lvl).alias("cell_id"))
                 .agg(F.sum("mass_s").alias("mass_s"))
                 .select(F.lit(lvl).alias("level"), "cell_id", "mass_s"))
        done.append((lvl, d.select("cell_id", "mass_s")))
        out = d if out is None else out.unionByName(d)
    return out


def extract_components(density: DataFrame, threshold_s: float,
                       cfg: EngineConfig = DEFAULT,
                       level: int | None = None,
                       max_iters: int = 12) -> DataFrame:
    """Vector extraction: super-threshold cells -> connected components
    (ring-1 adjacency) via min-label propagation WITH pointer jumping.

    Each round does (a) a 1-hop neighbor-min and (b) a pointer jump
    label <- label(label) through the current label table, so convergence is
    O(log component-diameter) rounds (plain 1-hop propagation alone is
    O(diameter)).  Raises RuntimeError if max_iters rounds don't reach a
    fixpoint instead of silently splitting components.  Superseded iteration
    caches are unpersisted each round (the final label table stays cached —
    the returned DataFrame reads from it).
    Returns (component_id, cell_id, mass_s).
    """
    lvl = level if level is not None else cfg.cell_level
    hot = (density.filter(F.col("mass_s") >= F.lit(threshold_s))
           .select("cell_id", "mass_s")
           .withColumn("label", F.col("cell_id")))
    hot = hot.cache()
    hot.count()
    # native ring-1 explode (UDF-free); duplicate (cell, ncell) edges can
    # appear for corner cells where the ring folds onto itself — harmless
    # under the min-label aggregation, so no distinct pass is spent on them.
    # The cache() below is a CORRECTNESS-OF-PLANNING barrier, not just a
    # reuse cache: Catalyst's constraint propagation substitutes alias
    # definitions into inferred predicates, and a Filter/Join placed
    # directly over the native decode->re-encode expression chain makes
    # that substitution combinatorial (measured: driver OOM at 3 input
    # rows).  InMemoryRelation is a constraint leaf, so filtering/joining
    # over the cached ring keeps the optimizer in bare-attribute land.
    ring = (explode_kring_native(hot.select("cell_id"), lvl, k=1)
            .select("cell_id", "ncell")).cache()
    # keep only edges between two hot cells
    edges = (ring.filter(F.col("cell_id") != F.col("ncell"))
             .join(hot.select(F.col("cell_id").alias("ncell")), "ncell",
                   "left_semi")).cache()
    edges.count()
    ring.unpersist()
    cur = hot.select("cell_id", "label")
    prev_cached: DataFrame | None = None
    converged = False
    for _ in range(max_iters):
        nbr_min = (edges.join(cur.select(F.col("cell_id").alias("ncell"),
                                         F.col("label").alias("nlabel")),
                              "ncell")
                   .groupBy("cell_id").agg(F.min("nlabel").alias("nbr_label")))
        mined = (cur.join(nbr_min, "cell_id", "left")
                 .select("cell_id",
                         F.least(F.col("label"),
                                 F.coalesce(F.col("nbr_label"), F.col("label")))
                         .alias("label")))
        # pointer jump: label <- mined(mined(.)) via the POST-neighbor-min
        # table — true doubling per round (see ops.min_label_components)
        jump = mined.select(F.col("cell_id").alias("label"),
                            F.col("label").alias("_jlabel"))
        nxt = (mined.join(jump, "label", "left")
               .select("cell_id",
                       F.least(F.col("label"),
                               F.coalesce(F.col("_jlabel"), F.col("label")))
                       .alias("label"))).cache()
        # full count (not limit(1)) so nxt is fully materialized into its
        # cache before the previous round's cache is dropped
        changed = (nxt.join(cur.withColumnRenamed("label", "old"), "cell_id")
                   .filter(F.col("label") != F.col("old")).count())
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = nxt
        cur = nxt
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"extract_components: no fixpoint after {max_iters} pointer-"
            f"jumping rounds (component diameter > 2^{max_iters})")
    return (hot.select("cell_id", "mass_s")
            .join(cur.withColumnRenamed("label", "component_id"), "cell_id"))


# ---------------------------------------------------------------------------
# J4 — point-in-polygon join
# ---------------------------------------------------------------------------

def with_cell_cover(polygons: DataFrame, cfg: EngineConfig = DEFAULT,
                    level: int | None = None) -> DataFrame:
    """Attach the superset cell cover (array<long>) to each polygon.

    Batched per Arrow chunk; the per-polygon cover computation itself is
    vectorized numpy (engine.geo.polygon_cell_cover).  Polygons are the
    small side of J4, so this runs once over a small table.
    """
    lvl = level if level is not None else cfg.cell_level
    schema = T.StructType(polygons.schema.fields
                          + [T.StructField("cell_cover",
                                           T.ArrayType(T.LongType()))])

    def add_cover(it):
        for pdf in it:
            covers = [geo.polygon_cell_cover(np.array(list(ring), dtype=np.float64),
                                             lvl).tolist()
                      for ring in pdf["ring"]]
            yield pdf.assign(cell_cover=covers)

    return polygons.mapInPandas(add_cover, schema=schema)


def pip_join(points: DataFrame, polygons_with_cover: DataFrame,
             cfg: EngineConfig = DEFAULT,
             broadcast_polygons: bool = True) -> DataFrame:
    """J4 — (point, polygon) pairs where the point lies inside the polygon.

    Phase 1: equi-join point.cell_id against the exploded polygon cover
    (broadcast by default — the polygon side is small).
    Phase 2: exact ray-casting refine, vectorized per polygon group.
    Points must carry (url, lat, lon, cell_id) at cfg.cell_level.
    """
    cover = (polygons_with_cover
             .select("polygon_id", "ring",
                     F.explode("cell_cover").alias("cell_id")))
    if broadcast_polygons:
        cover = F.broadcast(cover)
    cand = points.select("url", "lat", "lon", "cell_id").join(cover, "cell_id")

    # Refine is row-independent and the ring rides on every candidate row,
    # so it runs as mapInPandas over the candidate stream (grouped by ring
    # only WITHIN each Arrow batch) — no shuffle, and a hot polygon
    # (downtown) spreads across tasks instead of serializing into one
    # groupBy(polygon_id) task.
    empty = pd.DataFrame({"url": pd.Series(dtype=str),
                          "polygon_id": pd.Series(dtype="int64")})

    def refine(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield empty
                continue
            outs = []
            for _, g in pdf.groupby("polygon_id", sort=False):
                ring = np.array(list(g["ring"].iloc[0]), dtype=np.float64)
                inside = geo.points_in_ring(g["lon"].to_numpy(np.float64),
                                            g["lat"].to_numpy(np.float64), ring)
                outs.append(g.loc[inside, ["url", "polygon_id"]])
            yield pd.concat(outs) if outs else empty

    return cand.mapInPandas(refine, schema="url string, polygon_id long")


# ---------------------------------------------------------------------------
# skew: hot-cell detection + salted aggregation
# ---------------------------------------------------------------------------

def hot_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Heavy-hitter keys by exact count (cheap: partial-agg count shuffle)."""
    return (df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= threshold).select(key, "n"))


def salted_cell_density(sites: DataFrame, cfg: EngineConfig = DEFAULT,
                        level: int | None = None) -> DataFrame:
    """Back-compat alias for cell_density(..., salted=True)."""
    return cell_density(sites, cfg, level, salted=True)


def hotspot_gi(pts: DataFrame, x_col: str, y_col: str,
               cell_size: int) -> DataFrame:
    """Getis–Ord Gi*-style hotspot statistic over the OCCUPIED-cell
    lattice (the sparse variant: the population is the set of occupied
    cells, weights are binary over each cell's 3x3 neighborhood
    INCLUDING itself — the * in Gi*).  For each occupied cell: its point
    count v, the neighborhood size W (occupied cells among the 9), the
    neighborhood sum w_sum, and the z-score

        z = (n·w_sum − W·S) /
            ( sqrt(n·SS − S²) · sqrt((n·W − W²) / (n − 1)) )

    — the classic Gi* formula cleared of fractions so every inner term
    is an EXACT int64 (n = occupied cells, S = Σv, SS = Σv²) and z is
    one fixed IEEE tree over them (sqrt correctly rounded → the double
    is bit-portable; the oracle replays the identical tree).  NULL z
    when n < 2, when the population is constant (n·SS = S²), or when a
    cell's neighborhood covers the whole population (W = n, zero
    selection variance).

    Overflow envelope ENFORCED: n·SS < 2^62 and S² < 2^62 (driver-scalar
    check — these are global aggregates the formula needs anyway);
    n·w_sum ≤ n·S and W·S ≤ 9·S are then bounded too.

    100-TB shape: points fold into occupied-cell counts map-side first
    (ONE combinable exchange, the corpus never rides further); the
    neighborhood sum is the tile-stencil trick — each occupied cell
    donates its count to its 9 neighbor cells (a 9x explode of the
    CELL table, not the points) and one combinable agg re-collects
    them; globals are three driver scalars riding back as literals, so
    the z computation is map-only.
    """
    if cell_size <= 0:
        raise ValueError("hotspot_gi: cell_size must be positive")
    cs = int(cell_size)

    def cell(c):
        return ((c - F.pmod(c, F.lit(cs))) / F.lit(cs)).cast("long")

    cnt = (pts.select(cell(F.col(x_col).cast("long")).alias("cx"),
                      cell(F.col(y_col).cast("long")).alias("cy"))
           .groupBy("cx", "cy")
           .agg(F.count(F.lit(1)).cast("long").alias("v")))
    glob = cnt.agg(F.count(F.lit(1)).cast("long"),
                   F.sum("v").cast("long"),
                   F.sum(F.col("v") * F.col("v")).cast("long")).collect()[0]
    n, s, ss = (int(glob[0] or 0), int(glob[1] or 0), int(glob[2] or 0))
    if n * ss >= (1 << 62) or s * s >= (1 << 62):
        raise ValueError(
            f"hotspot_gi: n*SS = {n * ss} or S^2 = {s * s} breaches the "
            f"int64 envelope (< 2^62); rescale counts")
    donate = (cnt.select(
        F.explode(F.array(*[
            F.struct((F.col("cx") + i).alias("cx"),
                     (F.col("cy") + j).alias("cy"))
            for i in (-1, 0, 1) for j in (-1, 0, 1)])).alias("_c"),
        F.col("v"))
        .select(F.col("_c.cx").alias("cx"), F.col("_c.cy").alias("cy"),
                "v"))
    nbr = donate.groupBy("cx", "cy").agg(
        F.sum("v").cast("long").alias("w_sum"),
        F.count(F.lit(1)).cast("long").alias("w_cnt"))
    out = cnt.join(nbr, ["cx", "cy"])
    num = (F.lit(n) * F.col("w_sum") - F.col("w_cnt") * F.lit(s))
    d1 = F.sqrt(F.lit(float(n * ss - s * s)))
    d2 = F.sqrt((F.lit(n) * F.col("w_cnt")
                 - F.col("w_cnt") * F.col("w_cnt")).cast("double")
                / F.lit(float(n - 1 if n > 1 else 1)))
    z = F.when(F.lit(n > 1) & F.lit(n * ss - s * s > 0)
               & (F.col("w_cnt") < F.lit(n)),
               num.cast("double") / (d1 * d2))
    return out.select("cx", "cy", "v", "w_cnt", "w_sum", z.alias("z"))


def focal_stats(raster: DataFrame, keys: list[str] | tuple[str, ...],
                cx_col: str, cy_col: str, val_col: str,
                include_self: bool = True) -> DataFrame:
    """X18 — raster focal (moving-window) statistics, the map-algebra
    neighborhood op: for every OCCUPIED cell of an integer-valued
    sparse raster, the exact sum / min / max / occupied-count over its
    3×3 neighborhood — focal sums drive smoothing, gradient and
    hot-cell passes in raster GIS, and on a sparse raster the occupied
    set IS the data (absent neighbors contribute nothing; f_cnt says
    how many neighbors existed, so a caller can derive any mean it
    wants downstream — emitting floor(mean) here would just lose
    information).  include_self=False gives the annulus (Moore ring)
    variant used for contrast/outlier passes.  Duplicate (key, cell)
    rows are REJECTED with a raise — a sparse raster is a function,
    and silently double-counting a cell in every neighbor's sum is
    the classic silent-corruption bug.  All emitted numbers are exact
    BIGINT.

    Shape: every occupied cell scatters its value to its 9 (or 8)
    neighbor coordinates via a literal offset explode — the GATHER
    formulation turned into one map-side SCATTER feeding ONE
    combinable (key, cell)-keyed agg, then an equi-join back against
    the occupied set (same keys, co-partitioned by AQE) to restrict
    the output; no window, no self-join per offset, no Python.  At
    100 TB the raster shuffles once at 9× row fan-out of ~40-byte
    rows, and hot regions spread because the agg key is the cell
    itself.
    """
    keys = list(keys)
    r = raster.select(*keys,
                      F.col(cx_col).cast("long").alias("_cx"),
                      F.col(cy_col).cast("long").alias("_cy"),
                      F.col(val_col).cast("long").alias("_v"))
    dup = (r.groupBy(*keys, "_cx", "_cy").count()
           .agg(F.max("count")).collect()[0][0])
    if dup is not None and dup > 1:
        raise ValueError(
            "focal_stats: duplicate (key, cell) rows present — a "
            "sparse raster must be a function; aggregate upstream")
    offs = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)
            if include_self or (i, j) != (0, 0)]
    nbr = F.explode(F.array(*[
        F.struct((F.col("_cx") + i).alias("nx"),
                 (F.col("_cy") + j).alias("ny"))
        for i, j in offs])).alias("_n")
    scat = (r.select(*keys, "_v", nbr)
            .select(*keys, F.col("_n.nx").alias("_cx"),
                    F.col("_n.ny").alias("_cy"), "_v"))
    agg = (scat.groupBy(*keys, "_cx", "_cy")
           .agg(F.sum("_v").cast("long").alias("f_sum"),
                F.count(F.lit(1)).cast("long").alias("f_cnt"),
                F.min("_v").alias("f_min"),
                F.max("_v").alias("f_max")))
    out = (r.join(agg, [*keys, "_cx", "_cy"], "left")
           .select(*keys, F.col("_cx").alias(cx_col),
                   F.col("_cy").alias(cy_col),
                   F.col("_v").alias(val_col),
                   F.coalesce(F.col("f_sum"), F.lit(0).cast("long"))
                   .alias("f_sum"),
                   F.coalesce(F.col("f_cnt"), F.lit(0).cast("long"))
                   .alias("f_cnt"),
                   "f_min", "f_max"))
    return out


def zonal_stats(raster: DataFrame, zones: DataFrame,
                cx_col: str, cy_col: str, val_col: str,
                zone_id: str = "zone_id",
                zone_box: tuple[str, str, str, str] =
                ("zx1", "zy1", "zx2", "zy2"),
                cell: int = 64, max_cells: int = 4096,
                max_zones: int = 65536) -> DataFrame:
    """X24 — zonal statistics, the canonical raster-GIS reduction:
    for every zone (CLOSED integer rectangle), the exact count / sum
    / min / max of the sparse value raster's cells inside it.  A cell
    lying in several overlapping zones contributes to EACH (the
    standard overlapping-zone semantics); zones containing no
    occupied cell are PRESENT with zero count and NULL min/max — the
    empty zone is a finding, not an absence.  All emitted numbers are
    exact BIGINT.

    Shape: zones are a BROADCAST dim (<= max_zones ENFORCED with a
    raise — zone systems are administrative, not corpus-sized),
    exploded over the width-`cell` grid cells their box covers
    (<= max_cells per zone, raise) so the containment test is ONE
    map-side equi-join on the raster cell's single true grid cell
    followed by the exact box filter — the raster never shuffles for
    candidate generation; one combinable zone-keyed agg and a left
    join back to the zone skeleton finish.  Inverted boxes raise.
    """
    zx1, zy1, zx2, zy2 = zone_box
    z = zones.select(F.col(zone_id).alias("_zid"),
                     F.col(zx1).cast("long").alias("_x1"),
                     F.col(zy1).cast("long").alias("_y1"),
                     F.col(zx2).cast("long").alias("_x2"),
                     F.col(zy2).cast("long").alias("_y2"))
    nz = z.limit(int(max_zones) + 1).count()
    if nz == 0:
        raise ValueError("zonal_stats: zones is empty")
    if nz > int(max_zones):
        raise ValueError(
            f"zonal_stats: {nz} zones exceed max_zones={max_zones} — "
            f"broadcastability is the design premise")
    cs = int(cell)
    if cs <= 0:
        raise ValueError("zonal_stats: cell must be positive")

    def g(c):
        return ((c - F.pmod(c, F.lit(cs))) / F.lit(cs)).cast("long")

    ncell = ((g(F.col("_x2")) - g(F.col("_x1")) + 1)
             * (g(F.col("_y2")) - g(F.col("_y1")) + 1))
    # ONE validation job over the (dim-sized) zone table for all three
    # checks: inverted boxes, per-zone fan-out, and the COMBINED cover
    # budget — max_zones and max_cells alone still admit a ~2.7e8-row
    # exploded broadcast (an executor OOM); the total is what the
    # broadcast premise actually depends on.  Inverted boxes yield a
    # garbage ncell, so the fan/total checks only fire when boxes are
    # sane.
    chk = z.agg(
        F.max(F.when((F.col("_x2") < F.col("_x1"))
                     | (F.col("_y2") < F.col("_y1")), 1)
              .otherwise(0)).alias("bad"),
        F.max(ncell).alias("fan"),
        F.sum(ncell).alias("total")).collect()[0]
    if chk["bad"]:
        raise ValueError("zonal_stats: inverted zone box present")
    if chk["fan"] is not None and chk["fan"] > int(max_cells):
        raise ValueError(
            f"zonal_stats: a zone covers {chk['fan']} grid cells "
            f"(> {max_cells}); coarsen `cell` or split the zone")
    max_total = 1 << 22
    if chk["total"] is not None and chk["total"] > max_total:
        raise ValueError(
            f"zonal_stats: zones cover {chk['total']} grid cells in total "
            f"(> {max_total}) — the exploded broadcast cover table would "
            f"blow the broadcast envelope; coarsen `cell` or shard the "
            f"zone system")
    zc = (z.withColumn("_gx", F.explode(F.sequence(g(F.col("_x1")),
                                                   g(F.col("_x2")))))
          .withColumn("_gy", F.explode(F.sequence(g(F.col("_y1")),
                                                  g(F.col("_y2"))))))
    r = raster.select(F.col(cx_col).cast("long").alias("_cx"),
                      F.col(cy_col).cast("long").alias("_cy"),
                      F.col(val_col).cast("long").alias("_v"))
    r = (r.withColumn("_gx", g(F.col("_cx")))
         .withColumn("_gy", g(F.col("_cy"))))
    hits = (r.join(F.broadcast(zc), ["_gx", "_gy"])
            .filter((F.col("_cx") >= F.col("_x1"))
                    & (F.col("_cx") <= F.col("_x2"))
                    & (F.col("_cy") >= F.col("_y1"))
                    & (F.col("_cy") <= F.col("_y2"))))
    agg = (hits.groupBy("_zid")
           .agg(F.count(F.lit(1)).cast("long").alias("z_cnt"),
                F.sum("_v").cast("long").alias("z_sum"),
                F.min("_v").alias("z_min"),
                F.max("_v").alias("z_max")))
    zl = F.lit(0).cast("long")
    return (z.select(F.col("_zid"))
            .join(agg, "_zid", "left")
            .select(F.col("_zid").alias(zone_id),
                    F.coalesce(F.col("z_cnt"), zl).alias("z_cnt"),
                    F.coalesce(F.col("z_sum"), zl).alias("z_sum"),
                    "z_min", "z_max"))
