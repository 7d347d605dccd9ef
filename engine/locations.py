"""Activity-location detection — the analytical core (SURVEY.md §2.4 A2-A5).

Reference analog: REF gaussian.py::kde + REF trace.py::Trace.
get_activity_locations + REF location.py [M] — time-weighted Gaussian KDE
over a user's (here: host's) trajectory, thresholded in dwell-seconds,
peaks agglomerated into activity locations.

Spark shape: ONE `groupBy(host).applyInPandas` kernel per host.  Inside the
kernel everything is vectorized numpy on a SPARSE grid:

  1. X3   — segment interpolation (identical math to
            trace_prep.interpolate_sites; parity is tested),
  2. A2   — bin site mass to a grid_cell_m grid in a local equirectangular
            frame anchored at the host's first point (§2.9), then Gaussian
            smoothing by direct stencil accumulation over OCCUPIED cells
            only (O(sites x stencil), no dense extent blowup — a host whose
            pages span the globe costs O(its sites), not O(its bbox)),
  3. A3   — threshold at kde_time_threshold_s (density is in seconds/cell:
            the stencil is normalized to sum 1),
  4. A4   — union-find agglomeration of super-threshold cells within
            cluster_distance_m,
  5. A5   — density-weighted centroid + dwell per cluster; location ids
            numbered by dwell desc then (lon, lat) — fully deterministic.

Memory bound: cfg.max_points_per_kernel caps a single host's kernel input
(chunk upstream by subset_id if ever exceeded — SURVEY.md §4.2 spill note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import geo
from .config import DEFAULT, EngineConfig

LOCATION_SCHEMA = ("host string, location_id int, lat double, lon double, "
                   "dwell_s double, n_cells int")


def _sites_numpy(lat, lon, nlat, nlon, ndt, step_m):
    """X3 twin of trace_prep.interpolate_sites (same math, numpy)."""
    seg = ~np.isnan(ndt)
    a_lat, a_lon = lat[seg], lon[seg]
    b_lat, b_lon = nlat[seg], nlon[seg]
    dt = ndt[seg]
    d = geo.haversine_m(a_lat, a_lon, b_lat, b_lon)
    n = np.maximum(1, np.ceil(d / step_m)).astype(np.int64)
    total = int(n.sum())
    if total == 0:
        return (np.empty(0), np.empty(0), np.empty(0))
    seg_idx = np.repeat(np.arange(len(n)), n)
    # k-th site within its segment
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    k = np.arange(total) - starts[seg_idx]
    frac = (k + 0.5) / n[seg_idx]
    slat = a_lat[seg_idx] + frac * (b_lat[seg_idx] - a_lat[seg_idx])
    slon = a_lon[seg_idx] + frac * (b_lon[seg_idx] - a_lon[seg_idx])
    mass = dt[seg_idx] / n[seg_idx]
    return slat, slon, mass


def _gauss_stencil(bandwidth_m: float, cell_m: float):
    sigma = bandwidth_m / cell_m
    r = int(np.ceil(3.0 * sigma))
    k = np.arange(-r, r + 1)
    g1 = np.exp(-0.5 * (k / sigma) ** 2)
    g2 = np.outer(g1, g1)
    g2 /= g2.sum()
    dj, di = np.meshgrid(k, k)
    return di.ravel(), dj.ravel(), g2.ravel()


def kde_locations_numpy(lat, lon, nlat, nlon, ndt, cfg: EngineConfig):
    """Sparse-grid KDE + clustering for ONE host.  Returns
    (loc_lat, loc_lon, dwell_s, n_cells) arrays ordered by location id."""
    slat, slon, mass = _sites_numpy(lat, lon, nlat, nlon, ndt,
                                    cfg.interpolation_step_m)
    if len(slat) == 0:
        return (np.empty(0), np.empty(0), np.empty(0),
                np.empty(0, dtype=np.int64))
    lat0, lon0 = float(lat[0]), float(lon[0])  # anchor: host's first point
    x, y = geo.equirect_project(slat, slon, lat0, lon0)
    cell = cfg.grid_cell_m
    ix = np.floor(x / cell).astype(np.int64)
    iy = np.floor(y / cell).astype(np.int64)

    # aggregate mass per occupied cell
    key = (ix << np.int64(32)) ^ (iy & np.int64(0xFFFFFFFF))
    uk, inv = np.unique(key, return_inverse=True)
    m0 = np.bincount(inv, weights=mass)
    uix = uk >> np.int64(32)
    uiy = ((uk & np.int64(0xFFFFFFFF)) << np.int64(32)) >> np.int64(32)  # sign-extend

    # EXACT threshold-aware pruning before smoothing: the stencil sums to 1,
    # so density(c) <= total mass within c +- r cells <= the 3x3 coarse-
    # bucket (16-cell = 200 m) neighborhood mass of c's bucket.  Only cells
    # inside (the 1-bucket dilation of) buckets whose neighborhood holds
    # >= kde_time_threshold_s can influence a super-threshold output cell.
    # A mega-host's travel corridors occupy ~1M distinct cells carrying
    # seconds of mass each — without this, the scatter below builds 169x
    # that and a single host serializes the whole job (measured 329 s ->
    # ~2 s; scaling-efficiency bottleneck).
    r_cells = int(np.ceil(3.0 * cfg.kernel_bandwidth_m / cell))
    bshift = np.int64(max(4, int(np.ceil(np.log2(r_cells + 1)))))
    ck = ((uix >> bshift) << np.int64(32)) ^ ((uiy >> bshift) & np.int64(0xFFFFFFFF))
    ucb, cinv = np.unique(ck, return_inverse=True)
    cmass = np.bincount(cinv, weights=m0)
    cbx = ucb >> np.int64(32)
    cby = ((ucb & np.int64(0xFFFFFFFF)) << np.int64(32)) >> np.int64(32)
    # 3x3 coarse neighborhood sums
    nbh = np.zeros(len(ucb))
    for dbx in (-1, 0, 1):
        for dby in (-1, 0, 1):
            nkey = ((cbx + dbx) << np.int64(32)) ^ ((cby + dby) & np.int64(0xFFFFFFFF))
            pos = np.searchsorted(ucb, nkey)
            pos = np.clip(pos, 0, len(ucb) - 1)
            hit = ucb[pos] == nkey
            np.add.at(nbh, pos[hit], cmass[np.where(hit)[0]])
    cand = ucb[nbh >= cfg.kde_time_threshold_s]
    if len(cand) == 0:
        return (np.empty(0), np.empty(0), np.empty(0),
                np.empty(0, dtype=np.int64))
    # dilate candidate buckets by 1 and keep only input cells inside them
    cdx = cand >> np.int64(32)
    cdy = ((cand & np.int64(0xFFFFFFFF)) << np.int64(32)) >> np.int64(32)
    dil = np.unique(np.concatenate(
        [((cdx + a) << np.int64(32)) ^ ((cdy + b) & np.int64(0xFFFFFFFF))
         for a in (-1, 0, 1) for b in (-1, 0, 1)]))
    keep = np.isin(ck, dil, assume_unique=False)
    uix, uiy, m0 = uix[keep], uiy[keep], m0[keep]

    # Gaussian smoothing: scatter each surviving cell into its stencil
    di, dj, gw = _gauss_stencil(cfg.kernel_bandwidth_m, cell)
    tix = (uix[:, None] + di[None, :]).ravel()
    tiy = (uiy[:, None] + dj[None, :]).ravel()
    tm = (m0[:, None] * gw[None, :]).ravel()
    tkey = (tix << np.int64(32)) ^ (tiy & np.int64(0xFFFFFFFF))
    ok2, inv2 = np.unique(tkey, return_inverse=True)
    dens = np.bincount(inv2, weights=tm)

    # A3: threshold in dwell-seconds
    hot = dens >= cfg.kde_time_threshold_s
    if not hot.any():
        return (np.empty(0), np.empty(0), np.empty(0),
                np.empty(0, dtype=np.int64))
    hix = (ok2[hot] >> np.int64(32)).astype(np.float64)
    hiy = (((ok2[hot] & np.int64(0xFFFFFFFF)) << np.int64(32))
           >> np.int64(32)).astype(np.float64)
    hd = dens[hot]

    # A4: union-find over super-threshold cells within cluster_distance
    cx = (hix + 0.5) * cell
    cy = (hiy + 0.5) * cell
    k = len(cx)
    parent = np.arange(k)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    rmax2 = cfg.cluster_distance_m ** 2
    for i in range(k):
        d2 = (cx - cx[i]) ** 2 + (cy - cy[i]) ** 2
        for j in np.where(d2 <= rmax2)[0]:
            ri, rj = find(i), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(k)])

    # A5: centroid + dwell per cluster
    labels = np.unique(roots)
    out_lat, out_lon, out_dwell, out_n = [], [], [], []
    for r in labels:
        mask = roots == r
        w = hd[mask]
        mx = float((cx[mask] * w).sum() / w.sum())
        my = float((cy[mask] * w).sum() / w.sum())
        clat, clon = geo.equirect_unproject(mx, my, lat0, lon0)
        out_lat.append(float(clat))
        out_lon.append(float(clon))
        out_dwell.append(float(w.sum()))
        out_n.append(int(mask.sum()))
    # deterministic ids: dwell desc, then (lon, lat)
    order = sorted(range(len(labels)),
                   key=lambda i: (-out_dwell[i], out_lon[i], out_lat[i]))
    return (np.array([out_lat[i] for i in order]),
            np.array([out_lon[i] for i in order]),
            np.array([out_dwell[i] for i in order]),
            np.array([out_n[i] for i in order], dtype=np.int64))


def _location_kernel(cfg: EngineConfig):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["warc_ts", "url"], kind="mergesort")
        la, lo, dw, nc = kde_locations_numpy(
            pdf["lat"].to_numpy(np.float64), pdf["lon"].to_numpy(np.float64),
            pdf["next_lat"].to_numpy(np.float64),
            pdf["next_lon"].to_numpy(np.float64),
            pdf["next_dt_s"].to_numpy(np.float64), cfg)
        return pd.DataFrame({
            "host": pdf["host"].iloc[0] if len(pdf) else "",
            "location_id": np.arange(len(la), dtype=np.int32),
            "lat": la, "lon": lo, "dwell_s": dw,
            "n_cells": nc.astype(np.int32),
        })

    return kernel


def detect_locations(points: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """A2-A5: geopoints (from trace_prep.prep_points) -> locations DF."""
    cols = ["host", "url", "warc_ts", "lat", "lon",
            "next_lat", "next_lon", "next_dt_s"]
    return (points.select(*cols).groupBy("host")
            .applyInPandas(_location_kernel(cfg), schema=LOCATION_SCHEMA))
