"""Independent single-threaded pure-numpy oracle of the SURVEY.md §2.9 spec.

Deliberately written as straightforward per-host loops — NOT sharing code
with engine/ — so golden comparisons engine-vs-oracle are meaningful
(FIXTURES.md §3).  Float aggregation order differs from the engine on
purpose; tests compare discrete columns exactly and float columns to 1e-6.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

import numpy as np
import pandas as pd

R = 6371008.8
GEO_RE = re.compile(r"\[geo:(-?\d+\.\d{6}),(-?\d+\.\d{6});acc=(\d+\.\d)\]")


def hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lon2 - lon1)
    h = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * R * math.asin(math.sqrt(min(max(h, 0.0), 1.0)))


def extract(pages: pd.DataFrame, cfg) -> pd.DataFrame:
    rows = []
    for r in pages.itertuples(index=False):
        if r.lang not in cfg.lang_allowlist:
            continue
        m = GEO_RE.search(r.text)
        if not m:
            continue
        lat, lon, acc = float(m.group(1)), float(m.group(2)), float(m.group(3))
        if acc > cfg.min_accuracy_m:
            continue
        host = re.match(r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", r.url).group(1)
        rows.append((host, r.url, r.warc_ts, lat, lon, acc))
    return pd.DataFrame(rows, columns=["host", "url", "warc_ts", "lat", "lon",
                                       "acc_m"])


def prep_host(g: pd.DataFrame, cfg):
    """F3 + G1 + W2 + A1 for one host, plain loops."""
    g = g.sort_values(["warc_ts", "url"], kind="mergesort").reset_index(drop=True)
    # F3
    keep = []
    prev = None
    for r in g.itertuples(index=False):
        if prev is not None and r.lat == prev[0] and r.lon == prev[1]:
            continue
        keep.append(r)
        prev = (r.lat, r.lon)
    # G1 fixpoint
    pts = list(keep)
    for _ in range(16):
        if len(pts) < 2:
            break
        t = [p.warc_ts.value / 1e9 for p in pts]  # pandas ns -> seconds
        fast = []
        for i in range(len(pts) - 1):
            d = hav(pts[i].lat, pts[i].lon, pts[i + 1].lat, pts[i + 1].lon)
            dt = max(t[i + 1] - t[i], 1e-9)
            fast.append(d / dt > cfg.max_speed_ms)
        bad = [False] * len(pts)
        if len(pts) > 2:
            for i in range(1, len(pts) - 1):
                bad[i] = fast[i - 1] and fast[i]
            bad[0] = fast[0] and not fast[1]
            bad[-1] = fast[-1] and not fast[-2]
        elif len(pts) == 2 and fast[0]:
            bad[1] = True
        if not any(bad):
            break
        pts = [p for p, b in zip(pts, bad) if not b]
    # W2 + A1
    out = []
    subset = -1
    prev_t = None
    t = [p.warc_ts.value / 1e9 for p in pts]
    for i, p in enumerate(pts):
        if prev_t is None or t[i] - prev_t > cfg.gap_s:
            subset += 1
        out.append({"host": p.host, "url": p.url, "warc_ts": p.warc_ts,
                    "lat": p.lat, "lon": p.lon, "acc_m": p.acc_m,
                    "subset_id": subset, "t": t[i]})
        prev_t = t[i]
    for i, row in enumerate(out):
        w = 0.0
        if i > 0 and out[i - 1]["subset_id"] == row["subset_id"]:
            w += (row["t"] - out[i - 1]["t"]) / 2
        if i + 1 < len(out) and out[i + 1]["subset_id"] == row["subset_id"]:
            w += (out[i + 1]["t"] - row["t"]) / 2
        row["weight_s"] = w
        row["seq"] = i
    return out


def locations_host(points: list[dict], cfg):
    """X3 + A2-A5 for one host, dict-grid KDE with plain loops."""
    if not points:
        return []
    lat0, lon0 = points[0]["lat"], points[0]["lon"]

    def proj(lat, lon):
        return (R * math.cos(math.radians(lat0)) * math.radians(lon - lon0),
                R * math.radians(lat - lat0))

    # X3 sites (sub-segment midpoints, mass = dt/n)
    cellsz = cfg.grid_cell_m
    grid: dict[tuple[int, int], float] = defaultdict(float)
    for i in range(len(points) - 1):
        a, b = points[i], points[i + 1]
        if a["subset_id"] != b["subset_id"]:
            continue
        dt = b["t"] - a["t"]
        d = hav(a["lat"], a["lon"], b["lat"], b["lon"])
        n = max(1, math.ceil(d / cfg.interpolation_step_m))
        for k in range(n):
            f = (k + 0.5) / n
            slat = a["lat"] + f * (b["lat"] - a["lat"])
            slon = a["lon"] + f * (b["lon"] - a["lon"])
            x, y = proj(slat, slon)
            grid[(math.floor(x / cellsz), math.floor(y / cellsz))] += dt / n
    if not grid:
        return []
    # A2: discrete Gaussian stencil, normalized
    sigma = cfg.kernel_bandwidth_m / cellsz
    r = math.ceil(3 * sigma)
    g2, tot = {}, 0.0
    for di in range(-r, r + 1):
        for dj in range(-r, r + 1):
            w = math.exp(-0.5 * (di / sigma) ** 2) * math.exp(-0.5 * (dj / sigma) ** 2)
            g2[(di, dj)] = w
            tot += w
    dens: dict[tuple[int, int], float] = defaultdict(float)
    for (ix, iy), m in grid.items():
        for (di, dj), w in g2.items():
            dens[(ix + di, iy + dj)] += m * w / tot
    # A3
    hot = [(c, v) for c, v in dens.items() if v >= cfg.kde_time_threshold_s]
    if not hot:
        return []
    # A4: BFS clustering within cluster_distance
    centers = [((ix + 0.5) * cellsz, (iy + 0.5) * cellsz) for (ix, iy), _ in hot]
    n = len(hot)
    lab = [-1] * n
    nxt = 0
    for i in range(n):
        if lab[i] != -1:
            continue
        stack = [i]
        lab[i] = nxt
        while stack:
            a = stack.pop()
            for b in range(n):
                if lab[b] == -1:
                    dx = centers[a][0] - centers[b][0]
                    dy = centers[a][1] - centers[b][1]
                    if dx * dx + dy * dy <= cfg.cluster_distance_m ** 2:
                        lab[b] = nxt
                        stack.append(b)
        nxt += 1
    # A5
    locs = []
    for c in range(nxt):
        sw = sx = sy = 0.0
        ncell = 0
        for i in range(n):
            if lab[i] == c:
                w = hot[i][1]
                sw += w
                sx += centers[i][0] * w
                sy += centers[i][1] * w
                ncell += 1
        mx, my = sx / sw, sy / sw
        lat = lat0 + math.degrees(my / R)
        lon = lon0 + math.degrees(mx / (R * math.cos(math.radians(lat0))))
        locs.append({"lat": lat, "lon": lon, "dwell_s": sw, "n_cells": ncell})
    locs.sort(key=lambda d: (-d["dwell_s"], d["lon"], d["lat"]))
    for i, d in enumerate(locs):
        d["location_id"] = i
    return locs


def assign_host(points, locs, cfg):
    for p in points:
        best, bestd = None, None
        for d in locs:
            dist = hav(p["lat"], p["lon"], d["lat"], d["lon"])
            if dist <= cfg.cluster_distance_m and (bestd is None or dist < bestd
                                                   or (dist == bestd and d["location_id"] < best)):
                best, bestd = d["location_id"], dist
        p["location_id"] = best
    return points


def episodes_host(points, cfg):
    eps = []
    by_subset: dict[int, list] = defaultdict(list)
    for p in points:
        by_subset[p["subset_id"]].append(p)
    for sid in sorted(by_subset):
        pts = by_subset[sid]
        runs = []  # [label, start_s]
        for p in pts:
            lab = p["location_id"]
            if not runs or runs[-1][0] != lab:
                runs.append([lab, p["t"]])
        last_t = pts[-1]["t"]
        while True:
            ends = [runs[k + 1][1] for k in range(len(runs) - 1)] + [last_t]
            short = [k for k in range(len(runs))
                     if runs[k][0] is not None
                     and ends[k] - runs[k][1] < cfg.min_dwell_s]
            if not short:
                break
            for k in short:
                runs[k][0] = None
            merged = []
            for lab, st in runs:
                if merged and merged[-1][0] == lab:
                    continue
                merged.append([lab, st])
            runs = merged
        ends = [runs[k + 1][1] for k in range(len(runs) - 1)] + [last_t]
        for k, (lab, st) in enumerate(runs):
            eps.append({"start_s": st, "end_s": ends[k],
                        "kind": "travel" if lab is None else "activity",
                        "location_id": lab})
    eps.sort(key=lambda d: d["start_s"])
    full = []
    for i, e in enumerate(eps):
        if i > 0 and e["start_s"] > eps[i - 1]["end_s"]:
            full.append({"start_s": eps[i - 1]["end_s"], "end_s": e["start_s"],
                         "kind": "unknown", "location_id": None})
        full.append(e)
    for i, e in enumerate(full):
        e["seq"] = i
    return full


def run_pipeline(pages: pd.DataFrame, cfg):
    """Full oracle: pages -> (geopoints_df, locations_df, episodes_df)."""
    ext = extract(pages, cfg)
    gp_rows, loc_rows, ep_rows = [], [], []
    for host, g in ext.groupby("host", sort=True):
        pts = prep_host(g, cfg)
        locs = locations_host(pts, cfg)
        pts = assign_host(pts, locs, cfg)
        eps = episodes_host(pts, cfg)
        gp_rows.extend(pts)
        for d in locs:
            loc_rows.append({"host": host, **d})
        for e in eps:
            ep_rows.append({"host": host, **e})
    gp = pd.DataFrame(gp_rows)
    locs = pd.DataFrame(loc_rows, columns=["host", "location_id", "lat", "lon",
                                           "dwell_s", "n_cells"])
    eps = pd.DataFrame(ep_rows, columns=["host", "seq", "start_s", "end_s",
                                         "kind", "location_id"])
    return gp, locs, eps
