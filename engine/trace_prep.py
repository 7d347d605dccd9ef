"""Trace-prep pipeline: web_pages -> cleaned, weighted, cell-indexed geopoints.

SURVEY.md §7.3 / §3.2 E1'.  Stage map (operator ids from SURVEY.md §2):

  extract_points   F1 projection + F5 lang/geotag predicate + X5 extraction +
                   F2 accuracy filter — all native expressions, pushed to the
                   parquet scan by Catalyst (html is never read).
  prep_points      one shuffle (hash repartition by host) + native partition
                   sort, then ONE streaming Arrow kernel fusing the per-host
                   ordered passes: F3 sequential dedup, G1 positional-jump
                   fixpoint, W2 gap sessionization, A1 time weights.  Fusing
                   keeps it at a single exchange and the sort stays in
                   whole-stage codegen; the window-expression forms in
                   engine/ops.py are the semantic contract and are
                   cross-checked in tests.
  with_cell        X6 cell encode (narrow Arrow UDF, no shuffle).
  interpolate_sites X3 path interpolation — pure native exprs (sequence +
                   posexplode), narrow, no shuffle.  Output is the KDE mass
                   model: each inter-fix segment's duration is spread
                   uniformly over <=interpolation_step_m sub-segment
                   midpoints, so total mass == observed seconds per subset.

Reference anchors: REF main.py (scan/projection [M]), REF trace.py::
remove_sequential_duplicates / remove_positional_error /
make_known_subsets [M], REF point.py::Point.weight [M], REF trace.py
interpolation [M].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DEFAULT, EngineConfig
from .functions import (geotag_cols, haversine_m_col, host_from_url,
                        make_cell_encode_udf)

GEOPOINT_SCHEMA = ("host string, url string, warc_ts timestamp, lat double, "
                   "lon double, acc_m double, seq int, subset_id int, "
                   "weight_s double, next_lat double, next_lon double, "
                   "next_dt_s double")


def extract_points(pages: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """F1 + F5 + X5 + F2 — native expressions only (scan-pushable).

    The geotag regex runs ONCE per row (whole-token match); lat/lon/acc are
    then parsed with substring ops — at 8M rows the naive per-group
    regexp_extract x5 was the dominant extract cost."""
    from .functions import geotag_cols_from_token, geotag_token
    tok = geotag_token(F.col("text"))
    return (pages
            .filter(F.col("lang").isin(*cfg.lang_allowlist))          # F5
            .select(host_from_url(F.col("url")).alias("host"),
                    "url", "warc_ts", tok.alias("_tok"))
            .filter(F.col("_tok") != "")                              # F5 (token)
            .select("host", "url", "warc_ts",
                    *[c.alias(n) for c, n in
                      zip(geotag_cols_from_token(F.col("_tok")),
                          ("lat", "lon", "acc_m"))])
            .filter(F.col("acc_m") <= F.lit(cfg.min_accuracy_m)))     # F2


def _prep_host_sorted(pdf: pd.DataFrame, cfg: EngineConfig) -> pd.DataFrame:
    """Fused F3 + G1 + W2 + A1 for ONE host, input already sorted by
    (warc_ts, url) — the sort lives in Spark's codegen'd partition sort
    (prep_points), NOT in pandas.  Copy discipline: ONE surviving-row take.
    A mega-host group is >1M rows with string columns and this VM pays
    ~5 s/GB on first-touch allocations."""
    gap_s = cfg.gap_s
    max_speed = cfg.max_speed_ms
    t = pdf["warc_ts"].to_numpy("datetime64[us]").astype(np.int64) / 1e6
    lat = pdf["lat"].to_numpy(np.float64)
    lon = pdf["lon"].to_numpy(np.float64)

    # --- F3: sequential duplicate removal (compare to previous raw row)
    keep = np.ones(len(pdf), dtype=bool)
    if len(pdf) > 1:
        keep[1:] = ~((lat[1:] == lat[:-1]) & (lon[1:] == lon[:-1]))
    t, lat, lon = t[keep], lat[keep], lon[keep]
    sel = np.flatnonzero(keep)  # row ids into the sorted pdf

    # --- G1: positional-jump removal, fixpoint (SURVEY.md §2.2 G1).
    # Drop interior points whose BOTH adjacent implied speeds exceed
    # max_speed; endpoints dropped when their single adjacent speed is
    # implausible and the neighbor is not itself the outlier.
    from .geo import haversine_m
    alive = np.ones(len(sel), dtype=bool)
    for _ in range(16):  # fixpoint bound; real data converges in <=3
        idx = np.where(alive)[0]
        if len(idx) < 2:
            break
        d = haversine_m(lat[idx[:-1]], lon[idx[:-1]], lat[idx[1:]], lon[idx[1:]])
        dt = np.maximum(t[idx[1:]] - t[idx[:-1]], 1e-9)
        fast = d / dt > max_speed            # per adjacent pair
        bad = np.zeros(len(idx), dtype=bool)
        if len(idx) > 2:
            bad[1:-1] = fast[:-1] & fast[1:]
        # endpoints: implausible edge speed and inner neighbor is clean
        if len(idx) >= 3:
            bad[0] = fast[0] & ~(fast[0] & fast[1])
            bad[-1] = fast[-1] & ~(fast[-2] & fast[-1])
        elif len(idx) == 2 and fast[0]:
            bad[1] = True  # ambiguous pair: keep the earlier fix
        if not bad.any():
            break
        alive[idx[bad]] = False
    t, lat, lon = t[alive], lat[alive], lon[alive]
    pdf = pdf.take(sel[alive])  # the single surviving-row take

    # --- W2: observation-gap sessionization
    n = len(pdf)
    if n == 0:
        out = pdf.copy()
        out["seq"] = pd.Series([], dtype="int32")
        out["subset_id"] = pd.Series([], dtype="int32")
        for c in ("weight_s", "next_lat", "next_lon", "next_dt_s"):
            out[c] = pd.Series([], dtype="float64")
        return out[["host", "url", "warc_ts", "lat", "lon", "acc_m", "seq",
                    "subset_id", "weight_s", "next_lat", "next_lon",
                    "next_dt_s"]]
    new_subset = np.ones(n, dtype=np.int64)
    if n > 1:
        new_subset[1:] = (t[1:] - t[:-1] > gap_s).astype(np.int64)
    subset = np.cumsum(new_subset) - 1

    # --- A1: time weights (half-gap each side, within subset)
    prev_gap = np.zeros(n)
    next_gap = np.zeros(n)
    if n > 1:
        same_prev = subset[1:] == subset[:-1]
        prev_gap[1:] = np.where(same_prev, t[1:] - t[:-1], 0.0)
        next_gap[:-1] = np.where(same_prev, t[1:] - t[:-1], 0.0)
    weight = prev_gap / 2.0 + next_gap / 2.0

    # --- segment info for X3 (next point within same subset)
    nlat = np.full(n, np.nan)
    nlon = np.full(n, np.nan)
    ndt = np.full(n, np.nan)
    if n > 1:
        nlat[:-1] = np.where(same_prev, lat[1:], np.nan)
        nlon[:-1] = np.where(same_prev, lon[1:], np.nan)
        ndt[:-1] = np.where(same_prev, t[1:] - t[:-1], np.nan)

    # build output without another frame copy (pdf is already a fresh
    # take; column assignment is in-place on it)
    return pd.DataFrame({
        "host": pdf["host"].to_numpy(), "url": pdf["url"].to_numpy(),
        "warc_ts": pdf["warc_ts"].to_numpy(), "lat": lat, "lon": lon,
        "acc_m": pdf["acc_m"].to_numpy(),
        "seq": np.arange(n, dtype=np.int32),
        "subset_id": subset.astype(np.int32), "weight_s": weight,
        "next_lat": nlat, "next_lon": nlon, "next_dt_s": ndt,
    })


def _prep_stream(cfg: EngineConfig):
    """mapInPandas stream over a (host, warc_ts, url)-sorted partition:
    buffers exactly one host at a time (hosts are contiguous runs), flushes
    each completed host through _prep_host_sorted.  Peak Python memory is
    one host's rows, never the partition."""

    def stream(batches):
        buf: list[pd.DataFrame] = []
        cur = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hosts = pdf["host"].to_numpy()
            cut = np.flatnonzero(hosts[1:] != hosts[:-1]) + 1
            starts = np.r_[0, cut]
            ends = np.r_[cut, len(pdf)]
            for s, e in zip(starts, ends):
                h = hosts[s]
                g = pdf.iloc[int(s):int(e)]
                if cur is None or h == cur:
                    buf.append(g)
                    cur = h
                else:
                    yield _prep_host_sorted(
                        pd.concat(buf, ignore_index=True), cfg)
                    buf = [g]
                    cur = h
        if buf:
            yield _prep_host_sorted(pd.concat(buf, ignore_index=True), cfg)

    return stream


def prep_points(points: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """ONE shuffle (hash repartition by host) + Spark-native sort within
    partitions on (host, warc_ts, url), then a STREAMING fused kernel
    (mapInPandas) over the sorted stream.

    vs groupBy().applyInPandas this (a) moves the per-host (warc_ts, url)
    string sort out of pandas into Spark's codegen'd partition sort — the
    mega-host's in-Python mergesort was the dominant straggler cost — and
    (b) keeps the exchange count at exactly one (asserted in
    tests/test_plan_shape.py)."""
    pts = (points.repartition(F.col("host"))
           .sortWithinPartitions("host", "warc_ts", "url"))
    return pts.mapInPandas(_prep_stream(cfg), schema=GEOPOINT_SCHEMA)


def with_cell(points: DataFrame, cfg: EngineConfig = DEFAULT,
              lat_col: str = "lat", lon_col: str = "lon",
              out: str = "cell_id") -> DataFrame:
    """X6 — narrow native (whole-stage-codegen) cell encode at
    cfg.cell_level; bit-exact twin of the numpy kernel (tests/test_geo.py)."""
    from .functions import encode_cell_native
    return encode_cell_native(points, lat_col, lon_col, out, cfg.cell_level)


def interpolate_sites(points: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """X3 — KDE mass sites, pure native exprs (no shuffle, no UDF).

    Each segment (point -> next point within subset, duration next_dt_s,
    length d) yields n = max(1, ceil(d / step)) sites at sub-segment
    midpoints, each carrying next_dt_s / n seconds of mass.  Sum of site
    mass per subset == observed span (the time integral along the
    trajectory).  Single-point subsets contribute no mass.
    """
    seg = points.filter(F.col("next_dt_s").isNotNull())
    d = haversine_m_col(F.col("lat"), F.col("lon"),
                        F.col("next_lat"), F.col("next_lon"))
    n = F.greatest(F.lit(1), F.ceil(d / F.lit(cfg.interpolation_step_m))).cast("int")
    seg = seg.withColumn("_n", n)
    frac = (F.col("pos").cast("double") + 0.5) / F.col("_n").cast("double")
    return (seg.select(
        "host", "subset_id", "_n", "lat", "lon", "next_lat", "next_lon",
        "next_dt_s",
        F.posexplode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("pos", "_k"))
        .select(
            "host", "subset_id",
            (F.col("lat") + frac * (F.col("next_lat") - F.col("lat"))).alias("site_lat"),
            (F.col("lon") + frac * (F.col("next_lon") - F.col("lon"))).alias("site_lon"),
            (F.col("next_dt_s") / F.col("_n").cast("double")).alias("mass_s")))


def geopoints(pages: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Full trace-prep: pages -> cleaned weighted cell-indexed geopoints."""
    return with_cell(prep_points(extract_points(pages, cfg), cfg), cfg)
