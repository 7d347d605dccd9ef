"""kNN stop-cluster assignment + episode segmentation (SURVEY.md §2.3 J1,
§2.5 W3-W5, §2.4 A6-A8).

Reference analog: the episode loop of REF trace.py [M] — assign each point
to its nearest activity location within cluster_distance, segment the
per-user stream at assignment changes, demote dwells shorter than
minimum_activity_time to travel, emit 'unknown' episodes across observation
gaps.  REF compare.py [M] is the interval-alignment validator (engine/ops.py
interval_overlap_join + agreement_metrics here).

Spark shape:
  knn_assign        — distributed cell-index kNN join: candidate pairs via
                      equi-join of point cell ids against the exploded ring-1
                      neighbor cover of each location's cell (per host), then
                      exact haversine refine + min(struct(dist, loc_id))
                      aggregation pick (map-side combinable; no sort
                      exchange).  The index level is chosen so one ring-1
                      neighborhood always covers `radius` even at the MINIMUM
                      quadratic-ST cell edge — property-tested near face
                      corners in tests/test_geo.py.
  build_episodes    — per-host Arrow kernel: W3 run-compress, W4 spans, W5
                      short-dwell demotion to fixpoint, 'unknown' gap
                      episodes; fully deterministic ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geo
from .config import DEFAULT, EngineConfig
from .functions import (epoch_s, haversine_m_col, make_cell_encode_udf,
                        make_cell_neighbors_udf, parent_cell_col)

EPISODE_SCHEMA = ("host string, seq int, start_ts timestamp, end_ts timestamp, "
                  "kind string, location_id int")


# Quadratic-ST cells are not uniform: the shortest cell edge is ~0.6x the
# (pi/2)/2^level nominal edge (S2 quadratic metrics: kMinEdge/kMaxEdge).
# Sizing the kNN index by the nominal edge let points ~radius apart fall
# outside each other's ring-1 neighborhood near face corners (verified
# adversarially: 7/261k pairs at level 16 / 100 m).  The ring-1 cover
# guarantee must hold for the MINIMUM edge.
MIN_EDGE_FRAC = 0.6


def level_for_radius(radius_m: float) -> int:
    """Finest level whose MINIMUM cell edge still covers radius_m (ring-1
    cover guarantee; property-tested near face corners in tests/test_geo.py)."""
    level = int(np.floor(np.log2(
        MIN_EDGE_FRAC * (np.pi / 2.0) * geo.EARTH_RADIUS_M / radius_m)))
    return max(0, min(level, geo.MAX_LEVEL))


def knn_assign(points: DataFrame, locations: DataFrame,
               cfg: EngineConfig = DEFAULT,
               radius_m: float | None = None,
               broadcast_locations: bool = False) -> DataFrame:
    """J1 — nearest location (k=1) within radius, per host.

    points must carry (host, url, lat, lon, cell_id@cfg.cell_level);
    locations carry (host, location_id, lat, lon).  Returns points plus
    nullable `location_id` and `loc_dist_m`.
    """
    radius = radius_m if radius_m is not None else cfg.cluster_distance_m
    level = min(level_for_radius(radius), cfg.cell_level)
    enc = make_cell_encode_udf(level)
    neigh = make_cell_neighbors_udf(level, k=cfg.knn_ring)

    # location side: cell + ring-1 cover, exploded -> (host, jcell, loc...)
    loc = (locations
           .withColumn("_lcell", enc(F.col("lat"), F.col("lon")))
           .withColumn("_jcell", F.explode(F.array_distinct(neigh(F.col("_lcell")))))
           .select(F.col("host").alias("_lhost"), "_jcell",
                   F.col("location_id").alias("_loc_id"),
                   F.col("lat").alias("_llat"), F.col("lon").alias("_llon")))
    if broadcast_locations:
        loc = F.broadcast(loc)

    # point side: reuse the level-cfg.cell_level cell id via native parent op
    if level == cfg.cell_level:
        pcell = F.col("cell_id")
    elif level < cfg.cell_level:
        pcell = parent_cell_col(F.col("cell_id"), level)
    else:  # radius finer than the index level: re-encode
        pcell = enc(F.col("lat"), F.col("lon"))
    pts = points.withColumn("_pcell", pcell)

    # Narrow candidate stream: only the point key + coords ride the candidate
    # exchange (not the full point row), best candidate is picked with a
    # map-side-combinable min(struct(dist, loc_id)) aggregation (no sort
    # exchange of wide candidate rows), then joined back once.  warc_ts is in
    # the key so re-crawled urls (same url, different ts) keep one row each.
    key = ["host", "url", "warc_ts"]
    cand = (pts.select(*key, "lat", "lon", "_pcell")
            .join(loc, (F.col("host") == F.col("_lhost"))
                  & (F.col("_pcell") == F.col("_jcell")), "inner"))
    dist = haversine_m_col(F.col("lat"), F.col("lon"),
                           F.col("_llat"), F.col("_llon"))
    best = (cand.withColumn("_dist", dist)
            .filter(F.col("_dist") <= F.lit(radius))
            .groupBy(*key)
            .agg(F.min(F.struct(F.col("_dist"), F.col("_loc_id"))).alias("_best")))
    return (pts.join(best, key, "left")
            .withColumn("location_id", F.col("_best._loc_id"))
            .withColumn("loc_dist_m", F.col("_best._dist"))
            .drop("_best", "_pcell"))


# ---------------------------------------------------------------------------
# episodes
# ---------------------------------------------------------------------------

def episodes_numpy(t_us: np.ndarray, subset: np.ndarray, loc: np.ndarray,
                   cfg: EngineConfig):
    """W3-W5 for one host.  t_us: int64 microseconds; loc: float with NaN for
    unassigned.  Returns (start_us, end_us, kind, location_id) lists.
    Episodes partition each subset's [first_ts, last_ts]; 'unknown'
    episodes span inter-subset gaps.  Fixpoint: activity runs shorter than
    min_dwell_s are demoted to travel and runs re-merged until stable.
    """
    out_start, out_end, out_kind, out_loc = [], [], [], []
    min_dwell_us = int(cfg.min_dwell_s * 1e6)
    # W3: vectorized run boundaries over the whole host (per-point python
    # loops serialized a 1.5M-point mega-host task; run counts are small)
    n_all = len(t_us)
    if n_all == 0:
        return [], [], [], []
    same_lab = ((loc[1:] == loc[:-1])
                | (np.isnan(loc[1:]) & np.isnan(loc[:-1])))
    same_run = same_lab & (subset[1:] == subset[:-1])
    run_starts = np.r_[0, np.flatnonzero(~same_run) + 1]
    # per-subset last timestamp (subsets are contiguous, ascending)
    sub_change = np.r_[np.flatnonzero(subset[1:] != subset[:-1]), n_all - 1]
    sub_last = {int(subset[i]): int(t_us[i]) for i in sub_change}
    run_subset = subset[run_starts]
    for sid in np.unique(subset):
        rsel = run_subset == sid
        labels = [float(v) for v in loc[run_starts[rsel]]]
        starts = [int(v) for v in t_us[run_starts[rsel]]]
        last_ts = sub_last[int(sid)]
        ends = [starts[k + 1] for k in range(len(starts) - 1)] + [last_ts]
        # W5: demote short activity runs to travel, re-merge, fixpoint
        while True:
            demote = [k for k in range(len(labels))
                      if not np.isnan(labels[k])
                      and ends[k] - starts[k] < min_dwell_us]
            if not demote:
                break
            for k in demote:
                labels[k] = float("nan")
            # merge adjacent equal labels
            nl, ns = [], []
            for k in range(len(labels)):
                if nl and _same(nl[-1], labels[k]):
                    continue_start = False
                else:
                    continue_start = True
                if continue_start:
                    nl.append(labels[k])
                    ns.append(starts[k])
            labels, starts = nl, ns
            ends = [starts[k + 1] for k in range(len(starts) - 1)] + [last_ts]
        for k in range(len(labels)):
            out_start.append(starts[k])
            out_end.append(ends[k])
            if np.isnan(labels[k]):
                out_kind.append("travel")
                out_loc.append(None)
            else:
                out_kind.append("activity")
                out_loc.append(int(labels[k]))
    # 'unknown' episodes across observation gaps (between subsets)
    order = np.argsort(np.array(out_start, dtype=np.int64), kind="stable")
    s = [out_start[i] for i in order]
    e = [out_end[i] for i in order]
    kk = [out_kind[i] for i in order]
    ll = [out_loc[i] for i in order]
    fs, fe, fk, fl = [], [], [], []
    for i in range(len(s)):
        if i > 0 and s[i] > e[i - 1]:
            fs.append(e[i - 1]); fe.append(s[i])
            fk.append("unknown"); fl.append(None)
        fs.append(s[i]); fe.append(e[i]); fk.append(kk[i]); fl.append(ll[i])
    return fs, fe, fk, fl


def _same(a, b) -> bool:
    an = isinstance(a, float) and np.isnan(a)
    bn = isinstance(b, float) and np.isnan(b)
    if an or bn:
        return an and bn
    return a == b


def _episode_kernel(cfg: EngineConfig):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"host": pd.Series(dtype=str),
                                 "seq": pd.Series(dtype="int32"),
                                 "start_ts": pd.Series(dtype="datetime64[us]"),
                                 "end_ts": pd.Series(dtype="datetime64[us]"),
                                 "kind": pd.Series(dtype=str),
                                 "location_id": pd.Series(dtype="float64")})
        pdf = pdf.sort_values(["warc_ts", "url"], kind="mergesort")
        t = pdf["warc_ts"].to_numpy("datetime64[us]").astype(np.int64)
        subset = pdf["subset_id"].to_numpy(np.int64)
        loc = pdf["location_id"].to_numpy(np.float64)
        fs, fe, fk, fl = episodes_numpy(t, subset, loc, cfg)
        return pd.DataFrame({
            "host": pdf["host"].iloc[0],
            "seq": np.arange(len(fs), dtype=np.int32),
            "start_ts": np.array(fs, dtype="datetime64[us]"),
            "end_ts": np.array(fe, dtype="datetime64[us]"),
            "kind": fk,
            "location_id": pd.array([l if l is not None else pd.NA for l in fl],
                                    dtype="Int32"),
        })

    return kernel


def build_episodes(assigned: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """W3-W5 + unknown gaps: assigned points -> episodes DF."""
    cols = ["host", "url", "warc_ts", "subset_id", "location_id"]
    return (assigned.select(*cols).groupBy("host")
            .applyInPandas(_episode_kernel(cfg), schema=EPISODE_SCHEMA))


# ---------------------------------------------------------------------------
# aggregates over locations/episodes (A6-A8)
# ---------------------------------------------------------------------------

def dwell_totals(episodes: DataFrame) -> DataFrame:
    """A6 — observed seconds per host x kind (+ per location)."""
    return (episodes
            .groupBy("host", "kind", "location_id")
            .agg(F.round(F.sum(epoch_s(F.col("end_ts"))
                               - epoch_s(F.col("start_ts"))), 6).alias("total_s"),
                 F.count(F.lit(1)).alias("n_episodes")))


def agreement_metrics(algo: DataFrame, truth: DataFrame) -> DataFrame:
    """A8 — % of overlapped time where episode kind+location agree
    (REF compare.py [M]).  Both inputs: host, start_ts, end_ts, kind,
    location_id."""
    from .ops import interval_overlap_join
    j = interval_overlap_join(
        algo.select("host", "start_ts", "end_ts",
                    F.col("kind").alias("a_kind"),
                    F.col("location_id").alias("a_loc")),
        truth.select("host", "start_ts", "end_ts",
                     F.col("kind").alias("b_kind"),
                     F.col("location_id").alias("b_loc")),
        ["host"])
    match = (F.col("a_kind") == F.col("b_kind")) & \
        F.col("a_loc").eqNullSafe(F.col("b_loc"))
    return (j.groupBy("host")
            .agg(F.round(F.sum(F.when(match, F.col("overlap_s"))
                               .otherwise(F.lit(0.0)))
                         / F.sum("overlap_s"), 6).alias("agreement"),
                 F.round(F.sum("overlap_s"), 6).alias("overlap_total_s")))
