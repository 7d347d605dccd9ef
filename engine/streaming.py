"""Structured Streaming twins of the batch operators (SURVEY.md §2.8).

The reference is strictly batch; crawl data is naturally late-arriving, so
the streaming posture is: watermark on warc_ts, session windows as the
streaming twin of W2 sessionization, and an applyInPandasWithState episode
machine for W3 run-segmentation.

Two episode machines (SURVEY.md §2.8):
  stream_episodes       low-latency RAW label-run (W3) emission as points
                        arrive — no retroactive W5 demotion.
  stream_episodes_full  exact W3+W5 batch parity: W5 is subset-local, so
                        each observation-gap subset is buffered in state and
                        run through the SAME _subset_runs fixpoint as batch
                        build_episodes the moment the event-time watermark
                        proves it closed (EventTimeTimeout for the tail).
Equivalence vs ops.sessionize / episodes.build_episodes is tested in
tests/test_streaming.py using the memory sink.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .config import DEFAULT, EngineConfig


def stream_sessionize(pages_stream: DataFrame,
                      cfg: EngineConfig = DEFAULT,
                      watermark: str = "48 hours") -> DataFrame:
    """W2 streaming twin: per-host session windows with `gap_s` gap.

    Returns one row per closed session: host, session start/end, n_points.
    (F.session_window merges windows whose events are within the gap —
    identical session boundaries to the batch lag-cumsum for a total
    event-time order.)
    """
    gap = f"{int(cfg.gap_s)} seconds"
    return (pages_stream
            .withWatermark("warc_ts", watermark)
            .groupBy("host", F.session_window("warc_ts", gap))
            .agg(F.count(F.lit(1)).alias("n_points"))
            .select("host",
                    F.col("session_window.start").alias("start_ts"),
                    F.col("session_window.end").alias("end_ts"),
                    "n_points"))


_EP_STATE_SCHEMA = "last_ts long, cur_label int, cur_start long, n int"
_EP_OUT_SCHEMA = ("host string, start_ts timestamp, end_ts timestamp, "
                  "location_id int, n_points int")


def _episode_machine(cfg: EngineConfig):
    gap_us = int(cfg.gap_s * 1e6)

    def fn(key, pdfs, state: GroupState):
        host = key[0]
        rows = []
        if state.exists:
            last_ts, cur_label, cur_start, n = state.get
        else:
            last_ts, cur_label, cur_start, n = None, None, None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["warc_ts", "url"], kind="mergesort")
            ts = pdf["warc_ts"].astype("datetime64[us]").astype("int64")
            labels = pdf["location_id"].astype("object")
            for t, lab in zip(ts, labels):
                lab = None if pd.isna(lab) else int(lab)
                if last_ts is None:
                    cur_label, cur_start, n = lab, int(t), 0
                elif t - last_ts > gap_us or lab != cur_label:
                    rows.append((host, cur_start, int(last_ts) if
                                 t - last_ts > gap_us else int(t),
                                 cur_label, n))
                    cur_label, cur_start, n = lab, int(t), 0
                last_ts = int(t)
                n += 1
        state.update((last_ts, cur_label, cur_start, n))
        if rows:
            out = pd.DataFrame(rows, columns=["host", "start_ts", "end_ts",
                                              "location_id", "n_points"])
            out["start_ts"] = out["start_ts"].astype("datetime64[us]")
            out["end_ts"] = out["end_ts"].astype("datetime64[us]")
            out["location_id"] = out["location_id"].astype("Int32")
            yield out

    return fn


def stream_episodes(assigned_stream: DataFrame,
                    cfg: EngineConfig = DEFAULT) -> DataFrame:
    """W3 streaming twin: stateful per-host run segmentation.  Emits an
    episode whenever the assigned location changes or an observation gap
    closes the run.  Input: streaming (host, url, warc_ts, location_id)."""
    return (assigned_stream
            .groupBy("host")
            .applyInPandasWithState(_episode_machine(cfg),
                                    outputStructType=_EP_OUT_SCHEMA,
                                    stateStructType=_EP_STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# W3 + W5 streaming twin with exact batch parity (closed subsets)
# ---------------------------------------------------------------------------

_FULL_STATE_SCHEMA = "ts array<long>, lab array<double>"
_FULL_OUT_SCHEMA = ("host string, start_ts timestamp, end_ts timestamp, "
                    "kind string, location_id int")


def _full_episode_machine(cfg: EngineConfig):
    """W5 is retroactive (demote short dwells, re-merge, fixpoint) but it is
    SUBSET-LOCAL: batch build_episodes applies it per observation-gap subset
    (engine/episodes.py::_subset_runs).  A subset is therefore final as soon
    as no point can still arrive within gap_s of its last fix — exactly when
    the event-time watermark passes last_ts + gap_s.  This machine buffers
    the open tail of each host's point stream in state, and whenever the
    watermark confirms a gap it runs the SAME _subset_runs fixpoint the
    batch kernel runs, emitting byte-equivalent W3+W5 episodes plus the
    trailing 'unknown' gap episode (whose end — the next subset's first
    ts — is final for the same watermark reason)."""
    import numpy as np

    from .episodes import _subset_runs

    gap_us = int(cfg.gap_s * 1e6)
    min_dwell_us = int(cfg.min_dwell_s * 1e6)

    def emit(host, t, lab):
        starts, ends, labels = _subset_runs(t, lab, min_dwell_us)
        return pd.DataFrame({
            "host": host,
            "start_ts": np.array(starts, dtype="datetime64[us]"),
            "end_ts": np.array(ends, dtype="datetime64[us]"),
            "kind": ["travel" if np.isnan(l) else "activity" for l in labels],
            "location_id": pd.array(
                [pd.NA if np.isnan(l) else int(l) for l in labels],
                dtype="Int32"),
        })

    def gap_row(host, start_us, end_us):
        return pd.DataFrame({
            "host": [host],
            "start_ts": np.array([start_us], dtype="datetime64[us]"),
            "end_ts": np.array([end_us], dtype="datetime64[us]"),
            "kind": ["unknown"],
            "location_id": pd.array([pd.NA], dtype="Int32"),
        })

    def fn(key, pdfs, state: GroupState):
        host = key[0]
        ts_list, lab_list = state.get if state.exists else ([], [])
        t = np.asarray(ts_list, dtype=np.int64)
        lab = np.asarray(lab_list, dtype=np.float64)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            nt = pdf["warc_ts"].astype("datetime64[us]").astype("int64")
            nl = pdf["location_id"].astype("float64")
            t = np.concatenate([t, nt.to_numpy()])
            lab = np.concatenate([lab, nl.to_numpy()])
        if len(t) == 0:
            state.remove()
            return
        order = np.argsort(t, kind="stable")
        t, lab = t[order], lab[order]
        wm_us = state.getCurrentWatermarkMs() * 1000

        # split the buffer at observation gaps; a boundary is FINAL when the
        # watermark has passed the successor's first ts (no late point can
        # land inside the gap or before that successor any more).
        cut = np.flatnonzero(t[1:] - t[:-1] > gap_us) + 1
        bounds = [0, *cut.tolist(), len(t)]
        outs = []
        keep_from = 0
        for bi in range(len(bounds) - 2):  # all but the tail subset
            s, e = bounds[bi], bounds[bi + 1]
            nxt = t[bounds[bi + 1]]  # first ts of the successor subset
            if wm_us >= nxt:
                outs.append(emit(host, t[s:e], lab[s:e]))
                outs.append(gap_row(host, int(t[e - 1]), int(nxt)))
                keep_from = e
            else:
                break
        t, lab = t[keep_from:], lab[keep_from:]
        # tail subset: final when the watermark passes last_ts + gap
        # (either observed now, or via the event-time timeout set below)
        if len(t) and wm_us > int(t[-1]) + gap_us:
            outs.append(emit(host, t, lab))
            t = t[:0]
            lab = lab[:0]
        if len(t):
            state.update((t.tolist(), lab.tolist()))
            state.setTimeoutTimestamp((int(t[-1]) + gap_us) // 1000 + 1)
        else:
            state.remove()
        for out in outs:
            yield out

    return fn


def stream_episodes_full(assigned_stream: DataFrame,
                         cfg: EngineConfig = DEFAULT,
                         watermark: str = "48 hours") -> DataFrame:
    """W3+W5 streaming twin with exact batch parity on emitted rows.

    Input: streaming (host, warc_ts, location_id) — the kNN-assigned point
    stream.  Output rows are identical (up to the global seq column, which
    requires a total order and stays batch) to engine.episodes.
    build_episodes on the same points, for every subset the watermark has
    closed.  Late points inside the watermark are handled exactly (the whole
    subset is buffered and only processed at close); points later than the
    watermark are dropped by Spark's stateful-op late-row filter, as in any
    watermarked aggregation."""
    return (assigned_stream
            .withWatermark("warc_ts", watermark)
            .groupBy("host")
            .applyInPandasWithState(_full_episode_machine(cfg),
                                    outputStructType=_FULL_OUT_SCHEMA,
                                    stateStructType=_FULL_STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.EventTimeTimeout))


def stream_cell_density(points_stream: DataFrame,
                        cfg: EngineConfig = DEFAULT,
                        window: str = "10 minutes",
                        watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of the tiles raster path: geopoints stream ->
    interpolated KDE mass sites -> cell encode -> time-windowed cell
    density (a rolling heat map).

    All pre-aggregation ops are stateless/narrow (the same native exprs as
    batch interpolate_sites + encode_cell_native), so the only stateful
    operator is the windowed sum; the watermark on warc_ts bounds its
    state and admits late crawl records up to `watermark`.  Sites inherit
    their segment's start timestamp — identical semantics to running the
    batch raster per time window.  Output: (window, cell_id, mass_s),
    append mode.
    """
    from . import trace_prep
    sites = trace_prep.interpolate_sites(points_stream, cfg,
                                         carry_cols=("warc_ts",))
    from .functions import encode_cell_native
    cells = encode_cell_native(sites, "site_lat", "site_lon", "cell_id",
                               cfg.cell_level)
    return (cells
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("window"), "cell_id")
            .agg(F.sum("mass_s").alias("mass_s")))


def batch_windowed_cell_density(points: DataFrame,
                                cfg: EngineConfig = DEFAULT,
                                window: str = "10 minutes") -> DataFrame:
    """Batch parity twin of stream_cell_density (same plan minus the
    watermark) — used by tests to assert streaming == batch."""
    from . import trace_prep
    from .functions import encode_cell_native
    sites = trace_prep.interpolate_sites(points, cfg,
                                         carry_cols=("warc_ts",))
    cells = encode_cell_native(sites, "site_lat", "site_lon", "cell_id",
                               cfg.cell_level)
    return (cells.groupBy(F.window("warc_ts", window).alias("window"),
                          "cell_id")
            .agg(F.sum("mass_s").alias("mass_s")))
