"""Structured Streaming twins of the batch operators (SURVEY.md §2.8).

The reference is strictly batch; crawl data is naturally late-arriving, so
the streaming posture is: watermark on warc_ts, session windows as the
streaming twin of W2 sessionization, and an applyInPandasWithState episode
machine for W3 run-segmentation.

Scope note (SURVEY.md §2.8): the batch pipeline is the source of truth —
the streaming episode machine emits RAW label-run episodes (W3) as points
arrive; W5 short-dwell demotion is a retroactive merge and stays batch.
Equivalence of session counts/spans vs ops.sessionize is tested in
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
