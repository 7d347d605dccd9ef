"""Output sinks + remaining reference-surface aggregates.

S4 locations sink / S5 episodes sink / S6 points sink (REF trace.py::
write_locations / write_episodes / write_points [M]) re-expressed as
partitioned parquet writes plus an optional single-CSV export for goldens;
J2 semantic labeling (REF main.py survey home/work/study match [M]); A7
per-day summary (REF day.py [L]).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DEFAULT, EngineConfig
from .functions import epoch_s, haversine_m_col


def write_locations(locations: DataFrame, path: str | Path,
                    single_csv: bool = False) -> None:
    """S4 — locations sink: host, location_id, lon, lat, label?, dwell_s."""
    w = locations
    if single_csv:
        w.coalesce(1).orderBy("host", "location_id") \
         .write.mode("overwrite").option("header", True).csv(str(path))
    else:
        w.write.mode("overwrite").parquet(str(path))


def write_episodes(episodes: DataFrame, path: str | Path,
                   tz: str | None = None, single_csv: bool = False) -> None:
    """S5 — episodes sink; start/end rendered in the output timezone
    (F4: reference localizes to config.local_timezone [L]; default UTC)."""
    out = episodes
    if tz and tz != "UTC":
        out = (out.withColumn("start_ts", F.from_utc_timestamp("start_ts", tz))
                  .withColumn("end_ts", F.from_utc_timestamp("end_ts", tz)))
    if single_csv:
        out.coalesce(1).orderBy("host", "seq") \
           .write.mode("overwrite").option("header", True).csv(str(path))
    else:
        out.write.mode("overwrite").parquet(str(path))


def write_points(assigned: DataFrame, path: str | Path) -> None:
    """S6 — diagnostic sink: cleaned weighted points with assignment."""
    cols = [c for c in ("host", "url", "warc_ts", "lat", "lon", "acc_m",
                        "subset_id", "weight_s", "cell_id", "location_id",
                        "loc_dist_m") if c in assigned.columns]
    assigned.select(*cols).write.mode("overwrite").parquet(str(path))


GROUND_TRUTH_SCHEMA = ("host string, start_ts timestamp, end_ts timestamp, "
                       "kind string, location_id int")


def read_ground_truth(spark, path: str | Path) -> DataFrame:
    """S3 — ground-truth episode scan for the compare path (REF compare.py
    reads a hand-labeled CSV [M]).  Explicit schema, header'd CSV; rows with
    unparsable timestamps are dropped (PERMISSIVE -> null filter) so a
    partially-labeled file still compares."""
    df = (spark.read.option("header", True).option("mode", "PERMISSIVE")
          .schema(GROUND_TRUTH_SCHEMA).csv(str(path)))
    return df.filter(F.col("start_ts").isNotNull()
                     & F.col("end_ts").isNotNull())


def compare_to_ground_truth(algo: DataFrame, truth: DataFrame) -> DataFrame:
    """E3 — runnable compare entry: agreement metrics (A8) of algorithm
    episodes vs a ground-truth table (from read_ground_truth or any DF with
    host/start_ts/end_ts/kind/location_id)."""
    from .episodes import agreement_metrics
    return agreement_metrics(
        algo.select("host", "start_ts", "end_ts", "kind", "location_id"),
        truth.select("host", "start_ts", "end_ts", "kind", "location_id"))


def label_locations(locations: DataFrame, known: DataFrame,
                    cfg: EngineConfig = DEFAULT,
                    radius_m: float | None = None) -> DataFrame:
    """J2 — semantic labeling: match detected locations against a small
    per-host table of known places (host, label, lat, lon) within
    `radius_m`; nearest wins, ties by label asc.  Broadcast theta-join —
    the known side is tiny by construction (SURVEY.md §2.3 J2)."""
    r = radius_m if radius_m is not None else cfg.cluster_distance_m
    k = F.broadcast(known.select(F.col("host").alias("_kh"),
                                 F.col("label").alias("_klabel"),
                                 F.col("lat").alias("_klat"),
                                 F.col("lon").alias("_klon")))
    j = locations.join(k, locations["host"] == k["_kh"], "left")
    d = haversine_m_col(F.col("lat"), F.col("lon"),
                        F.col("_klat"), F.col("_klon"))
    j = j.withColumn("_d", F.when(d <= F.lit(r), d))
    from pyspark.sql import Window
    w = Window.partitionBy("host", "location_id").orderBy(
        F.col("_d").asc_nulls_last(), F.col("_klabel").asc_nulls_last())
    best = j.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") == 1)
    return (best.withColumn("label", F.when(F.col("_d").isNotNull(),
                                            F.col("_klabel")))
            .drop("_kh", "_klabel", "_klat", "_klon", "_d", "_rk"))


def _split_days(episodes: DataFrame, tz: str = "UTC") -> DataFrame:
    """Split episodes at local-tz midnights (native sequence + explode; no
    UDF) and clip durations per day.  Adds `day` (yyyy-MM-dd) and `dur_s`."""
    eps = episodes
    if tz != "UTC":
        eps = (eps.withColumn("start_ts", F.from_utc_timestamp("start_ts", tz))
                  .withColumn("end_ts", F.from_utc_timestamp("end_ts", tz)))
    days = F.sequence(F.date_trunc("DAY", F.col("start_ts")),
                      F.date_trunc("DAY", F.col("end_ts")),
                      F.expr("interval 1 day"))
    e = eps.withColumn("day0", F.explode(days))
    clip_start = F.greatest(epoch_s(F.col("start_ts")), epoch_s(F.col("day0")))
    clip_end = F.least(epoch_s(F.col("end_ts")),
                       epoch_s(F.col("day0")) + F.lit(86400.0))
    dur = F.greatest(clip_end - clip_start, F.lit(0.0))
    return (e.withColumn("day", F.date_format("day0", "yyyy-MM-dd"))
            .withColumn("dur_s", dur).drop("day0"))


def day_summary(episodes: DataFrame, tz: str = "UTC") -> DataFrame:
    """A7 — per host x calendar day: seconds at activity/travel/unknown and
    episode count.  Multi-day episodes are split at local-tz midnights via
    sequence + explode (native; no UDF)."""
    return (_split_days(episodes, tz)
            .groupBy("host", "day")
            .agg(F.round(F.sum(F.when(F.col("kind") == "activity",
                                      F.col("dur_s")).otherwise(0.0)), 6)
                 .alias("activity_s"),
                 F.round(F.sum(F.when(F.col("kind") == "travel",
                                      F.col("dur_s")).otherwise(0.0)), 6)
                 .alias("travel_s"),
                 F.round(F.sum(F.when(F.col("kind") == "unknown",
                                      F.col("dur_s")).otherwise(0.0)), 6)
                 .alias("unknown_s"),
                 F.countDistinct(F.when(F.col("kind") == "activity",
                                        F.col("seq"))).alias("n_activities")))


def day_summary_labeled(episodes: DataFrame, labeled_locations: DataFrame,
                        tz: str = "UTC") -> DataFrame:
    """A7 (full) — the reference's headline report (REF day.py [L] + REF
    main.py survey home/work/study match [M]): per host x calendar day,
    seconds at home / work / study / other (labeled-or-not) activity,
    travel and unknown, plus the activity count.

    `labeled_locations` is label_locations' (J2) output: (host,
    location_id, label) with label in {home, work, study, ...} or null.
    The join is a plain equi-join on (host, location_id) — the label table
    is the A4 location table (small per host but unbounded globally), so
    broadcast-vs-shuffle is left to AQE's runtime stats rather than forced.
    """
    lab = labeled_locations.select(
        F.col("host").alias("_lh"), F.col("location_id").alias("_lid"),
        F.col("label").alias("_lab"))
    eps = episodes.join(
        lab, (F.col("host") == F.col("_lh"))
        & (F.col("location_id") == F.col("_lid")), "left").drop("_lh", "_lid")
    cat = (F.when(F.col("kind") != "activity", F.col("kind"))
           .otherwise(F.coalesce(F.col("_lab"), F.lit("other"))))
    e = _split_days(eps.withColumn("_cat", cat), tz)

    def cat_s(name: str, alias: str):
        return F.round(F.sum(F.when(F.col("_cat") == name,
                                    F.col("dur_s")).otherwise(0.0)),
                       6).alias(alias)

    return (e.groupBy("host", "day")
            .agg(cat_s("home", "home_s"), cat_s("work", "work_s"),
                 cat_s("study", "study_s"), cat_s("other", "other_activity_s"),
                 cat_s("travel", "travel_s"), cat_s("unknown", "unknown_s"),
                 F.countDistinct(F.when(F.col("kind") == "activity",
                                        F.col("seq"))).alias("n_activities")))
