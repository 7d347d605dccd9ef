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


def day_summary(episodes: DataFrame, tz: str = "UTC") -> DataFrame:
    """A7 — per host x calendar day: seconds at activity/travel/unknown and
    episode count.  Multi-day episodes are split at local-tz midnights via
    sequence + explode (native; no UDF)."""
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
            .withColumn("dur_s", dur)
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
