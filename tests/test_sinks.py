"""Sinks, J2 labeling, day summary, A8 agreement metrics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import episodes as ep
from engine import locations as loc
from engine import sinks, trace_prep
from engine.config import DEFAULT


@pytest.fixture(scope="module")
def pipeline_out(spark, unit_pages_sdf):
    gp = trace_prep.geopoints(unit_pages_sdf, DEFAULT).cache()
    locations = loc.detect_locations(gp, DEFAULT).cache()
    assigned = ep.knn_assign(gp, locations, DEFAULT).cache()
    episodes = ep.build_episodes(assigned, DEFAULT).cache()
    return gp, locations, assigned, episodes


def test_sinks_roundtrip(spark, pipeline_out, tmp_path):
    gp, locations, assigned, episodes = pipeline_out
    sinks.write_locations(locations, tmp_path / "locs")
    sinks.write_episodes(episodes, tmp_path / "eps")
    sinks.write_points(assigned, tmp_path / "pts")
    assert spark.read.parquet(str(tmp_path / "locs")).count() == locations.count()
    eps_back = spark.read.parquet(str(tmp_path / "eps"))
    assert eps_back.count() == episodes.count()
    assert set(eps_back.columns) == {"host", "seq", "start_ts", "end_ts",
                                     "kind", "location_id"}
    # CSV golden export
    sinks.write_episodes(episodes, tmp_path / "eps_csv", single_csv=True)
    csvs = list((tmp_path / "eps_csv").glob("*.csv"))
    assert len(csvs) == 1


def test_label_locations(spark, pipeline_out, unit_pages):
    _, locations, _, _ = pipeline_out
    _, stops, _ = unit_pages
    known = spark.createDataFrame(
        stops.assign(label=stops["stop_id"].map(lambda s: f"place{s}"))
        [["host", "label", "lat", "lon"]])
    labeled = sinks.label_locations(locations, known, DEFAULT).toPandas()
    assert len(labeled) == locations.count()
    # detected locations sit on planted stops -> nearly all labeled
    assert labeled["label"].notna().mean() > 0.9
    # and the label corresponds to the nearest stop
    merged = labeled.dropna(subset=["label"]).merge(
        stops.assign(label=stops["stop_id"].map(lambda s: f"place{s}")),
        on=["host", "label"], suffixes=("", "_stop"))
    from engine.geo import haversine_m
    d = haversine_m(merged["lat"], merged["lon"],
                    merged["lat_stop"], merged["lon_stop"])
    assert d.max() <= DEFAULT.cluster_distance_m


def test_day_summary_partitions_time(spark, pipeline_out):
    _, _, _, episodes = pipeline_out
    day = sinks.day_summary(episodes).toPandas()
    total_day = (day["activity_s"] + day["travel_s"] + day["unknown_s"]).sum()
    span = (episodes.groupBy("host")
            .agg((F.max(F.col("end_ts").cast("double"))
                  - F.min(F.col("start_ts").cast("double"))).alias("s"))
            .agg(F.sum("s")).collect()[0][0])
    assert abs(total_day - span) < 1e-3
    assert (day["activity_s"] <= 86400 + 1e-6).all()


def test_agreement_metrics_self_is_perfect(spark, pipeline_out):
    """A8: algorithm vs itself -> agreement 1.0 on every host."""
    _, _, _, episodes = pipeline_out
    m = ep.agreement_metrics(episodes, episodes).toPandas()
    assert len(m) > 0
    assert np.allclose(m["agreement"], 1.0)


def test_agreement_metrics_detects_disagreement(spark, pipeline_out):
    _, _, _, episodes = pipeline_out
    perturbed = episodes.withColumn(
        "kind", F.when(F.col("kind") == "travel", F.lit("unknown"))
                 .otherwise(F.col("kind")))
    m = ep.agreement_metrics(episodes, perturbed).toPandas()
    # hosts with travel episodes must drop below 1.0
    assert (m["agreement"] < 1.0).any()
    assert (m["agreement"] <= 1.0 + 1e-9).all()


def test_ground_truth_csv_roundtrip_compare(spark, pipeline_out, tmp_path):
    """S3/E3: episodes written as a labeled CSV read back via
    read_ground_truth and compared — self-agreement 1.0; a malformed row is
    dropped, not fatal."""
    from engine import sinks
    _, _, _, episodes = pipeline_out
    p = tmp_path / "truth_csv"
    (episodes.select("host", "start_ts", "end_ts", "kind", "location_id")
     .coalesce(1).write.mode("overwrite").option("header", True).csv(str(p)))
    # append a malformed line to the part file
    part = next(p.glob("part-*.csv"))
    with open(part, "a") as fh:
        fh.write("hostX,not-a-ts,also-not,activity,1\n")
    for crc in p.glob(".*.crc"):  # stale hadoop checksums after the append
        crc.unlink()
    truth = sinks.read_ground_truth(spark, p)
    assert truth.count() == episodes.count()  # malformed row dropped
    m = sinks.compare_to_ground_truth(episodes, truth).toPandas()
    assert np.allclose(m["agreement"], 1.0)
