"""Hilbert/z-order layout: write clustering + partition-pruned bbox reads
(engine/layout.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import geo, layout

BBOX = (40.0, 42.0, -75.0, -72.0)          # lat_min, lat_max, lon_min, lon_max


@pytest.fixture(scope="module")
def points_df(spark):
    rng = np.random.default_rng(7)
    n = 4000
    lat = rng.uniform(-60.0, 60.0, n)
    lon = rng.uniform(-179.0, 179.0, n)
    # plant a dense cluster inside the query bbox so the read is non-empty
    lat[:300] = rng.uniform(BBOX[0], BBOX[1], 300)
    lon[:300] = rng.uniform(BBOX[2], BBOX[3], 300)
    return spark.createDataFrame(
        [(int(i), float(a), float(o)) for i, (a, o) in
         enumerate(zip(lat, lon))], ["pid", "lat", "lon"])


def test_bucket_is_coarse_encode(spark, points_df):
    """Prefix property: parent_cell_col(cell@12, 4) == cell_encode@4 —
    the layout's directory names ARE coarse cell ids, so the driver-side
    cover (computed at bucket level) speaks the same vocabulary."""
    keyed = layout.zorder_keys(points_df, level=12, bucket_level=4)
    pdf = keyed.select("lat", "lon", "z_bucket").toPandas()
    direct = geo.cell_encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 4)
    assert (pdf["z_bucket"].to_numpy() == direct).all()


@pytest.fixture(scope="module")
def layout_path(spark, points_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zorder") / "t")
    layout.write_zorder(points_df, path, level=12, bucket_level=4)
    return path


def test_bbox_read_prunes_partitions(spark, points_df, layout_path):
    path = layout_path
    la, lb, oa, ob = BBOX
    got = layout.read_bbox(spark, path, la, lb, oa, ob)

    # correctness: identical rows to the brute-force bbox filter
    brute = points_df.filter(
        (F.col("lat") >= la) & (F.col("lat") <= lb)
        & (F.col("lon") >= oa) & (F.col("lon") <= ob))
    assert sorted(r["pid"] for r in got.collect()) == \
        sorted(r["pid"] for r in brute.collect())
    assert got.count() >= 300

    # pruning: the scan must read only the cover's directories — a strict
    # minority of the layout's partitions for a 2x3-degree bbox
    total = (spark.read.parquet(path)
             .select("z_bucket").distinct().count())
    cover = set(layout.bbox_cover_buckets(la, lb, oa, ob, 4))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z_bucket" in plan, plan
    assert len(cover) < total / 2, (len(cover), total)
    # every matching row's bucket really is in the cover (superset proof)
    in_cover = (spark.read.parquet(path)
                .filter((F.col("lat") >= la) & (F.col("lat") <= lb)
                        & (F.col("lon") >= oa) & (F.col("lon") <= ob))
                .select("z_bucket").distinct().collect())
    assert {r["z_bucket"] for r in in_cover} <= cover


def test_rows_sorted_by_cell_within_files(spark, layout_path):
    """Row-group stat tightness: within each written file, cell_id is
    nondecreasing (sortWithinPartitions survived the write)."""
    df = (spark.read.parquet(layout_path)
          .select("cell_id",
                  F.input_file_name().alias("f"),
                  F.monotonically_increasing_id().alias("rid")))
    pdf = df.toPandas()
    for _, g in pdf.groupby("f"):
        cells = g.sort_values("rid")["cell_id"].to_numpy()
        assert (np.diff(cells) >= 0).all()
