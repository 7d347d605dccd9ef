"""Hilbert/z-order file layout + spatial data skipping (SURVEY.md §2.3).

The write-side twin of the reference's spatial indexing: lay the corpus
out on disk in Hilbert-cell order so spatially-close rows land in the
same files, then answer bbox queries by PRUNING PARTITION DIRECTORIES —
the Iceberg/Delta `ORDER BY zorder(...)` + partition-pruning pattern,
built on the repo's native cell encode (engine/functions.py — pure
whole-stage-codegen bit math, no UDF).

Scale shape: at 100 TB the win is that a bbox scan touches only the
cover's partitions — the cover is computed DRIVER-SIDE from the bbox
geometry alone (engine/geo.py polygon_cell_cover, a superset guarantee),
so pruning is static partition elimination, not a runtime filter.
Within a partition, rows are sorted by fine cell id, so parquet
row-group min/max stats prune further (cell_id range predicates push to
the scan).  The exact bbox refine runs only on the surviving rows —
false positives from the superset cover die there (the J4 cover/refine
contract).

Bucket ids ARE coarse cell ids: the Hilbert curve's prefix property
makes `parent_cell_col(cell_id, bucket_level)` equal `cell_encode` at
bucket_level (property-tested), so the same id vocabulary serves
encode, cover, and directory names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine import geo
from engine.functions import encode_cell_native, parent_cell_col


def zorder_keys(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon",
                level: int = 12, bucket_level: int = 4) -> DataFrame:
    """Attach `cell_id` (fine Hilbert cell) and `z_bucket` (coarse parent
    cell = the layout partition key).  Map-only native expressions."""
    df = encode_cell_native(df, lat_col, lon_col, "cell_id", level)
    return df.withColumn(
        "z_bucket", parent_cell_col(F.col("cell_id"), bucket_level))


def write_zorder(df: DataFrame, path: str, lat_col: str = "lat",
                 lon_col: str = "lon", level: int = 12,
                 bucket_level: int = 4) -> None:
    """Write the corpus Hilbert-clustered: one directory per coarse cell,
    rows inside sorted by fine cell id (row-group stats stay tight).  One
    shuffle (the repartition on the layout key) — the cost every
    cluster-by write pays once so that every later spatial read prunes."""
    (zorder_keys(df, lat_col, lon_col, level, bucket_level)
     .repartition("z_bucket")
     .sortWithinPartitions("z_bucket", "cell_id")
     .write.mode("overwrite").partitionBy("z_bucket").parquet(path))


def bbox_cover_buckets(lat_min: float, lat_max: float, lon_min: float,
                       lon_max: float, bucket_level: int = 4) -> list[int]:
    """Driver-side superset cover of the bbox at the layout's bucket
    level (polygon_cell_cover's dilated boundary + interior fill)."""
    ring = [(lon_min, lat_min), (lon_max, lat_min),
            (lon_max, lat_max), (lon_min, lat_max)]
    return [int(c) for c in geo.polygon_cell_cover(ring, bucket_level)]


def read_bbox(spark: SparkSession, path: str, lat_min: float,
              lat_max: float, lon_min: float, lon_max: float,
              lat_col: str = "lat", lon_col: str = "lon",
              bucket_level: int = 4) -> DataFrame:
    """Bbox scan over a write_zorder layout: static partition pruning via
    the cover bucket list, then the exact bbox refine on survivors."""
    buckets = bbox_cover_buckets(lat_min, lat_max, lon_min, lon_max,
                                 bucket_level)
    return (spark.read.parquet(path)
            .filter(F.col("z_bucket").isin(buckets))
            .filter((F.col(lat_col) >= lat_min) & (F.col(lat_col) <= lat_max)
                    & (F.col(lon_col) >= lon_min)
                    & (F.col(lon_col) <= lon_max)))
