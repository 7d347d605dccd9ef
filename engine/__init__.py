"""spark-trip-tiler — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of
SAUSy-Lab/itinerum-trip-breaker (time-weighted Gaussian-KDE activity-location
detection, distance/dwell-threshold episode segmentation, per-user ordered
trace processing) as S2-style cell-indexed DataFrame operators over a
Common-Crawl-style ``web_pages`` table.  See SURVEY.md for the operator
inventory (§2) and the normative algorithm spec (§2.9).

Modules
-------
config      — normative scalar constants (SURVEY.md §2.9)
geo         — pure-numpy geo core: haversine, S2-style cell ids, PIP (§7.2)
session     — SparkSession builder with scale-aware defaults
datagen     — deterministic synthetic ``web_pages``/polygons (FIXTURES.md)
trace_prep  — scans, filters, geotag extraction, sessionization, weights (§7.3)
locations   — per-host KDE activity-location kernel (§7.4)
episodes    — kNN assignment + episode segmentation (§7.5)
tiles       — raster<->vector KDE tiling, point-in-polygon join, skew utils (§7.7)
catalog     — Iceberg-emulated partitioned parquet + manifest/lineage (§7.6)
text        — web-text ops: dedup, lang-id, quality, fingerprints
similarity  — embedding similarity search (brute-force + LSH-bucketed)
"""

__version__ = "0.1.0"
