"""Per-round benchmark (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the end-to-end wall time of the headline geo pipeline; the
queries dict carries per-stage seconds plus the throughput figures the
BASELINE.json metric asks for (docs/sec through spatial-join +
tile-assignment).  Scaling-efficiency evidence (local[8] vs local[32]) is
produced by tools/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from engine import episodes as ep
    from engine import locations as loc
    from engine import similarity, text, tiles, trace_prep
    from engine.config import DEFAULT
    from engine.datagen import web_pages_from_events
    from engine.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
    timings: dict[str, float] = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pages = web_pages_from_events(events)
    n_docs = pages.count()

    t_geo0 = time.perf_counter()
    with stage("trace_prep"):
        gp = trace_prep.geopoints(pages, DEFAULT)
        gp.persist()
        n_points = gp.count()
    with stage("locations_kde"):
        locations = loc.detect_locations(gp, DEFAULT)
        locations.persist()
        n_locs = locations.count()
    with stage("knn_episodes"):
        assigned = ep.knn_assign(gp, locations, DEFAULT)
        episodes = ep.build_episodes(assigned, DEFAULT)
        n_eps = episodes.count()
    with stage("tiles_pyramid"):
        sites = trace_prep.interpolate_sites(gp, DEFAULT)
        pyr = tiles.rollup_pyramid(
            tiles.cell_density(sites, DEFAULT, salted=True), DEFAULT)
        n_tiles = pyr.count()
    geo_secs = time.perf_counter() - t_geo0

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with stage("dedup_minhash"):
        text.dedup_minhash(docs, threshold=0.5).count()
    with stage("ann_topk"):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        similarity.ann_cosine_topk(emb, k=5, dim=64, bits=12, bands=6).count()

    out = {
        "metric": "geo_pipeline_wall",
        "value": round(geo_secs, 3),
        "unit": "sec",
        "queries": {**timings,
                    "docs_per_sec": round(n_docs / geo_secs, 1),
                    "n_docs": n_docs, "n_geopoints": n_points,
                    "n_locations": n_locs, "n_episodes": n_eps,
                    "n_tiles": n_tiles, "cpus": cpus},
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
