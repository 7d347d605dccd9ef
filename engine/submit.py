"""spark-submit job entry (north_rule: `spark-submit --py-files` jobs).

Packages the engine for a real cluster and runs the full pipeline as a
sequence of resumable bucketed stages:

    python -m engine.submit --help
    spark-submit --py-files engine.zip engine/submit.py \
        --input /data/web_pages --workdir /data/out --buckets 256

On the sandbox this runs in local mode; on a cluster the same file works
unchanged (get_spark respects an externally provided master via
spark-submit, because SparkSession.builder only sets master when absent).
Build the zip with:  python -m engine.submit --make-zip engine.zip
"""

from __future__ import annotations

import argparse
import sys
import zipfile
from pathlib import Path


def make_zip(out: str) -> None:
    root = Path(__file__).resolve().parent
    with zipfile.ZipFile(out, "w") as z:
        for p in sorted(root.glob("*.py")):
            z.write(p, f"engine/{p.name}")
    print(f"wrote {out}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="web_pages table path (parquet/Iceberg-emulated)")
    ap.add_argument("--workdir", help="output root for stage tables")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--make-zip", dest="make_zip_path")
    args = ap.parse_args(argv)
    if args.make_zip_path:
        make_zip(args.make_zip_path)
        return 0
    if not args.input or not args.workdir:
        ap.error("--input and --workdir required")

    from engine import episodes as ep
    from engine import locations as loc
    from engine import catalog, tiles, trace_prep
    from engine.config import DEFAULT
    from engine.session import get_spark

    master = f"local[{args.cpus}]" if args.cpus else None
    spark = get_spark("trip-tiler-submit", master=master)
    wd = Path(args.workdir)

    from engine.functions import host_from_url
    from pyspark.sql import functions as F
    # bucket key = host (NOT url): per-host kernels need complete hosts
    # inside each chunk
    catalog.run_bucketed_stage(
        spark, "geopoints", args.input, wd / "geopoints",
        lambda pages: trace_prep.geopoints(pages, DEFAULT),
        n_buckets=args.buckets, key_expr=host_from_url(F.col("url")))
    catalog.run_bucketed_stage(
        spark, "locations", wd / "geopoints", wd / "locations",
        lambda gp: loc.detect_locations(gp, DEFAULT),
        n_buckets=args.buckets)
    def episodes_stage(gp):
        locs = catalog.read_table(spark, wd / "locations")
        # auto strategy pick: closure-broadcast kNN (zero point-set
        # exchanges) while locations fit the broadcast envelope, cell-cover
        # join past it — the ceiling is enforced, not assumed
        return ep.build_episodes(ep.knn_assign_auto(gp, locs, DEFAULT),
                                 DEFAULT)
    catalog.run_bucketed_stage(
        spark, "episodes", wd / "geopoints", wd / "episodes",
        episodes_stage, n_buckets=args.buckets)
    sites_den = tiles.cell_density(
        trace_prep.interpolate_sites(
            catalog.read_table(spark, wd / "geopoints"), DEFAULT), DEFAULT,
        salted=True)  # hot-cell skew guard (BASELINE.json mandate)
    pyr = tiles.rollup_pyramid(sites_den, DEFAULT)
    pyr.write.mode("overwrite").partitionBy("level").parquet(str(wd / "tiles"))
    print("pipeline complete:", {p.name: True for p in wd.iterdir()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
