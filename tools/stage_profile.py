"""Per-stage scaling profile: times each pipeline stage separately at two
parallelism levels to locate serial floors (Amdahl terms) that cap the
BASELINE.md scaling-efficiency gate.

Each level runs in a fresh JVM (subprocess).  Stages are materialized with
persist()+count() so a stage's time is its own, not its parents'.

Usage: python tools/stage_profile.py [--cpus 8 32] [--iters 2]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from engine.session import get_spark
from engine import trace_prep, locations as L, episodes as E, tiles
from engine.config import DEFAULT

cpus = int(sys.argv[1])
iters = int(sys.argv[2])
spark = get_spark("stage-profile", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus)
pages = spark.read.parquet({data!r})
pages.count()

def once():
    t = {{}}
    t0 = time.perf_counter()
    gp = trace_prep.geopoints(pages, DEFAULT).persist()
    gp.count()
    t["trace_prep"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    locs = L.detect_locations(gp, DEFAULT).persist()
    locs.count()
    t["locations"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    assigned = E.knn_assign_auto(gp, locs, DEFAULT)
    eps = E.build_episodes(assigned, DEFAULT,
                           presorted=assigned.knn_strategy == "collected"
                           ).persist()
    eps.count()
    t["episodes"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sites = trace_prep.interpolate_sites(gp, DEFAULT)
    pyr = tiles.rollup_pyramid(tiles.cell_density(sites, DEFAULT), DEFAULT)
    pyr.count()
    t["tiles"] = time.perf_counter() - t0

    for df in (gp, locs, eps):
        df.unpersist()
    t["total"] = sum(t.values())
    return t

runs = [once() for _ in range(iters)]
best = {{k: min(r[k] for r in runs) for k in runs[0]}}
print(json.dumps({{"cpus": cpus, "best": best, "runs": runs}}))
"""


def run_level(data: Path, cpus: int, iters: int) -> dict:
    code = SNIPPET.format(repo=str(REPO), data=str(data))
    r = subprocess.run([sys.executable, "-c", code, str(cpus), str(iters)],
                       capture_output=True, text=True, check=False)
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"profile at local[{cpus}] failed")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--hosts", type=int, default=4000)
    ap.add_argument("--cpus", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()
    data = REPO / ".bench_scratch" / f"web_pages_{args.hosts}x{args.rows}"
    if not (data / "_SUCCESS").exists():
        raise SystemExit(f"corpus missing: {data} (run scaling_bench first)")
    lo, hi = args.cpus
    a = run_level(data, lo, args.iters)
    time.sleep(20)
    b = run_level(data, hi, args.iters)
    ratio = hi / lo
    print(f"\nstage        local[{lo}]  local[{hi}]  speedup  eff")
    for k in a["best"]:
        sp = a["best"][k] / b["best"][k]
        print(f"{k:<12} {a['best'][k]:>8.2f} {b['best'][k]:>9.2f} "
              f"{sp:>7.2f} {sp / ratio:>5.2f}")
    print(json.dumps({"lo": a, "hi": b}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
