"""Two-parallelism scaling evidence (BASELINE.md protocol; north_rule).

Runs the SAME geo pipeline job on the SAME 1M-row synthetic web_pages corpus
(FIXTURES.md bench scale: 2000 Zipf hosts, >= 64 parquet splits) at
local[8] ("N executors") and local[32] ("4N executors"), each in a fresh
JVM via subprocess, and writes BENCH/BASELINE.md with:

  * docs/sec at both parallelism levels,
  * efficiency = (throughput_32 / throughput_8) / 4   (target >= 0.8),
  * a determinism checksum: sorted episode output must be byte-identical
    across the two runs (SURVEY.md §5.2.3).

Usage: python tools/scaling_bench.py [--rows 1000000] [--hosts 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRATCH = REPO / ".bench_scratch"

RUN_SNIPPET = r"""
import hashlib, json, sys, time
sys.path.insert(0, {repo!r})
from engine.session import get_spark
from engine import trace_prep, locations as L, episodes as E, tiles
from engine.config import DEFAULT
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus)
pages = spark.read.parquet({data!r})
n_docs = pages.count()
t0 = time.perf_counter()
gp = trace_prep.geopoints(pages, DEFAULT).persist()
gp.count()
locs = L.detect_locations(gp, DEFAULT).persist()
locs.count()
assigned = E.knn_assign(gp, locs, DEFAULT)
eps = E.build_episodes(assigned, DEFAULT)
sites = trace_prep.interpolate_sites(gp, DEFAULT)
pyr = tiles.rollup_pyramid(tiles.cell_density(sites, DEFAULT), DEFAULT)
n_eps = eps.count()
n_tiles = pyr.count()
secs = time.perf_counter() - t0
rows = (eps.select("host", "seq", F.col("start_ts").cast("string"),
                   F.col("end_ts").cast("string"), "kind",
                   F.col("location_id").cast("string"))
        .toPandas().sort_values(["host", "seq"]))
digest = hashlib.sha256(rows.to_csv(index=False).encode()).hexdigest()
print(json.dumps({{"cpus": cpus, "secs": round(secs, 2), "n_docs": n_docs,
                  "docs_per_sec": round(n_docs / secs, 1),
                  "n_episodes": n_eps, "n_tiles": n_tiles,
                  "episodes_sha256": digest}}))
"""


def ensure_corpus(rows: int, hosts: int) -> Path:
    out = SCRATCH / f"web_pages_{hosts}x{rows}"
    if (out / "_SUCCESS").exists():
        return out
    print(f"generating bench corpus ({hosts} hosts, ~{rows} rows) ...",
          file=sys.stderr)
    sys.path.insert(0, str(REPO))
    from engine.datagen import gen_web_pages, pages_to_spark
    from engine.session import get_spark
    pages, _, _ = gen_web_pages(n_hosts=hosts, total_pages=rows, seed=42,
                                processes=16)
    spark = get_spark("corpus-gen", master="local[32]")
    sdf = pages_to_spark(spark, pages)
    (sdf.repartition(max(64, rows // 62_500))
     .write.mode("overwrite").parquet(str(out)))
    spark.stop()
    return out


def run_once(data: Path, cpus: int) -> dict:
    code = RUN_SNIPPET.format(repo=str(REPO), data=str(data))
    env = dict(os.environ)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code, str(cpus)],
                       capture_output=True, text=True, env=env, check=False)
    if r.returncode != 0:
        print(r.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"run at local[{cpus}] failed")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    d["wall_incl_startup"] = round(time.time() - t0, 1)
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--hosts", type=int, default=2000)
    ap.add_argument("--cpus", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()
    data = ensure_corpus(args.rows, args.hosts)
    lo, hi = args.cpus
    a = run_once(data, lo)
    b = run_once(data, hi)
    eff = (b["docs_per_sec"] / a["docs_per_sec"]) / (hi / lo)
    identical = a["episodes_sha256"] == b["episodes_sha256"]
    md = f"""# BENCH/BASELINE.md — scaling evidence (BASELINE.md protocol)

Same job (web_pages -> trace prep -> KDE locations -> kNN episodes -> tile
pyramid), same input ({a['n_docs']:,} docs, 64 parquet splits, Zipf-1.2
hosts), two parallelism levels, fresh JVM each (tools/scaling_bench.py):

| run | master | wall (s) | docs/sec | episodes | tiles |
|---|---|---|---|---|---|
| A (N)  | local[{lo}]  | {a['secs']} | {a['docs_per_sec']:,} | {a['n_episodes']:,} | {a['n_tiles']:,} |
| B (4N) | local[{hi}] | {b['secs']} | {b['docs_per_sec']:,} | {b['n_episodes']:,} | {b['n_tiles']:,} |

**Scaling efficiency = (tput_B / tput_A) / {hi // lo} = {eff:.3f}**  (target >= 0.8)

Determinism: sorted episode output byte-identical across runs: **{identical}**
(sha256 {a['episodes_sha256'][:16]}...)

Caveats: single machine, shared memory bandwidth and JVM; local[k] models
executor parallelism, not network shuffle.  Reference publishes no numbers
(BASELINE.md) — these figures are the engine's own baseline to beat.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print(md)
    print(json.dumps({"efficiency": round(eff, 3), "identical": identical,
                      "a": a, "b": b}))
    return 0 if (eff >= 0.8 and identical) else 1


if __name__ == "__main__":
    raise SystemExit(main())
