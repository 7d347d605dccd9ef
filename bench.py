"""Per-round benchmark (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the end-to-end wall time of the headline geo pipeline; the
queries dict carries per-stage seconds plus the throughput figures the
BASELINE.json metric asks for (docs/sec through spatial-join +
tile-assignment).  Scaling-efficiency evidence (local[8] vs local[32]) is
produced by tools/scaling_bench.py -> BENCH/BASELINE.md.

Methodology: the whole suite runs $SPARK_GRAFT_BENCH_ITERS times (default
2) inside ONE JVM and reports the per-stage MINIMUM — steady-state numbers.
This sandbox is a microVM on a shared host with 2-10x run-to-run CPU/memory
weather; the first iteration also pays JIT + page-cache warmup that a real
cluster amortizes away.  Caches are dropped between iterations so every
iteration recomputes the full pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def run_suite(spark, sf_dir: str) -> tuple[dict, dict, float]:
    from engine import episodes as ep
    from engine import locations as loc
    from engine import similarity, text, tiles, trace_prep
    from engine.config import DEFAULT
    from engine.datagen import web_pages_from_events

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pages = web_pages_from_events(events)
    counts["n_docs"] = pages.count()

    t_geo0 = time.perf_counter()
    with stage("trace_prep"):
        gp = trace_prep.geopoints(pages, DEFAULT)
        gp.persist()
        counts["n_geopoints"] = gp.count()
    with stage("locations_kde"):
        locations = loc.detect_locations(
            gp, DEFAULT, n_points_hint=counts["n_geopoints"])
        locations.persist()
        counts["n_locations"] = locations.count()
    with stage("knn_episodes"):
        # auto strategy pick: closure-broadcast index (ZERO point-set
        # exchanges) while the location table fits the broadcast envelope,
        # cell-cover join past it (parity is tested).  n_locations is
        # already counted above, so the pick costs nothing.
        assigned = ep.knn_assign_auto(gp, locations, DEFAULT,
                                      n_locations_hint=counts["n_locations"])
        episodes = ep.build_episodes(
            assigned, DEFAULT,
            presorted=assigned.knn_strategy == "collected")
        counts["n_episodes"] = episodes.count()
    with stage("tiles_pyramid"):
        sites = trace_prep.interpolate_sites(gp, DEFAULT)
        pyr = tiles.rollup_pyramid(
            tiles.cell_density(sites, DEFAULT, salted=True), DEFAULT)
        counts["n_tiles"] = pyr.count()
    geo_secs = time.perf_counter() - t_geo0
    gp.unpersist()
    locations.unpersist()

    # The sf tables are single small parquet files -> Spark reads them as
    # ONE split, serializing all per-doc map work on one core.  A real
    # corpus arrives as millions of splits; repartition to restore the
    # multi-split layout the operators are designed for (the shuffle is
    # ~MBs, timed inside the stage so it's not hidden).
    n_split = max(2 * int(spark.sparkContext.defaultParallelism), 2)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(n_split)
    with stage("dedup_minhash"):
        text.dedup_minhash(docs, threshold=0.5).count()
    with stage("dedup_spans"):
        text.dedup_spans(docs, n=10, min_count=2).count()
    with stage("ann_topk"):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
            .repartition(n_split)
        similarity.ann_cosine_topk(emb, k=5, dim=64, bits=12, bands=6).count()
    with stage("ann_topk_ivf"):
        similarity.ivf_cosine_topk(emb, k=5, n_centroids=32, nprobe=8,
                                   dim=64).count()
    with stage("ann_topk_pq"):
        from pyspark.sql import functions as _F
        similarity.pq_adc_topk(emb, emb.filter(_F.col("vec_id") % 100 == 0),
                               k=5, m=4, n_codes=16, iters=2, dim=64).count()
    with stage("ann_topk_ivfpq"):
        similarity.ivfpq_topk(emb, emb.filter(_F.col("vec_id") % 100 == 0),
                              k=5, n_cells=32, nprobe=8, m=4, n_codes=16,
                              dim=64).count()
    with stage("kmeans"):
        from engine import clustering
        clustering.kmeans_lloyd(emb, k=8, iters=4).count()
    with stage("bpe_tokenizer"):
        from engine.tokenizer import bpe_encode, bpe_train
        merges, _ = bpe_train(docs, rounds=8)
        bpe_encode(docs, merges).count()
    with stage("pack_sequences"):
        text.pack_sequences(docs, capacity=512).count()
    with stage("heavy_hitters"):
        from engine.sketch import heavy_hitters_mg
        heavy_hitters_mg(docs, k=48).count()
    with stage("quality_classifier"):
        from engine.classifier import (apply_classifier,
                                       train_quality_classifier)
        from engine.text import tokens_col
        label = _F.array_contains(tokens_col(_F.col("text")), _F.lit("spark"))
        wq, feats = train_quality_classifier(docs, label)
        apply_classifier(feats, wq).count()
        feats.unpersist()
    with stage("dedup_paragraphs"):
        paradocs = docs.select(
            "doc_id", _F.replace(_F.col("text"), _F.lit(" table "),
                                 _F.lit("\n")).alias("text"))
        text.dedup_paragraphs(paradocs).count()
    with stage("fuzzy_pairs"):
        titles = docs.select("doc_id",
                             _F.substring("text", 1, 16).alias("title"))
        text.fuzzy_pairs(titles, text_col="title", max_dist=2).count()
    with stage("decontaminate_bloom"):
        text.decontaminate_bloom(
            docs, docs.filter(_F.col("doc_id") % 13 == 0), n=3).count()
    with stage("pca_power"):
        from engine.decomposition import pca_power_quant
        pca_power_quant(emb).count()
    return timings, counts, geo_secs


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    from engine.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))

    best_t: dict[str, float] = {}
    counts: dict[str, int] = {}
    best_geo = float("inf")
    for _ in range(max(1, iters)):
        timings, counts_i, geo_secs = run_suite(spark, sf_dir)
        counts = counts_i  # identical across iterations (deterministic)
        best_geo = min(best_geo, geo_secs)
        for k, v in timings.items():
            best_t[k] = min(best_t.get(k, float("inf")), v)

    out = {
        "metric": "geo_pipeline_wall",
        "value": round(best_geo, 3),
        "unit": "sec",
        "queries": {**best_t,
                    "docs_per_sec": round(counts["n_docs"] / best_geo, 1),
                    **counts, "cpus": cpus, "iters": max(1, iters)},
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
