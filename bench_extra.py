"""Substage profiler for the bench stages (guide §1.4: noop-sink isolation).

NOT part of the driver contract — bench.py is the frozen measurement.  This
file exists to locate where each bench stage's wall time goes (per guide
§1.1 empirical loop) and to A/B candidate optimizations before they land.

Usage: python bench_extra.py [stage ...]   (default: all)
Prints one JSON line per substage: {"stage": ..., "sub": ..., "sec": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, stage, sub, fn, iters=2):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"stage": stage, "sub": sub, "sec": round(best, 3)}),
          flush=True)
    return best


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    which = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from engine import episodes as ep
    from engine import locations as loc
    from engine import similarity, text, tiles, trace_prep
    from engine.config import DEFAULT
    from engine.datagen import web_pages_from_events
    from engine.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(2 * cpus, 16))
    sc = spark.sparkContext

    def want(s):
        return not which or s in which

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    pages = web_pages_from_events(events)
    n_split = max(2 * int(sc.defaultParallelism), 2)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(n_split)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .repartition(n_split)

    if want("trace_prep"):
        sc.setJobDescription("profile trace_prep")
        timed(spark, "trace_prep", "pages_gen", lambda: noop(pages))
        extr = trace_prep.extract_points(pages, DEFAULT)
        timed(spark, "trace_prep", "extract_points", lambda: noop(extr))
        prep = trace_prep.prep_points(extr, DEFAULT)
        timed(spark, "trace_prep", "prep_points", lambda: noop(prep))
        gp_df = trace_prep.geopoints(pages, DEFAULT)
        timed(spark, "trace_prep", "full_noop", lambda: noop(gp_df))

    gp = trace_prep.geopoints(pages, DEFAULT).persist()
    n_gp = gp.count()

    if want("locations_kde"):
        sc.setJobDescription("profile locations_kde")
        timed(spark, "locations_kde", "wholehost", lambda: noop(
            loc.detect_locations(gp, DEFAULT, n_points_hint=n_gp)))
        timed(spark, "locations_kde", "chunked", lambda: noop(
            loc.detect_locations(gp, DEFAULT, strategy="chunked")))

    if want("knn_episodes"):
        sc.setJobDescription("profile knn_episodes")
        locs = loc.detect_locations(gp, DEFAULT, n_points_hint=n_gp).persist()
        n_loc = locs.count()

        def full():
            assigned = ep.knn_assign_auto(gp, locs, DEFAULT,
                                          n_locations_hint=n_loc)
            noop(ep.build_episodes(
                assigned, DEFAULT,
                presorted=assigned.knn_strategy == "collected"))
        timed(spark, "knn_episodes", "full", full)
        assigned = ep.knn_assign_auto(gp, locs, DEFAULT,
                                      n_locations_hint=n_loc)
        timed(spark, "knn_episodes", "assign_only", lambda: noop(assigned))

    if want("tiles_pyramid"):
        sc.setJobDescription("profile tiles_pyramid")
        sites = trace_prep.interpolate_sites(gp, DEFAULT)
        timed(spark, "tiles_pyramid", "sites", lambda: noop(sites))
        dens = tiles.cell_density(sites, DEFAULT, salted=True)
        timed(spark, "tiles_pyramid", "density_salted", lambda: noop(dens))
        timed(spark, "tiles_pyramid", "density_plain", lambda: noop(
            tiles.cell_density(sites, DEFAULT, salted=False)))
        pyr = tiles.rollup_pyramid(dens, DEFAULT)
        timed(spark, "tiles_pyramid", "full_noop", lambda: noop(pyr))

    if want("ann_topk"):
        sc.setJobDescription("profile ann_topk")
        bk = similarity.lsh_sign_buckets(
            emb.select("vec_id", "embedding"), 64, 12, 6)
        timed(spark, "ann_topk", "buckets", lambda: noop(bk))
        exploded = bk.select(
            F.col("vec_id"), F.posexplode("_buckets").alias("band", "bucket"))
        l = exploded.select(F.col("vec_id").alias("a"), "band", "bucket")
        r = exploded.select(F.col("vec_id").alias("b"), "band", "bucket")
        pairs = (l.join(r, ["band", "bucket"]).filter(F.col("a") < F.col("b"))
                 .select("a", "b").distinct())
        timed(spark, "ann_topk", "pairs_distinct", lambda: noop(pairs))
        sims, _caches = similarity._lsh_candidate_sims(
            emb, 64, 12, 6, "vec_id", "embedding", 42)
        timed(spark, "ann_topk", "cand_sims", lambda: noop(sims))
        for _c in _caches:
            _c.unpersist()
        timed(spark, "ann_topk", "full_noop", lambda: noop(
            similarity.ann_cosine_topk(emb, k=5, dim=64, bits=12, bands=6)))

    if want("ann_topk_ivf"):
        sc.setJobDescription("profile ann_topk_ivf")
        timed(spark, "ann_topk_ivf", "train_centroids", lambda:
              similarity._train_centroids(emb, 32, 64, "vec_id", "embedding",
                                          42))
        timed(spark, "ann_topk_ivf", "full_noop", lambda: noop(
            similarity.ivf_cosine_topk(emb, k=5, n_centroids=32, nprobe=8,
                                       dim=64)))

    if want("ann_topk_pq"):
        sc.setJobDescription("profile ann_topk_pq")
        q = emb.filter(F.col("vec_id") % 100 == 0)
        timed(spark, "ann_topk_pq", "train_encode", lambda:
              noop(similarity.pq_train_encode(emb, m=4, n_codes=16,
                                              iters=2, dim=64)[0]))
        timed(spark, "ann_topk_pq", "full_noop", lambda: noop(
            similarity.pq_adc_topk(emb, q, k=5, m=4, n_codes=16, iters=2,
                                   dim=64)))

    if want("ann_topk_ivfpq"):
        sc.setJobDescription("profile ann_topk_ivfpq")
        q = emb.filter(F.col("vec_id") % 100 == 0)
        timed(spark, "ann_topk_ivfpq", "full_noop", lambda: noop(
            similarity.ivfpq_topk(emb, q, k=5, n_cells=32, nprobe=8, m=4,
                                  n_codes=16, dim=64)))

    if want("kmeans"):
        from engine import clustering
        sc.setJobDescription("profile kmeans")
        timed(spark, "kmeans", "full_noop", lambda: noop(
            clustering.kmeans_lloyd(emb, k=8, iters=4)))

    if want("bpe_tokenizer"):
        from engine.tokenizer import bpe_encode, bpe_train
        sc.setJobDescription("profile bpe")

        def train():
            bpe_train(docs, rounds=8)
        timed(spark, "bpe_tokenizer", "train", train)
        merges, _ = bpe_train(docs, rounds=8)
        timed(spark, "bpe_tokenizer", "encode", lambda: noop(
            bpe_encode(docs, merges)))

    if want("heavy_hitters"):
        from engine.sketch import heavy_hitters_mg
        sc.setJobDescription("profile heavy_hitters")
        timed(spark, "heavy_hitters", "full_noop", lambda: noop(
            heavy_hitters_mg(docs, k=48)))

    if want("quality_classifier"):
        from engine.classifier import apply_classifier, train_quality_classifier
        from engine.text import tokens_col
        sc.setJobDescription("profile classifier")

        def full():
            label = F.array_contains(tokens_col(F.col("text")),
                                     F.lit("spark"))
            wq, feats = train_quality_classifier(docs, label)
            noop(apply_classifier(feats, wq))
            feats.unpersist()
        timed(spark, "quality_classifier", "full", full)

    if want("dedup_minhash"):
        sc.setJobDescription("profile dedup_minhash")
        timed(spark, "dedup_minhash", "full_noop", lambda: noop(
            text.dedup_minhash(docs, threshold=0.5)))

    if want("fuzzy_pairs"):
        sc.setJobDescription("profile fuzzy_pairs")
        titles = docs.select("doc_id",
                             F.substring("text", 1, 16).alias("title"))
        timed(spark, "fuzzy_pairs", "full_noop", lambda: noop(
            text.fuzzy_pairs(titles, text_col="title", max_dist=2)))

    if want("decontaminate_bloom"):
        sc.setJobDescription("profile decontaminate_bloom")
        timed(spark, "decontaminate_bloom", "full_noop", lambda: noop(
            text.decontaminate_bloom(
                docs, docs.filter(F.col("doc_id") % 13 == 0), n=3)))

    if want("pca_power"):
        from engine.decomposition import pca_power_quant
        sc.setJobDescription("profile pca")
        timed(spark, "pca_power", "full_noop", lambda: noop(
            pca_power_quant(emb)))

    if want("pack_sequences"):
        sc.setJobDescription("profile pack_sequences")
        timed(spark, "pack_sequences", "full_noop", lambda: noop(
            text.pack_sequences(docs, capacity=512)))

    gp.unpersist()

    if want("spatial_wave"):
        # round-5 spatial/mobility operators, timed via their declared
        # query builders at the bench sf (BENCH_r05's observability gap:
        # none of these is in the frozen bench.py stage list)
        import __spark_entry__ as entrymod
        qs = entrymod.queries()
        for name in ("radius_join_2d", "knn_join_2d", "geo_radius_join",
                     "dbscan_geo", "st_dbscan", "geofence_visits",
                     "snap_segments", "zonal_stats", "focal_stats",
                     "gyration", "displacement", "mobility_report"):
            sc.setJobDescription(f"profile {name}")
            timed(spark, "spatial_wave", name,
                  lambda n=name: noop(qs[n](spark, sf_dir)))

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
