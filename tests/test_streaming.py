"""Streaming twins vs batch operators (SURVEY.md §2.8): session windows ==
batch sessionization; stateful episode machine == batch W3 runs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import ops, streaming, trace_prep
from engine.config import DEFAULT


@pytest.fixture(scope="module")
def geopoints_parquet(spark, unit_pages_sdf, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "gp")
    gp = trace_prep.prep_points(trace_prep.extract_points(unit_pages_sdf))
    gp.select("host", "url", "warc_ts", "lat", "lon").coalesce(4) \
      .write.mode("overwrite").parquet(path)
    return path


def test_stream_sessionize_matches_batch(spark, geopoints_parquet):
    schema = spark.read.parquet(geopoints_parquet).schema
    stream = spark.readStream.schema(schema).parquet(geopoints_parquet)
    q = (streaming.stream_sessionize(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName("sessions_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM sessions_out").toPandas()

    batch = spark.read.parquet(geopoints_parquet)
    want = (ops.sessionize(batch, ["host"], "warc_ts", DEFAULT.gap_s,
                           order=["warc_ts", "url"])
            .groupBy("host", "subset_id")
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.min("warc_ts").alias("start_ts"))
            .toPandas())
    # watermark: sessions whose close isn't past the final watermark are
    # withheld in append mode — compare the emitted subset
    g = got.sort_values(["host", "start_ts"]).reset_index(drop=True)
    w = want.sort_values(["host", "start_ts"]).reset_index(drop=True)
    merged = g.merge(w, on=["host", "start_ts"], suffixes=("_s", "_b"))
    assert len(merged) == len(g)  # every emitted session exists in batch
    assert len(g) >= 0.8 * len(w)  # and nearly all sessions were emitted
    np.testing.assert_array_equal(merged["n_points_s"], merged["n_points_b"])


def test_stream_episodes_matches_batch_runs(spark, tmp_path_factory):
    # deterministic toy stream: one host, runs A A B B _gap_ A
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "host": "h1",
        "url": [f"u{i}" for i in range(6)],
        "warc_ts": [base + pd.Timedelta(seconds=s)
                    for s in [0, 60, 120, 180, 8000, 8060]],
        "location_id": pd.array([0, 0, 1, 1, 0, 0], dtype="Int32"),
    })
    path = str(tmp_path_factory.mktemp("stream") / "assigned")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (streaming.stream_episodes(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName("eps_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.sql("SELECT * FROM eps_out").toPandas()
           .sort_values("start_ts").reset_index(drop=True))
    # emitted: [0s..120s) loc 0 (2 pts), [120s..8000s-gap->180s] loc 1;
    # the final run (loc 0 after the gap) is still open in state
    assert list(got["location_id"]) == [0, 1]
    assert list(got["n_points"]) == [2, 2]
    assert got.loc[0, "start_ts"] == base


def test_stream_episodes_full_matches_batch(spark, unit_pages_sdf,
                                            tmp_path_factory):
    """stream_episodes_full == batch build_episodes (modulo seq) for every
    subset the final watermark closes — full W3+W5 parity on real data."""
    from engine import episodes as E
    from engine import locations as L

    gp = trace_prep.geopoints(unit_pages_sdf, DEFAULT).persist()
    locs = L.detect_locations(gp, DEFAULT).persist()
    assigned = E.knn_assign(gp, locs, DEFAULT)

    path = str(tmp_path_factory.mktemp("stream") / "assigned_full")
    (assigned.select("host", "warc_ts", "location_id")
     .coalesce(4).write.mode("overwrite").parquet(path))

    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (streaming.stream_episodes_full(stream, DEFAULT)
         .writeStream.outputMode("append").format("memory")
         .queryName("eps_full_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.sql("SELECT * FROM eps_full_out").toPandas()
           .sort_values(["host", "start_ts", "end_ts"])
           .reset_index(drop=True))

    want = (E.build_episodes(assigned, DEFAULT)
            .drop("seq").toPandas()
            .sort_values(["host", "start_ts", "end_ts"])
            .reset_index(drop=True))

    # append mode withholds subsets not yet closed by the final watermark:
    # every emitted row must exist in batch, and coverage must be high
    assert len(got) > 0
    key = ["host", "start_ts", "end_ts", "kind"]
    merged = got.merge(want, on=key, how="left", indicator=True,
                       suffixes=("_s", "_b"))
    assert (merged["_merge"] == "both").all(), \
        merged[merged["_merge"] != "both"].head()
    lg = merged["location_id_s"].astype("float64")
    lb = merged["location_id_b"].astype("float64")
    assert ((lg == lb) | (lg.isna() & lb.isna())).all()
    assert len(got) >= 0.8 * len(want)


def test_stream_cell_density_matches_batch(spark, unit_pages_sdf,
                                           tmp_path_factory):
    """Rolling raster: windowed cell density over the stream must agree
    with the batch twin on every emitted (window, cell) — append-mode
    withholds only windows not yet past the final watermark."""
    path = str(tmp_path_factory.mktemp("stream") / "gp_full")
    gp = trace_prep.geopoints(unit_pages_sdf, DEFAULT)
    gp.coalesce(4).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (streaming.stream_cell_density(stream, DEFAULT)
         .writeStream.outputMode("append").format("memory")
         .queryName("density_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT window.start AS ws, cell_id, mass_s FROM density_out"
    ).toPandas()

    batch = streaming.batch_windowed_cell_density(
        spark.read.parquet(path), DEFAULT)
    want = batch.select(F.col("window.start").alias("ws"), "cell_id",
                        "mass_s").toPandas()
    assert len(got) > 0
    merged = got.merge(want, on=["ws", "cell_id"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)  # every emitted row exists in batch
    assert len(got) >= 0.5 * len(want)  # and a solid share was emitted
    np.testing.assert_allclose(merged["mass_s_s"], merged["mass_s_b"],
                               rtol=1e-9)


def test_stream_cell_density_quant_matches_batch_exactly(
        spark, unit_pages_sdf, tmp_path_factory):
    """quant_ms mode (the driver-oracle path): per-site mass floored to
    integer ms BEFORE the windowed sum, so streaming == batch must hold
    EXACTLY (integer sums are order-independent), not just to 1e-9."""
    path = str(tmp_path_factory.mktemp("stream") / "gp_q")
    gp = trace_prep.geopoints(unit_pages_sdf, DEFAULT)
    gp.coalesce(4).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (streaming.stream_cell_density(stream, DEFAULT, quant_ms=True)
         .writeStream.outputMode("append").format("memory")
         .queryName("density_q_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT window.start AS ws, cell_id, mass_ms FROM density_q_out"
    ).toPandas()

    batch = streaming.batch_windowed_cell_density(spark.read.parquet(path),
                                                  DEFAULT)
    want = (batch.select(F.col("window.start").alias("ws"), "cell_id",
                         "mass_s").toPandas())
    assert len(got) > 0
    # batch twin aggregates float mass; recompute its quant form per
    # (window, cell) from the site-level floor by rerunning the quant agg
    from engine.functions import encode_cell_native
    sites = trace_prep.interpolate_sites(spark.read.parquet(path), DEFAULT,
                                         carry_cols=("warc_ts",))
    cells = encode_cell_native(sites, "site_lat", "site_lon", "cell_id",
                               DEFAULT.cell_level)
    wantq = (cells.withColumn("mass_ms",
                              F.floor(F.col("mass_s") * 1000.0).cast("long"))
             .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "cell_id")
             .agg(F.sum("mass_ms").alias("mass_ms"))
             .select(F.col("w.start").alias("ws"), "cell_id", "mass_ms")
             .toPandas())
    merged = got.merge(wantq, on=["ws", "cell_id"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    np.testing.assert_array_equal(merged["mass_ms_s"].to_numpy(),
                                  merged["mass_ms_b"].to_numpy())


def test_stream_dedup_exact_matches_batch(spark, unit_pages_sdf,
                                          tmp_path_factory):
    """Streaming exact dedup: one emitted row per distinct text, each a
    real occurrence; count matches batch nunique."""
    path = str(tmp_path_factory.mktemp("sdedup") / "pages")
    unit_pages_sdf.select("url", "warc_ts", "text").write \
        .mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (streaming.stream_dedup_exact(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName("sdedup_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM sdedup_out").toPandas()
    batch = spark.read.parquet(path).toPandas()
    n_distinct = batch["text"].nunique()
    assert len(got) == n_distinct
    assert got["text"].nunique() == n_distinct
    occ = set(zip(batch["url"], batch["text"]))
    assert all((u, t) in occ for u, t in zip(got["url"], got["text"]))


def test_stream_curation_matches_batch(spark, unit_pages_sdf,
                                       tmp_path_factory):
    """Streaming curation (gate -> dedup) over MULTIPLE micro-batches:
    the emitted key set equals the batch gate + distinct, independent of
    batch boundaries; gated-out texts never emit."""
    from pyspark.sql import functions as F

    from engine.text import tokens_col
    path = str(tmp_path_factory.mktemp("scur") / "pages")
    (unit_pages_sdf.select("url", "warc_ts", "text")
     .repartition(3).write.mode("overwrite").parquet(path))
    schema = spark.read.parquet(path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(path))
    # watermark must exceed the fixture's event-time span: with random
    # row order across files, a first-arrival older than the watermark
    # would be late-DROPPED, not deduped (the driver query guarantees
    # this by construction: 5000 s span vs 4 h watermark)
    q = (streaming.stream_curation(stream, min_tokens=4,
                                   watermark="30 days")
         .writeStream.outputMode("append").format("memory")
         .queryName("scur_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT text FROM scur_out").toPandas()
    batch = (spark.read.parquet(path)
             .filter(F.size(tokens_col(F.col("text"))) >= 4)
             .select("text").toPandas())
    assert sorted(got["text"].unique()) == sorted(batch["text"].unique())
    assert len(got) == batch["text"].nunique()  # one emission per text


def test_maponly_text_ops_stream_unchanged(spark, tmp_path_factory):
    """Map-only text operators (context-window chunking and lang ID —
    pure projections, zero exchanges) run UNCHANGED on a stream and emit
    exactly the batch rows: the streaming-compatibility contract for
    stateless curation stages."""
    import pandas as pd

    from engine import text

    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [f"alpha beta gamma delta epsilon zeta doc{i} "
                 f"the and of extra words here" for i in range(8)]})
    path = str(tmp_path_factory.mktemp("sdocs") / "docs")
    sdf = spark.createDataFrame(docs)
    sdf.write.mode("overwrite").parquet(path)

    batch_chunks = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in text.chunk_documents(sdf, max_tokens=5, stride=4).collect())
    batch_lang = sorted((r["doc_id"], r["lang_guess"])
                        for r in text.lang_id(sdf).collect())

    schema = sdf.schema
    stream = spark.readStream.schema(schema).parquet(path)
    q1 = (text.chunk_documents(stream, max_tokens=5, stride=4)
          .writeStream.outputMode("append").format("memory")
          .queryName("s_chunks").start())
    q2 = (text.lang_id(stream).select("doc_id", "lang_guess")
          .writeStream.outputMode("append").format("memory")
          .queryName("s_lang").start())
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        got_chunks = sorted(
            (r["doc_id"], r["chunk_idx"], r["chunk_text"])
            for r in spark.sql("SELECT * FROM s_chunks").collect())
        got_lang = sorted((r["doc_id"], r["lang_guess"])
                          for r in spark.sql("SELECT * FROM s_lang").collect())
    finally:
        q1.stop()
        q2.stop()
    assert got_chunks == batch_chunks
    assert got_lang == batch_lang


def _write_two_streams(spark, tmp_path_factory):
    """Deterministic point + place-ping streams for the interval join."""
    B = 1704067200
    lrows = [(f"h{i % 3}", i, B + i * 60) for i in range(60)]
    l = spark.createDataFrame(lrows, "host string, pt_id long, es long") \
        .select("host", "pt_id", F.timestamp_seconds("es").alias("warc_ts"))
    rrows = [(f"h{j % 3}", 1000 + j, B + j * 240 + 30) for j in range(12)]
    r = (spark.createDataFrame(rrows,
                               "place_host string, place_id long, es long")
         .select("place_host", "place_id",
                 F.timestamp_seconds("es").alias("place_ts")))
    pl = str(tmp_path_factory.mktemp("ssj") / "l")
    pr = str(tmp_path_factory.mktemp("ssj") / "r")
    l.coalesce(1).write.mode("overwrite").parquet(pl)
    r.coalesce(1).write.mode("overwrite").parquet(pr)
    return l, r, pl, pr


def _run_ssj(spark, pl, pr, lsch, rsch, how, name, watermark="10 minutes"):
    sl = spark.readStream.schema(lsch).parquet(pl)
    sr = spark.readStream.schema(rsch).parquet(pr)
    out = streaming.stream_interval_join(
        sl, sr, key="host", right_key="place_host", left_ts="warc_ts",
        right_ts="place_ts", before_s=120, after_s=120,
        watermark=watermark, how=how)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def test_stream_interval_join_inner_matches_batch(spark, tmp_path_factory):
    """Inner stream-stream join with single-batch ingestion (watermark 0
    during the batch => nothing late) emits EXACTLY the batch interval
    join."""
    l, r, pl, pr = _write_two_streams(spark, tmp_path_factory)
    got = _run_ssj(spark, pl, pr, l.schema, r.schema, "inner", "ssj_inner")
    want = l.alias("l").join(r.alias("r"), F.expr(
        "l.host = r.place_host AND place_ts >= warc_ts - INTERVAL 120 "
        "SECONDS AND place_ts <= warc_ts + INTERVAL 120 SECONDS"))
    g = sorted((x.pt_id, x.place_id) for x in got.collect())
    w = sorted((x.pt_id, x.place_id) for x in want.collect())
    assert g == w and len(g) > 0


def test_stream_interval_join_outer_eviction_rule(spark, tmp_path_factory):
    """Left-outer: matched rows == batch join; a null-extended row is
    emitted IFF the left row is unmatched AND eviction proves no future
    match: ts_us <= (wm_ms - after_ms)*1000 - 1000 with wm_ms = min of
    per-side floor(max_us/1000) - delay_ms (Spark's -1 ms state-watermark
    allowance; pinned empirically at us resolution by the driver oracle)."""
    l, r, pl, pr = _write_two_streams(spark, tmp_path_factory)
    got = _run_ssj(spark, pl, pr, l.schema, r.schema, "left_outer",
                   "ssj_outer")
    rows = got.collect()
    matched = sorted((x.pt_id, x.place_id) for x in rows
                     if x.place_id is not None)
    want = l.alias("l").join(r.alias("r"), F.expr(
        "l.host = r.place_host AND place_ts >= warc_ts - INTERVAL 120 "
        "SECONDS AND place_ts <= warc_ts + INTERVAL 120 SECONDS"))
    w = sorted((x.pt_id, x.place_id) for x in want.collect())
    assert matched == w

    max_l = max(x.es for x in l.select(
        F.unix_micros(F.col("warc_ts").cast("timestamp")).alias("es"))
        .collect())
    max_r = max(x.es for x in r.select(
        F.unix_micros(F.col("place_ts").cast("timestamp")).alias("es"))
        .collect())
    wm_ms = min(max_l // 1000, max_r // 1000) - 10 * 60 * 1000
    thr_us = (wm_ms - 120_000) * 1000 - 1000
    matched_ids = {p for p, _ in w}
    want_nulls = sorted(
        x.pt_id for x in l.select(
            "pt_id", F.unix_micros(F.col("warc_ts").cast("timestamp"))
            .alias("us")).collect()
        if x.pt_id not in matched_ids and x.us <= thr_us)
    got_nulls = sorted(x.pt_id for x in rows if x.place_id is None)
    assert got_nulls == want_nulls


def test_stream_interval_join_validation(spark):
    l = spark.createDataFrame([("h", 1)], "host string, pt_id long") \
        .select("host", "pt_id",
                F.timestamp_seconds(F.lit(0)).alias("warc_ts"))
    r_clash = l  # same column names -> ambiguous join schema
    with pytest.raises(ValueError, match="disjoint"):
        streaming.stream_interval_join(l, r_clash)
    r = l.select(F.col("host").alias("place_host"),
                 F.col("pt_id").alias("place_id"),
                 F.col("warc_ts").alias("place_ts"))
    with pytest.raises(ValueError, match="unsupported join type"):
        streaming.stream_interval_join(l, r, how="full_outer")
    with pytest.raises(ValueError, match="no key column"):
        streaming.stream_interval_join(l, r, right_key="nope")


def test_stream_histogram_matches_batch(spark, tmp_path_factory):
    """histogram_equiwidth runs UNCHANGED on a stream in complete mode
    (state = bins, structurally bounded) and micro-batch accumulation
    equals the one-shot batch build — count/min/max merge-associativity
    made visible across three triggers."""
    rng = np.random.default_rng(13)
    pdf = pd.DataFrame({
        "k": [("a", "b")[i % 2] for i in range(90)],
        "v": rng.integers(-500, 500, 90)})
    path = str(tmp_path_factory.mktemp("shist") / "ev")
    sdf = spark.createDataFrame(pdf)
    sdf.repartition(3).write.mode("overwrite").parquet(path)

    batch = sorted(
        tuple(r) for r in
        ops.histogram_equiwidth(sdf, ["k"], "v", width=100).collect())

    schema = sdf.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(path))
    spark.sql("DROP TABLE IF EXISTS t_shist")
    q = (ops.histogram_equiwidth(stream, ["k"], "v", width=100)
         .writeStream.outputMode("complete").format("memory")
         .queryName("t_shist").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.table("t_shist").collect())
    assert got == batch and len(got) > 4


def test_stream_geofence_matches_session_replay(spark, tmp_path_factory):
    """Planted scenario: u1 visits fence 1 twice (runs split by a gap
    > gap_s), the second visit's tail is inside the watermark horizon
    and must be WITHHELD; u2 grazes the exact boundary (dist = r, IN);
    an outside point never hits."""
    path = str(tmp_path_factory.mktemp("sgf") / "pts")
    base = 1_700_000_000
    rows = [
        # u1 inside fence 1 (center 100,100 r 10): visit A (2 pts,
        # 60 s apart), gap 7200 s, visit B (1 pt) — then a far-future
        # driver row pushes the watermark past visit B's close
        ("u1", base + 0, 100, 100), ("u1", base + 60, 105, 100),
        ("u1", base + 7260, 100, 95),
        # u2: exact boundary hit (dist = 10 = r)
        ("u2", base + 0, 110, 100),
        # u3: outside every fence but supplies the max event time
        # (watermark anchor) far ahead
        ("u3", base + 100_000, 500, 500),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "t", "x", "y"])
    df = spark.createDataFrame(pdf).select(
        "user_id", F.col("t").cast("timestamp").alias("ts"), "x", "y")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    fences = spark.createDataFrame(
        pd.DataFrame([(1, 100, 100, 10)],
                     columns=["fence_id", "cx", "cy", "r"]))
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    q = (streaming.stream_geofence(stream, fences, gap_s=600,
                                   watermark="1 hour")
         .writeStream.outputMode("append").format("memory")
         .queryName("sgf_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["user_id"], r["fence_id"],
         int(r["enter_ts"].timestamp()), int(r["exit_ts"].timestamp()),
         r["n_points"])
        for r in spark.sql("SELECT * FROM sgf_out").collect())
    # watermark = max_ts - 1 h = base + 100000 - 3600; visit A closes
    # at base+60+600, u2's at base+600 — both evicted; visit B closes
    # at base+7260+600 <= wm too (100000 - 3600 = 96400 > 7860) so it
    # IS emitted as well
    assert got == [("u1", 1, base + 0, base + 60 + 600, 2),
                   ("u1", 1, base + 7260, base + 7260 + 600, 1),
                   ("u2", 1, base + 0, base + 600, 1)]
    import pytest as _pt
    with _pt.raises(ValueError):
        streaming.stream_geofence(stream, fences.limit(0), gap_s=600)
    bad = fences.withColumn("r", F.lit(0))
    with _pt.raises(ValueError):
        streaming.stream_geofence(stream, bad, gap_s=600)


def test_stream_steps_matches_batch_lag(spark, tmp_path_factory):
    """Multi-batch seam: the machine must close the FIRST step of a
    later batch against the stored tail of the earlier one — exactly
    what the batch lag computes over the union."""
    path = str(tmp_path_factory.mktemp("steps") / "b")
    rows = [(1, 10, 0, 0), (1, 20, 3, 4), (1, 30, 3, 4),
            (2, 10, 100, 100), (3, 5, 7, 7)]
    pd.DataFrame(rows, columns=["user_id", "t", "x", "y"]).pipe(
        lambda d: spark.createDataFrame(d)).coalesce(1) \
        .write.mode("overwrite").parquet(path + "0")
    rows2 = [(1, 40, 0, 4), (2, 50, 103, 96), (4, 60, 1, 1)]
    pd.DataFrame(rows2, columns=["user_id", "t", "x", "y"]).pipe(
        lambda d: spark.createDataFrame(d)).coalesce(1) \
        .write.mode("overwrite").parquet(path + "1")
    import shutil, glob, os
    merged = str(tmp_path_factory.mktemp("steps") / "m")
    os.makedirs(merged)
    for i, src in enumerate((path + "0", path + "1")):
        for f in glob.glob(src + "/*.parquet"):
            shutil.copy(f, f"{merged}/b{i}.parquet")
    schema = spark.read.parquet(merged).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(merged))
    q = (streaming.stream_steps(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName("steps_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM steps_out").collect())
    # batch replay: lag over the union per user
    want = sorted([(1, 10, 20, 25), (1, 20, 30, 0), (1, 30, 40, 9),
                   (2, 10, 50, 25)])
    assert got == want
    # singletons 3 and 4 emit nothing (open tails withheld)
    assert not any(r[0] in (3, 4) for r in got)


def test_step_machine_multi_chunk_group_sorted():
    """A group split into multiple Arrow chunks (rows > the Arrow batch
    size) must be sorted as a WHOLE before the diff: chunks arrive in
    unspecified order, and the old per-chunk sort diffed across unsorted
    chunk seams (even emitting t_prev > t_curr)."""
    import numpy as np
    import pandas as pd
    from engine.streaming import _step_machine

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = _step_machine()
    # chunk 2 holds EARLIER timestamps than chunk 1
    c1 = pd.DataFrame({"t": [30, 40], "x": [3, 6], "y": [4, 8]})
    c2 = pd.DataFrame({"t": [10, 20], "x": [0, 3], "y": [0, 4]})
    st = FakeState()
    out = pd.concat(list(fn((7,), iter([c1, c2]), st)), ignore_index=True)
    got = sorted(map(tuple, out[["t_prev", "t_curr", "dist2"]]
                     .itertuples(index=False)))
    assert got == [(10, 20, 25), (20, 30, 0), (30, 40, 25)]
    assert (out["t_prev"] < out["t_curr"]).all()
    assert st.get == (40, 6, 8)
    # next micro-batch closes against the stored tail
    out2 = pd.concat(list(fn((7,), iter([pd.DataFrame(
        {"t": [50], "x": [9], "y": [12]})]), st)), ignore_index=True)
    assert list(map(tuple, out2[["t_prev", "t_curr", "dist2"]]
                    .itertuples(index=False))) == [(40, 50, 25)]
    # empty micro-batch: state survives untouched
    assert list(fn((7,), iter([pd.DataFrame({"t": [], "x": [], "y": []})]),
                   st)) == []
    assert st.get == (50, 9, 12)
