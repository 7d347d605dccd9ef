"""Misra-Gries heavy hitters (engine/sketch.py) and time-bucket gap-fill
(engine/ops.gapfill_locf): guarantee properties under adversarial
partitioning, exactness regimes, and the enforced envelopes."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import ops
from engine import sketch
from engine.sketch import exact_token_counts, heavy_hitters_mg, mg_merge_counts

# ---------------------------------------------------------------------------
# mg_merge_counts unit behavior
# ---------------------------------------------------------------------------

def test_mg_merge_known_values():
    acc = pd.Series({"a": 5, "b": 3}, dtype="int64")
    batch = pd.Series({"b": 2, "c": 1, "d": 1}, dtype="int64")
    # combined: a5 b5 c1 d1; k=2 -> subtract 3rd largest (1): a4 b4
    out = mg_merge_counts(acc, batch, k=2)
    assert out.to_dict() == {"a": 4, "b": 4}


def test_mg_merge_no_eviction_when_under_k():
    out = mg_merge_counts(pd.Series(dtype="int64"),
                          pd.Series({"x": 7, "y": 1}, dtype="int64"), k=8)
    assert out.to_dict() == {"x": 7, "y": 1}


# ---------------------------------------------------------------------------
# distributed sketch guarantees
# ---------------------------------------------------------------------------

def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")


def test_heavy_hitters_exact_when_k_ge_vocab(spark):
    df = _docs(spark, ["cat dog cat", "dog emu", "cat"]).repartition(3)
    got = {r["token"]: r["est"] for r in heavy_hitters_mg(df, k=8).collect()}
    assert got == {"cat": 3, "dog": 2, "emu": 1}


def test_heavy_hitters_guarantees_under_planted_skew(spark):
    """Zipf-ish planted corpus, random partitioning, k well below vocab:
    the PODS'12 merged-summary guarantees must hold — one-sided error
    within n/(k+1), every token above the threshold present."""
    texts = []
    # heavy token: 400 of 1000 occurrences; mid tokens 40 each; 20-token
    # noise tail
    texts += ["heavy " * 8] * 50                      # 400
    for m in range(10):
        texts += [f"mid{m} " * 4] * 10                # 40 each
    for z in range(100):
        texts.append(f"noise{z % 20} noise{(z + 7) % 20}")
    df = _docs(spark, texts).repartition(7)
    k = 6
    hh = {r["token"]: r["est"] for r in heavy_hitters_mg(df, k=k).collect()}
    true = {r["token"]: r["n"] for r in exact_token_counts(df).collect()}
    n = sum(true.values())
    bound = n / (k + 1)
    assert len(hh) <= k
    for t, est in hh.items():
        assert 0 < est <= true[t], (t, est, true[t])
        assert true[t] - est <= bound, (t, est, true[t], bound)
    for t, cnt in true.items():
        if cnt > bound:
            assert t in hh, (t, cnt, bound)
    assert "heavy" in hh  # 40% of the stream is always guaranteed


def test_heavy_hitters_empty_corpus(spark):
    df = _docs(spark, []).repartition(2)
    assert heavy_hitters_mg(df, k=4).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters_mg(df, k=0)


# ---------------------------------------------------------------------------
# gapfill_locf
# ---------------------------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")


def test_gapfill_locf_known_values(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 0, 0, 30)
    rows = [
        (1, 10, t0, 1.0),                              # bucket b0
        (1, 11, t0 + dt.timedelta(seconds=40), 2.0),   # bucket b0, later
        (1, 12, t0 + dt.timedelta(seconds=330), 7.0),  # bucket b0+3 (gap 2)
        (2, 20, t0, 9.0),                              # single bucket
    ]
    out = (ops.gapfill_locf(_events(spark, rows), "user_id", "ts", "value",
                            ["event_id"], bucket_s=100)
           .orderBy("user_id", "bucket").collect())
    u1 = [r for r in out if r["user_id"] == 1]
    assert [r["n_events"] for r in u1] == [2, 0, 0, 1]
    assert [r["val_locf"] for r in u1] == [2.0, 2.0, 2.0, 7.0]  # LOCF + last-in-bucket
    assert [r["is_gap"] for r in u1] == [0, 1, 1, 0]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["val_locf"] == 9.0 and u2[0]["is_gap"] == 0


def test_gapfill_locf_span_envelope_raises(spark):
    import datetime as dt
    rows = [(1, 1, dt.datetime(2024, 1, 1), 1.0),
            (1, 2, dt.datetime(2024, 3, 1), 2.0)]  # ~60 days at 1 s buckets
    g = ops.gapfill_locf(_events(spark, rows), "user_id", "ts", "value",
                         ["event_id"], bucket_s=1, max_buckets_per_key=1000)
    with pytest.raises(Exception, match="gapfill_locf"):
        g.count()


def test_gapfill_locf_partition_invariant(spark):
    """Bucket math and the LOCF pick are partitioning-independent."""
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, u * 100 + i, t0 + dt.timedelta(seconds=37 * i + u), float(i))
            for u in range(3) for i in range(40)]
    ev = _events(spark, rows)
    a = sorted(map(tuple, ops.gapfill_locf(
        ev.coalesce(1), "user_id", "ts", "value", ["event_id"],
        bucket_s=120).collect()))
    b = sorted(map(tuple, ops.gapfill_locf(
        ev.repartition(13), "user_id", "ts", "value", ["event_id"],
        bucket_s=120).collect()))
    assert a == b


def test_gapfill_interp_known_values(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 0, 0, 30)
    rows = [(1, 10, t0, 2.0),
            (1, 11, t0 + dt.timedelta(seconds=400), 10.0)]  # 4 buckets apart
    out = (ops.gapfill_locf(_events(spark, rows), "user_id", "ts", "value",
                            ["event_id"], bucket_s=100, interpolate=True)
           .orderBy("bucket").collect())
    # lerp steps are exact binary fractions (ratios .25/.5/.75)
    assert [r["val_interp"] for r in out] == [2.0, 4.0, 6.0, 8.0, 10.0]
    assert [r["val_locf"] for r in out] == [2.0, 2.0, 2.0, 2.0, 10.0]
    assert [r["is_gap"] for r in out] == [0, 1, 1, 1, 0]


def test_count_min_guarantees(spark):
    """CMS invariants on a skewed planted corpus: est >= true for EVERY
    token even at a collision-flooded width, est == true for every
    token once width is ample, and the sketch is LINEAR (sketch of the
    union == cell-wise sum of the parts)."""
    rows = [(i, " ".join(f"tok{j}" for j in range(40) for _ in
                         range(1 + (j == 0) * 9 * (i % 3 == 0))))
            for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    true = {r["token"]: r["n"] for r in
            df.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()}
    q = spark.createDataFrame([(t,) for t in true], ["token"])
    for width, must_be_exact in ((8, False), (4096, True)):
        sk = sketch.count_min_build(df, depth=4, width=width)
        est = {r["token"]: r["cms_est"] for r in
               sketch.count_min_estimate(sk, q, depth=4,
                                         width=width).collect()}
        assert set(est) == set(true)
        assert all(est[t] >= true[t] for t in true), width
        if must_be_exact:
            assert est == true
    # linearity: union sketch == cell-wise sum
    a, b = df.filter(F.col("doc_id") < 6), df.filter(F.col("doc_id") >= 6)
    su = {(r["row"], r["pos"]): r["c"] for r in
          sketch.count_min_build(df, 3, 64).collect()}
    sa = {(r["row"], r["pos"]): r["c"] for r in
          sketch.count_min_build(a, 3, 64).collect()}
    sb = {(r["row"], r["pos"]): r["c"] for r in
          sketch.count_min_build(b, 3, 64).collect()}
    summed = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
    assert su == summed
    with pytest.raises(ValueError):
        sketch.count_min_build(df, depth=0)


def test_count_min_streaming_equals_batch(spark, tmp_path):
    """count_min_build runs UNCHANGED on readStream (complete mode; the
    sketch structurally bounds state at depth*width rows) and the cells
    accumulated across micro-batches equal the one-shot batch build —
    linearity made operational."""
    rows = [(i, " ".join(f"w{(i + j) % 9}" for j in range(6)))
            for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    batch = {(r["row"], r["pos"]): r["c"]
             for r in sketch.count_min_build(df, 3, 128).collect()}
    path = str(tmp_path / "scm")
    df.repartition(4).write.mode("overwrite").parquet(path)
    stream = (spark.readStream.schema(spark.read.parquet(path).schema)
              .option("maxFilesPerTrigger", "1").parquet(path))
    spark.sql("DROP TABLE IF EXISTS scm_test_cells")
    q = (sketch.count_min_build(stream, 3, 128)
         .writeStream.outputMode("complete").format("memory")
         .queryName("scm_test_cells").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["row"], r["pos"]): r["c"]
           for r in spark.table("scm_test_cells").collect()}
    assert got == batch
