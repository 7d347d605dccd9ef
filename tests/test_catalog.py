"""Iceberg-emulated storage: hidden partitioning, pruning, resume + lineage
(SURVEY.md §7.6, §5.2.5)."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine import catalog, trace_prep
from engine.config import DEFAULT
from engine.functions import host_from_url


@pytest.fixture(scope="module")
def pages_table(spark, unit_pages_sdf, tmp_path_factory):
    path = tmp_path_factory.mktemp("tbl") / "web_pages"
    man = catalog.write_pages_table(unit_pages_sdf, path, buckets=8)
    return path, man


def test_manifest_contents(pages_table, unit_pages_sdf):
    path, man = pages_table
    snap = man.data["snapshots"][-1]
    assert snap["rows"] == unit_pages_sdf.count()
    assert "bucket(8, url)" in snap["partition_spec"][1]
    assert sum(p["rows"] for p in man.data["partitions"].values()) == snap["rows"]


def test_partition_pruning_in_plan(spark, pages_table):
    path, _ = pages_table
    df = catalog.read_table(spark, path).filter(F.col("url_bucket") == 3)
    plan = df.queryExecution.executedPlan.toString() if False else \
        df._jdf.queryExecution().executedPlan().toString()
    # pruned scan: partition filter present, and fewer files than full scan
    assert "url_bucket" in plan
    full = catalog.read_table(spark, path)
    assert df.count() < full.count()


def test_resume_skips_committed_and_is_identical(spark, pages_table,
                                                 tmp_path_factory):
    path, _ = pages_table
    out_a = tmp_path_factory.mktemp("out") / "geopoints_a"
    out_b = tmp_path_factory.mktemp("out") / "geopoints_b"
    fn = lambda pages: trace_prep.geopoints(pages, DEFAULT)  # noqa: E731
    key = host_from_url(F.col("url"))

    # uninterrupted run
    catalog.run_bucketed_stage(spark, "geopoints", path, out_a, fn,
                               n_buckets=8, chunk=2, key_expr=key)
    # interrupted after 2 chunks (4 of 8 buckets), then resumed
    with pytest.raises(RuntimeError, match="injected failure"):
        catalog.run_bucketed_stage(spark, "geopoints", path, out_b, fn,
                                   n_buckets=8, chunk=2, key_expr=key,
                                   fail_after_chunks=2)
    man_partial = catalog.Manifest(out_b)
    committed_before = man_partial.committed()
    assert 0 < len(committed_before) < 8
    man = catalog.run_bucketed_stage(spark, "geopoints", path, out_b, fn,
                                     n_buckets=8, chunk=2, key_expr=key)
    assert len(man.committed()) == 8
    # lineage recorded
    assert man.data["lineage"]["stage"] == "geopoints"

    a = (catalog.read_table(spark, out_a).toPandas()
         .sort_values("url").reset_index(drop=True))
    b = (catalog.read_table(spark, out_b).toPandas()
         .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_resume_noop_when_complete(spark, pages_table, tmp_path_factory):
    path, _ = pages_table
    out = tmp_path_factory.mktemp("out") / "geopoints_c"
    fn = lambda pages: trace_prep.geopoints(pages, DEFAULT)  # noqa: E731
    key = host_from_url(F.col("url"))
    catalog.run_bucketed_stage(spark, "geopoints", path, out, fn,
                               n_buckets=8, chunk=8, key_expr=key)
    man1 = json.loads((out / "_manifest.json").read_text())
    man2 = catalog.run_bucketed_stage(spark, "geopoints", path, out, fn,
                                      n_buckets=8, chunk=8, key_expr=key)
    # second run is a no-op: same committed partitions, no new snapshot
    assert man2.data["partitions"] == man1["partitions"]
    assert len(man2.data["snapshots"]) == len(man1["snapshots"])


def _merge_fixtures(spark):
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        ["id", "val", "n"])
    ch = spark.createDataFrame(
        [(2, "b2", 21, "U", 1),      # plain update
         (2, "b3", 22, "U", 3),      # supersedes the seq-1 update
         (3, "DEL", 0, "D", 2),      # delete
         (4, "DEL", 0, "D", 1),      # delete superseded by ...
         (4, "d2", 41, "U", 2),      # ... this update
         (9, "new", 90, "I", 1)],    # insert
        ["id", "val", "n", "op", "seq"])
    return tgt, ch


def test_merge_upsert_semantics(spark):
    tgt, ch = _merge_fixtures(spark)
    out = catalog.merge_upsert(tgt, ch, key_cols="id")
    got = {r["id"]: (r["val"], r["n"]) for r in out.collect()}
    assert got == {1: ("a", 10),     # untouched
                   2: ("b3", 22),    # highest-seq update wins
                   4: ("d2", 41),    # update supersedes delete
                   9: ("new", 90)}   # insert; 3 deleted


def test_merge_upsert_duplicate_seq_raises(spark):
    tgt, _ = _merge_fixtures(spark)
    ch = spark.createDataFrame([(2, "x", 0, "U", 1), (2, "y", 0, "U", 1)],
                               ["id", "val", "n", "op", "seq"])
    with pytest.raises(ValueError, match="non-unique"):
        catalog.merge_upsert(tgt, ch, key_cols="id")


def test_merge_upsert_extra_column_raises(spark):
    tgt, _ = _merge_fixtures(spark)
    ch = spark.createDataFrame([(2, "x", 0, "oops", "U", 1)],
                               ["id", "val", "n", "bogus", "op", "seq"])
    with pytest.raises(ValueError, match="bogus"):
        catalog.merge_upsert(tgt, ch, key_cols="id")


def test_merge_predicated_semantics(spark):
    """Clause ORDER is first-true-wins; NULL predicates fall through;
    matched-no-clause and unmatched-target rows keep; NOT MATCHED pred
    gates inserts; ambiguity and schema-contract violations raise."""
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40),
         (5, "e", None)],
        "id long, val string, n long")
    src = spark.createDataFrame(
        [(2, "up", 25),     # t.n < s.n -> update
         (3, "up", 5),      # shrink -> falls through -> keep
         (4, "DEL", 99),    # val-flag clause fires FIRST -> delete
         (5, "up", 7),      # t.n NULL -> pred NULL -> falls through -> keep
         (8, "new", 2),     # unmatched, even -> insert
         (9, "new", 3)],    # unmatched, odd -> filtered out
        "id long, val string, n long")
    out = catalog.merge_predicated(
        tgt, src, "id",
        matched=[("s.val = 'DEL'", "delete"),
                 ("t.n < s.n", "update")],
        not_matched="s.n % 2 = 0")
    got = {r["id"]: (r["val"], r["n"]) for r in out.collect()}
    assert got == {1: ("a", 10), 2: ("up", 25), 3: ("c", 30),
                   5: ("e", None), 8: ("new", 2)}
    # clause order matters: swapping makes id=4 an update, not a delete
    out2 = catalog.merge_predicated(
        tgt, src, "id",
        matched=[("t.n < s.n", "update"), ("s.val = 'DEL'", "delete")])
    got2 = {r["id"]: r["val"] for r in out2.collect()}
    assert got2[4] == "DEL" and 9 in got2  # no insert pred -> all insert
    with pytest.raises(ValueError, match="ambiguous"):
        catalog.merge_predicated(
            tgt, src.unionByName(src.limit(1)), "id", matched=[])
    with pytest.raises(ValueError, match="lacks target columns"):
        catalog.merge_predicated(tgt, src.drop("n"), "id")
    with pytest.raises(ValueError, match="unknown action"):
        catalog.merge_predicated(tgt, src, "id",
                                 matched=[("s.n > 0", "upsert")])


def test_merge_predicated_target_streams(spark):
    """Plan pin for the 100-TB posture: with a dim-sized source the
    matched path is a BroadcastHashJoin LeftOuter — the target's full
    rows reach the output without crossing an exchange (the only other
    join is the key-projection anti join for inserts)."""
    import __spark_entry__ as entry
    df = entry.q_cdc_merge_pred(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan


def test_merge_upsert_target_never_shuffles(spark):
    """The 100-TB contract: the reduced change-key set broadcasts to a
    LeftAnti hash join — the target side reaches the union without a
    shuffle (only the changes-sized max_by agg exchanges).  Checked on
    the FINAL adaptive plan (in-memory test frames carry no size stats,
    so the broadcast decision is AQE's runtime one — exactly the
    engine's adaptive-only broadcast policy, engine/session.py)."""
    import __spark_entry__ as entry
    df = entry.q_cdc_merge(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bucketed_join_zero_exchange(spark):
    """Two tables bucketed 8-ways on the join key join AND re-aggregate
    on that key with ZERO Exchange operators (both scans read
    pre-bucketed files), independent of broadcast: auto-broadcast is
    disabled so the no-shuffle plan is the bucketing's doing, not BHJ's.
    Values match the plain (shuffled) join exactly."""
    from pyspark.sql import functions as F
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select(F.col("event_id").cast("long").alias("event_id"),
                F.col("user_id").cast("long").alias("user_id"))
    agg = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
           .groupBy(F.col("o_custkey").cast("long").alias("custkey"))
           .agg(F.count(F.lit(1)).alias("n_orders")))
    catalog.write_bucketed(ev, "tb_ev_test", "user_id", 8,
                           sort_by=("user_id", "event_id"))
    catalog.write_bucketed(agg, "tb_agg_test", "custkey", 8)
    with pytest.raises(ValueError, match="n_buckets"):
        catalog.write_bucketed(ev, "tb_bad", "user_id", 0)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = catalog.bucketed_join(spark, "tb_ev_test", "tb_agg_test",
                                  "user_id", "custkey")
        out = (j.groupBy("user_id")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.max("n_orders").alias("n_orders")))
        got = {r.user_id: (r.n_events, r.n_orders) for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # the adaptive plan string shows Final + Initial plans — both
        # scans must read bucketed in the Final section at least
        assert plan.count("Bucketed: true") >= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       old_aqe)

    want = {r.user_id: (r.n_events, r.n_orders)
            for r in ev.join(agg, ev.user_id == agg.custkey)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max("n_orders").alias("n_orders")).collect()}
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# merge-on-read CDC table: delta commits, idempotent replay, compaction
# ---------------------------------------------------------------------------

def _cdc_rows(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v double, op string, seq long")


def test_cdc_delta_lifecycle(spark, tmp_path):
    from engine import catalog
    tbl = tmp_path / "mor"

    b0 = _cdc_rows(spark, [(1, 1.0, "U", 1), (2, 2.0, "U", 2),
                           (1, 1.5, "U", 3)])     # k=1 superseded in-batch
    b1 = _cdc_rows(spark, [(2, 0.0, "D", 4), (3, 3.0, "I", 5)])
    assert catalog.write_cdc_delta(b0, tbl, 0, "k") is True
    assert catalog.write_cdc_delta(b1, tbl, 1, "k") is True

    # replayed batch id: no-op, returns False, state unchanged
    files_before = sorted(p.name for p in tbl.iterdir())
    assert catalog.write_cdc_delta(b0, tbl, 0, "k") is False
    assert sorted(p.name for p in tbl.iterdir()) == files_before

    state = {r["k"]: r["v"] for r in
             catalog.read_merge_on_read(spark, tbl, "k").collect()}
    assert state == {1: 1.5, 3: 3.0}  # k=2 deleted

    # compaction: same state, manifest swaps to a base, deltas dropped
    catalog.compact_cdc_table(spark, tbl, "k")
    man = catalog.Manifest(tbl)
    assert man.data["lineage"]["base"].startswith("base-")
    assert all(not n.startswith("delta-") for n in man.data["partitions"])
    state2 = {r["k"]: r["v"] for r in
              catalog.read_merge_on_read(spark, tbl, "k").collect()}
    assert state2 == state

    # post-compaction deltas fold over the base (incl. delete of a based row)
    b2 = _cdc_rows(spark, [(1, 0.0, "D", 6), (4, 4.0, "U", 7)])
    assert catalog.write_cdc_delta(b2, tbl, 2, "k") is True
    state3 = {r["k"]: r["v"] for r in
              catalog.read_merge_on_read(spark, tbl, "k").collect()}
    assert state3 == {3: 3.0, 4: 4.0}

    # non-unique (key, seq) within a batch raises
    bad = _cdc_rows(spark, [(9, 1.0, "U", 1), (9, 2.0, "U", 1)])
    import pytest as _pt
    with _pt.raises(ValueError, match="non-unique"):
        catalog.write_cdc_delta(bad, tbl, 3, "k")


def test_stream_upsert_multi_batch_matches_batch_fold(spark, tmp_path):
    """availableNow + maxFilesPerTrigger=1 drives MULTIPLE foreachBatch
    commits; the MOR state must equal the one-shot batch fold (the
    associativity contract that makes the driver oracle exact)."""
    from engine import catalog, streaming
    rows = [(k, float(s), "D" if s % 7 == 0 else "U", s)
            for s in range(1, 61) for k in [s % 9]]
    ch = _cdc_rows(spark, rows)
    src = tmp_path / "src"
    ch.repartition(5).write.parquet(str(src))
    stream = (spark.readStream.schema(ch.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    tbl, ck = tmp_path / "tbl", tmp_path / "ck"
    q = streaming.stream_upsert(stream, str(tbl), "k", str(ck))
    q.awaitTermination()

    man = catalog.Manifest(tbl)
    assert len(man.data["lineage"]["applied_batches"]) >= 2, (
        "expected multiple micro-batches")
    got = {(r["k"], r["v"]) for r in
           catalog.read_merge_on_read(spark, tbl, "k").collect()}
    base = ch.limit(0).select("k", "v")
    want = {(r["k"], r["v"]) for r in
            catalog.merge_upsert(base, ch, "k").collect()}
    assert got == want and len(got) > 0


def test_cdc_time_travel_reads_pre_compaction_snapshots(spark, tmp_path):
    """as_of reconstructs any historical view from the snapshot log —
    including views whose deltas were later compacted away."""
    from engine import catalog
    tbl = tmp_path / "tt"
    catalog.write_cdc_delta(
        _cdc_rows(spark, [(1, 1.0, "U", 1), (2, 2.0, "U", 2)]), tbl, 0, "k")
    catalog.write_cdc_delta(
        _cdc_rows(spark, [(1, 0.0, "D", 3), (3, 3.0, "U", 4)]), tbl, 1, "k")
    catalog.compact_cdc_table(spark, tbl, "k")            # snapshot 2
    catalog.write_cdc_delta(
        _cdc_rows(spark, [(1, 9.0, "U", 5)]), tbl, 2, "k")  # snapshot 3

    def view(**kw):
        return {r["k"]: r["v"] for r in
                catalog.read_merge_on_read(spark, tbl, "k", **kw).collect()}

    assert view(as_of=0) == {1: 1.0, 2: 2.0}
    assert view(as_of=1) == {2: 2.0, 3: 3.0}   # pre-compaction, k=1 deleted
    assert view(as_of=2) == {2: 2.0, 3: 3.0}   # compaction preserves state
    assert view() == {1: 9.0, 2: 2.0, 3: 3.0}  # head: re-insert after delete
    import pytest as _pt
    with _pt.raises(ValueError, match="no snapshot"):
        catalog.read_merge_on_read(spark, tbl, "k", as_of=-1)


def _chlog(spark):
    # key 1: U,U,U (current at seq 9); key 2: U,D (deleted); key 3: U,D,I
    # (re-inserted); key 4: single insert; key 5: D-only (no-op history)
    rows = [
        (1, "a1", "U", 1), (1, "a2", "U", 5), (1, "a3", "U", 9),
        (2, "b1", "U", 2), (2, "DEL", "D", 6),
        (3, "c1", "U", 3), (3, "DEL", "D", 4), (3, "c2", "I", 8),
        (4, "d1", "I", 7),
        (5, "DEL", "D", 10),
    ]
    return spark.createDataFrame(rows, ["k", "attr", "op", "seq"])


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scd2_build_known_values(spark):
    out = catalog.scd2_build(_chlog(spark), "k")
    assert _sorted_rows(out) == sorted([
        (1, "a1", 1, 5, False), (1, "a2", 5, 9, False),
        (1, "a3", 9, None, True),
        (2, "b1", 2, 6, False),
        (3, "c1", 3, 4, False), (3, "c2", 8, None, True),
        (4, "d1", 7, None, True),
    ])


def test_scd2_apply_equals_full_build_at_every_split(spark):
    log = _chlog(spark)
    full = _sorted_rows(catalog.scd2_build(log, "k"))
    for k in range(1, 11):
        dim = catalog.scd2_build(log.filter(F.col("seq") < k), "k")
        batch = log.filter(F.col("seq") >= k)
        got = _sorted_rows(catalog.scd2_apply(dim, batch, "k"))
        assert got == full, f"split at seq {k}"


def test_scd2_apply_rejects_out_of_order_batch(spark):
    log = _chlog(spark)
    dim = catalog.scd2_build(log.filter(F.col("seq") < 6), "k")
    with pytest.raises(ValueError, match="batch order"):
        catalog.scd2_apply(dim, log.filter(F.col("seq") >= 1), "k")


def test_scd2_build_rejects_duplicate_seq(spark):
    log = _chlog(spark).union(
        spark.createDataFrame([(1, "dup", "U", 1)],
                              ["k", "attr", "op", "seq"]))
    with pytest.raises(ValueError, match="non-unique"):
        catalog.scd2_build(log, "k")


def _full_agg(state):
    return (state.groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total")))


def test_incr_agg_apply_equals_full_recompute(spark, tmp_path):
    # 3 batches: inserts, updates that move rows across groups, deletes
    # that empty one group entirely
    cols = ["k", "g", "v", "op", "seq"]
    b0 = spark.createDataFrame(
        [(1, "a", 10, "U", 1), (2, "a", 20, "U", 2), (3, "b", 30, "U", 3),
         (4, "c", 5, "U", 4)], cols)
    b1 = spark.createDataFrame(
        [(2, "b", 25, "U", 5),              # moves 2 from a to b
         (5, "a", 7, "I", 6),               # new key
         (4, "c", 0, "D", 7)], cols)        # empties group c
    b2 = spark.createDataFrame(
        [(3, "b", 31, "U", 8), (3, "b", 33, "U", 9),   # in-batch supersede
         (1, "a", 0, "D", 10), (5, "a", 0, "D", 11)], cols)
    tbl = str(tmp_path / "mor")
    catalog.write_cdc_delta(b0, tbl, 0, "k")
    state0 = catalog.read_merge_on_read(spark, tbl, "k")
    agg = _full_agg(state0)                  # bootstrap full aggregation
    for i, b in ((1, b1), (2, b2)):
        pre = catalog.read_merge_on_read(spark, tbl, "k")
        agg = incr = catalog.incr_agg_apply(agg, pre, b, "k", "g", "v")
        catalog.write_cdc_delta(b, tbl, i, "k")
        post = catalog.read_merge_on_read(spark, tbl, "k")
        full = sorted(tuple(r) for r in _full_agg(post).collect())
        got = sorted(tuple(r) for r in incr.collect())
        assert got == full, f"after batch {i}: {got} != {full}"
    # group c vanished, group a reduced to nothing after b2 deletes? a has
    # nothing left (1 deleted, 5 deleted, 2 moved) -> only b remains
    assert [r["g"] for r in agg.orderBy("g").collect()] == ["b"]


def test_incr_minmax_apply_equals_full_recompute(spark, tmp_path):
    """The affected-group rescan matview: deletes that remove a group's
    MIN and its MAX (the cases plain delta math cannot maintain), a
    cross-group move, an in-batch supersede, and a group emptied out —
    apply == full recompute at every batch boundary."""
    def full(state):
        return state.groupBy("g").agg(F.min("v").alias("mn"),
                                      F.max("v").alias("mx"),
                                      F.count(F.lit(1)).alias("cnt"))
    cols = ["k", "g", "v", "op", "seq"]
    b0 = spark.createDataFrame(
        [(1, "a", 10, "U", 1), (2, "a", 99, "U", 2),   # 99 = max of a
         (3, "a", -5, "U", 3),                         # -5 = min of a
         (4, "b", 30, "U", 4), (5, "c", 1, "U", 5)], cols)
    b1 = spark.createDataFrame(
        [(2, "a", 0, "D", 6),                # delete the max of a
         (3, "b", -5, "U", 7),               # min of a MOVES to b
         (5, "c", 0, "D", 8)], cols)         # empties group c
    b2 = spark.createDataFrame(
        [(6, "a", 50, "I", 9), (6, "a", 40, "U", 10),  # supersede in-batch
         (3, "b", 0, "D", 11)], cols)        # delete b's new min
    tbl = str(tmp_path / "mor_mm")
    catalog.write_cdc_delta(b0, tbl, 0, "k")
    agg = full(catalog.read_merge_on_read(spark, tbl, "k"))
    for i, b in ((1, b1), (2, b2)):
        pre = catalog.read_merge_on_read(spark, tbl, "k")
        agg = catalog.incr_minmax_apply(agg, pre, b, "k", "g", "v")
        catalog.write_cdc_delta(b, tbl, i, "k")
        post = catalog.read_merge_on_read(spark, tbl, "k")
        want = sorted(tuple(r) for r in full(post).collect())
        got = sorted(tuple(r) for r in agg.collect())
        assert got == want, f"after batch {i}: {got} != {want}"
    final = {r["g"]: (r["mn"], r["mx"], r["cnt"])
             for r in agg.collect()}
    assert final == {"a": (10, 40, 2), "b": (30, 30, 1)}


def test_cdc_schema_evolution_lifecycle(spark, tmp_path):
    """ADD COLUMN evolution: batches written under three schemas resolve
    by name at read (typed NULLs for pre-evolution rows), a compaction
    folds the union schema into the base, as-of views that predate an
    evolution keep the OLD schema, and a type change raises."""
    tbl = str(tmp_path / "mor_se")
    b0 = spark.createDataFrame([(1, "en", "U", 1), (2, "fr", "U", 2)],
                               ["k", "lang", "op", "seq"])
    b1 = spark.createDataFrame([(2, "de", "s2", "U", 3),
                                (3, "zz", "s3", "I", 4)],
                               ["k", "lang", "src", "op", "seq"])
    catalog.write_cdc_delta(b0, tbl, 0, "k")          # snapshot 0
    catalog.write_cdc_delta(b1, tbl, 1, "k")          # snapshot 1
    head = catalog.read_merge_on_read(spark, tbl, "k")
    assert head.columns == ["k", "lang", "src"]
    got = {r["k"]: (r["lang"], r["src"]) for r in head.collect()}
    assert got == {1: ("en", None), 2: ("de", "s2"), 3: ("zz", "s3")}
    # pre-evolution as-of keeps the old schema
    old = catalog.read_merge_on_read(spark, tbl, "k", as_of=0)
    assert old.columns == ["k", "lang"]
    # compaction folds the union schema into the base
    catalog.compact_cdc_table(spark, tbl, "k")
    b2 = spark.createDataFrame([(1, "en", "s1", 9, "U", 5)],
                               ["k", "lang", "src", "wc", "op", "seq"])
    catalog.write_cdc_delta(b2, tbl, 2, "k")
    head2 = catalog.read_merge_on_read(spark, tbl, "k")
    assert head2.columns == ["k", "lang", "src", "wc"]
    got2 = {r["k"]: (r["src"], r["wc"]) for r in head2.collect()}
    assert got2 == {1: ("s1", 9), 2: ("s2", None), 3: ("s3", None)}
    # a known column changing type raises (add-only contract)
    bad = spark.createDataFrame([(4, 7, "U", 6)],
                                ["k", "lang", "op", "seq"])  # lang int
    with pytest.raises(ValueError):
        catalog.write_cdc_delta(bad, tbl, 3, "k")


def test_partition_evolution_prunes_per_spec(spark, tmp_path):
    """Spec evolution: generation 1's scan prunes STATICALLY on both
    partition columns (PartitionFilters carries user_bucket), generation
    0's scan cannot see user_bucket (pre-evolution spec) and contributes
    all of the day's rows; results equal the per-generation semantics,
    and re-writing a generation id raises."""
    rows = [(i, i % 5, f"2024-01-0{1 + i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "d"])
    tbl = str(tmp_path / "pevo")
    catalog.write_evolved_gen(df.filter(F.col("event_id") % 2 == 0),
                              tbl, 0, {"ts_day": F.col("d")})
    catalog.write_evolved_gen(
        df.filter(F.col("event_id") % 2 == 1), tbl, 1,
        {"ts_day": F.col("d"),
         "user_bucket": F.pmod(F.col("user_id"), F.lit(4))})
    out = catalog.read_evolved(
        spark, tbl, part_filters={"ts_day": "2024-01-02", "user_bucket": 1},
        logical_cols=["event_id", "user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert len(pf) == 2, plan
    assert sum("user_bucket" in ln for ln in pf) == 1, plan  # gen1 only
    got = sorted((r.gen_id, r.event_id) for r in out.collect())
    want = sorted(
        [(0, i) for i, u, d in rows if i % 2 == 0 and d == "2024-01-02"]
        + [(1, i) for i, u, d in rows
           if i % 2 == 1 and d == "2024-01-02" and u % 4 == 1])
    assert got == want
    with pytest.raises(ValueError):
        catalog.write_evolved_gen(df, tbl, 1, {"ts_day": F.col("d")})
    with pytest.raises(ValueError):
        catalog.read_evolved(spark, str(tmp_path / "nope"))


def test_diff_snapshots_net_changelog(spark, tmp_path):
    """diff_snapshots emits the NET change between two snapshots: I for
    keys new at B, D for keys gone at B, U only when the payload really
    changed — a key updated then restored to its A-state emits nothing;
    schema-evolved columns appear as typed-NULL old_* for pre-evolution
    rows."""
    cols = ["k", "val", "op", "seq"]
    b0 = spark.createDataFrame(
        [(1, "a", "U", 1), (2, "b", "U", 2), (3, "c", "U", 3),
         (4, "d", "U", 4)], cols)
    b1 = spark.createDataFrame(
        [(2, "b2", "U", 5),          # real update
         (3, "x", "U", 6),           # updated ...
         (5, "e", "I", 7)], cols)    # insert
    b2 = spark.createDataFrame(
        [(3, "c", "U", 8),           # ... then RESTORED to A-state
         (4, "d", "D", 9)], cols)    # delete
    tbl = str(tmp_path / "mor_diff")
    catalog.write_cdc_delta(b0, tbl, 0, "k")     # snapshot 0
    catalog.write_cdc_delta(b1, tbl, 1, "k")     # snapshot 1
    catalog.write_cdc_delta(b2, tbl, 2, "k")     # snapshot 2 (head)
    d = {r["k"]: (r["op"], r["old_val"], r["new_val"])
         for r in catalog.diff_snapshots(spark, tbl, "k", 0).collect()}
    assert d == {2: ("U", "b", "b2"), 4: ("D", "d", None),
                 5: ("I", None, "e")}              # 1, 3 net-unchanged
    mid = {r["k"]: r["op"]
           for r in catalog.diff_snapshots(spark, tbl, "k", 1, 2).collect()}
    assert mid == {3: "U", 4: "D"}


def test_diff_changelog_reconciles_consumer(spark, tmp_path):
    """The changelog is SUFFICIENT: a consumer holding snapshot A and
    applying diff_snapshots(A, B) through merge_upsert lands exactly on
    snapshot B — the incremental-read contract end to end."""
    cols = ["k", "val", "op", "seq"]
    b0 = spark.createDataFrame(
        [(1, "a", "U", 1), (2, "b", "U", 2), (3, "c", "U", 3)], cols)
    b1 = spark.createDataFrame(
        [(2, "b2", "U", 4), (3, "c", "D", 5), (9, "i", "I", 6)], cols)
    tbl = str(tmp_path / "mor_rec")
    catalog.write_cdc_delta(b0, tbl, 0, "k")
    catalog.write_cdc_delta(b1, tbl, 1, "k")
    copy_a = catalog.read_merge_on_read(spark, tbl, "k", as_of=0)
    diff = catalog.diff_snapshots(spark, tbl, "k", 0, 1)
    changes = diff.select(
        "k", F.col("new_val").alias("val"), "op",
        F.monotonically_increasing_id().alias("seq"))
    got = sorted(tuple(r) for r in
                 catalog.merge_upsert(copy_a, changes, "k").collect())
    want = sorted(tuple(r) for r in
                  catalog.read_merge_on_read(spark, tbl, "k").collect())
    assert got == want


def test_incr_gyration_apply_equals_full_recompute(spark, tmp_path):
    """The mobility matview: position upserts that MOVE a mover across
    groups, an in-batch supersede, and deletes that empty one group —
    incremental == full recompute of (cnt, Σx, Σy, Σx²+y²) at every
    batch boundary."""
    def full(state):
        xl = F.col("x").cast("long")
        yl = F.col("y").cast("long")
        return state.groupBy("g").agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(xl).cast("long").alias("sx"),
            F.sum(yl).cast("long").alias("sy"),
            F.sum(xl * xl + yl * yl).cast("long").alias("ssq"))
    cols = ["k", "g", "x", "y", "op", "seq"]
    b0 = spark.createDataFrame(
        [(1, "a", 0, 0, "U", 1), (2, "a", 10, 0, "U", 2),
         (3, "b", 5, 5, "U", 3), (4, "c", 7, -3, "U", 4)], cols)
    b1 = spark.createDataFrame(
        [(2, "b", 11, 1, "U", 5),            # mover 2 leaves group a
         (5, "a", -4, 6, "I", 6),            # new mover
         (4, "c", 0, 0, "D", 7)], cols)      # empties group c
    b2 = spark.createDataFrame(
        [(3, "b", 6, 6, "U", 8), (3, "b", 8, 8, "U", 9),  # supersede
         (1, "a", 0, 0, "D", 10)], cols)
    tbl = str(tmp_path / "mor_gyr")
    catalog.write_cdc_delta(b0, tbl, 0, "k")
    agg = full(catalog.read_merge_on_read(spark, tbl, "k"))
    for i, b in ((1, b1), (2, b2)):
        pre = catalog.read_merge_on_read(spark, tbl, "k")
        agg = catalog.incr_gyration_apply(agg, pre, b, "k", "g",
                                          "x", "y")
        catalog.write_cdc_delta(b, tbl, i, "k")
        post = catalog.read_merge_on_read(spark, tbl, "k")
        want = sorted(tuple(r) for r in full(post).collect())
        got = sorted(tuple(r) for r in agg.collect())
        assert got == want, f"after batch {i}: {got} != {want}"
    # c emptied in b1; a holds only mover 5 after b2's delete
    fin = {r["g"]: (r["cnt"], r["sx"], r["sy"], r["ssq"])
           for r in agg.collect()}
    assert set(fin) == {"a", "b"}
    assert fin["a"] == (1, -4, 6, 52)
