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
