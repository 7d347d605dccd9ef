"""Iceberg-emulated storage + resumable stages (SURVEY.md §7.6).

The real Iceberg runtime jar is absent offline (SURVEY.md §0), so the
Iceberg semantics the engine actually relies on are emulated with
partitioned parquet plus a JSON manifest:

  * hidden partitioning  — pages: (ts_day, url_bucket = pmod(xxhash64(url),
    B)); derived tables: host_bucket = pmod(xxhash64(host), B) so per-host
    stages are bucket-local (a bucket is a self-contained unit of work);
  * snapshots            — monotonically numbered manifest entries with
    schema + row counts;
  * per-partition lineage + metrics + resume — a stage commits bucket
    chunks; a re-run anti-joins planned vs committed buckets and reprocesses
    only the rest (outputs are deterministic, so overwriting a
    half-written chunk is idempotent).

Swapping in real Iceberg is config-only: read_table/write_* keep a
`spark.read.table`-shaped surface.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


class Manifest:
    def __init__(self, path: str | Path):
        self.dir = Path(path)
        self.file = self.dir / MANIFEST
        if self.file.exists():
            self.data = json.loads(self.file.read_text())
        else:
            self.data = {"snapshots": [], "partitions": {}, "lineage": {}}

    def save(self) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.file.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self.data, indent=1, sort_keys=True))
        tmp.replace(self.file)

    def new_snapshot(self, **meta) -> int:
        sid = (self.data["snapshots"][-1]["id"] + 1
               if self.data["snapshots"] else 0)
        self.data["snapshots"].append({"id": sid, **meta})
        return sid

    @property
    def current_snapshot(self) -> int | None:
        return self.data["snapshots"][-1]["id"] if self.data["snapshots"] else None

    def committed(self) -> set[str]:
        return set(self.data["partitions"])

    def commit_partitions(self, parts: dict[str, dict]) -> None:
        self.data["partitions"].update(parts)
        self.save()


def write_pages_table(pages: DataFrame, path: str | Path,
                      buckets: int = 16) -> Manifest:
    """Ingest web_pages with Iceberg-style hidden partitioning
    (days(warc_ts) x bucket(url)) — Catalyst prunes on both."""
    df = (pages
          .withColumn("ts_day", F.date_format("warc_ts", "yyyy-MM-dd"))
          .withColumn("url_bucket", F.pmod(F.xxhash64("url"), F.lit(buckets))))
    df.write.mode("overwrite").partitionBy("ts_day", "url_bucket") \
        .parquet(str(path))
    man = Manifest(path)
    counts = {f"{r['ts_day']}/{r['url_bucket']}": {"rows": r["n"]}
              for r in df.groupBy("ts_day", "url_bucket")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    sid = man.new_snapshot(table="web_pages", op="ingest",
                           partition_spec=["days(warc_ts)",
                                           f"bucket({buckets}, url)"],
                           schema=pages.schema.simpleString(),
                           rows=int(sum(c["rows"] for c in counts.values())))
    man.data["partitions"] = counts
    man.data["lineage"] = {"stage": "ingest", "snapshot": sid}
    man.save()
    return man


def read_table(spark: SparkSession, path: str | Path) -> DataFrame:
    return spark.read.parquet(str(path))


def merge_upsert(target: DataFrame, changes: DataFrame,
                 key_cols: list[str] | str = "doc_id",
                 op_col: str = "op", seq_col: str = "seq",
                 enforce_unique_seq: bool = True) -> DataFrame:
    """MERGE INTO / CDC-apply (the Iceberg/Delta merge shape): fold a
    change stream into a snapshot.

    `changes` carries the target's columns plus `op` ('I' insert/upsert,
    'U' update/upsert, 'D' delete) and `seq` (the CDC ordering — commit
    LSN / binlog position).  Per key, only the HIGHEST-seq change applies
    (earlier changes to the same key are superseded); I and U are both
    upserts (Iceberg MERGE's WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT collapse to the same row-level outcome when the payload is the
    full row).

    Scale shape: the change stream is reduced per-key FIRST (one
    changes-sized shuffle: max_by over (key)), then the TARGET NEVER
    SHUFFLES — survivors come from a left_anti join against the reduced
    key set (broadcastable while changes fit the AQE envelope; SMJ past
    it) and applied rows are a union of the reduced changes.  At 100 TB
    of target and GBs of daily CDC this is a map-only pass over the big
    side.  Determinism: per (key, seq) the change must be unique —
    enforced with a changes-sized agg that RAISES on violation (ties
    would make max_by engine-dependent); set enforce_unique_seq=False
    only if the producer already guarantees it."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in changes.columns if c not in (op_col, seq_col)]
    extra = [c for c in payload if c not in target.columns]
    if extra:
        raise ValueError(f"merge_upsert: change columns {extra} "
                         "missing from target")
    if enforce_unique_seq:
        dup = (changes.groupBy(*keys, seq_col)
               .agg(F.count(F.lit(1)).alias("n"))
               .filter(F.col("n") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"merge_upsert: non-unique (key, {seq_col}) in changes "
                f"(e.g. {dup[0]}) — the per-key winner would be "
                "engine-dependent")
    others = [c for c in payload if c not in keys]
    latest = (changes.groupBy(*keys)
              .agg(*[F.max_by(c, seq_col).alias(c) for c in others],
                   F.max_by(op_col, seq_col).alias(op_col)))
    kept = target.join(latest.select(*keys), keys, "left_anti")
    applied = (latest.filter(F.col(op_col) != "D")
               .select(*[c for c in target.columns if c in payload]))
    return kept.select(*applied.columns).unionByName(applied)


def merge_predicated(target: DataFrame, source: DataFrame,
                     key_cols: list[str] | str = "doc_id",
                     matched: Sequence[tuple] = (),
                     not_matched=None,
                     enforce_unique_key: bool = True) -> DataFrame:
    """MERGE INTO with arbitrary match predicates — the Iceberg/Delta
    `MERGE INTO t USING s ON keys
       WHEN MATCHED AND <pred> THEN UPDATE SET * / DELETE
       WHEN NOT MATCHED [AND <pred>] THEN INSERT *`
    shape that merge_upsert (keyed CDC apply) does not cover.

    `matched` is an ORDERED sequence of (pred, action) with action in
    {'update', 'delete'}; predicates are SQL strings or Columns over the
    aliases `t` (target) and `s` (source) — e.g. "t.n_chars < s.n_chars".
    Per matched row, clauses evaluate IN ORDER and the first true clause
    applies (SQL MERGE semantics; a NULL predicate falls through);
    matched rows with no true clause, and target rows with no source
    match, are kept unchanged.  `not_matched` (over `s` only) gates which
    unmatched source rows insert; None inserts all.  Payload is the full
    row (UPDATE SET * / INSERT *): source must carry exactly the target's
    columns.

    Ambiguity: a target row matching >1 source row makes the outcome
    order-dependent — like Delta, that RAISES (one source-sized agg),
    disable via enforce_unique_key only if the producer guarantees it.

    Scale shape: matched resolution is ONE left join — with a dim-sized
    source the target streams through a BroadcastHashJoin and its full
    rows NEVER cross an exchange (plan-pinned); the delete/update/keep
    choice is a map-side CASE.  Insert detection is a left_anti of the
    source against the target's KEY PROJECTION — the one unavoidable
    exchange carries only the column-pruned key scan, never target
    payloads.  At 100 TB of target and GBs of merge source both passes
    are map-only over the big side."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    extra = [c for c in source.columns if c not in target.columns]
    if extra:
        raise ValueError(f"merge_predicated: source columns {extra} "
                         "missing from target (full-row payload)")
    missing = [c for c in target.columns if c not in source.columns]
    if missing:
        raise ValueError(f"merge_predicated: source lacks target columns "
                         f"{missing} (UPDATE SET * / INSERT * contract)")
    for _, action in matched:
        if action not in ("update", "delete"):
            raise ValueError(f"merge_predicated: unknown action {action!r}")
    if enforce_unique_key:
        dup = (source.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
               .filter(F.col("n") > 1).limit(1).collect())
        if dup:
            raise ValueError(
                f"merge_predicated: ambiguous merge — duplicate source key "
                f"(e.g. {dup[0]}); a target row would match >1 source row")

    def _pred(p):
        return F.expr(p) if isinstance(p, str) else p

    t, s = target.alias("t"), source.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    # first-true-clause-wins: build the CASE from the last clause out
    act = F.lit("keep")
    for pred, action in reversed(list(matched)):
        act = F.when(_pred(pred), F.lit(action)).otherwise(act)
    act = F.when(F.col(f"s.{keys[0]}").isNull(), F.lit("keep")).otherwise(act)
    j = (t.join(s, cond, "left").withColumn("__act", act)
         .filter(F.col("__act") != "delete"))
    kept = j.select(*[
        F.when(F.col("__act") == "update", F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}")).alias(c) for c in target.columns])
    ins = source.join(target.select(*keys), keys, "left_anti").alias("s")
    if not_matched is not None:
        ins = ins.filter(_pred(not_matched))
    return kept.unionByName(ins.select(*target.columns))


def run_bucketed_stage(spark: SparkSession, stage: str,
                       in_path: str | Path, out_path: str | Path,
                       fn: Callable[[DataFrame], DataFrame],
                       bucket_col: str = "host_bucket",
                       n_buckets: int = 16,
                       chunk: int = 4,
                       key_col: str = "host",
                       key_expr=None,
                       fail_after_chunks: int | None = None) -> Manifest:
    """Resumable bucketed stage: fn maps a bucket-closed input slice to its
    output slice; commits per chunk of buckets; re-runs skip committed
    buckets (per-partition checkpoint + lineage, north_rule).

    The bucket key MUST close over fn's grouping key (host), so per-host
    kernels see complete hosts inside a chunk.  When the input isn't already
    bucketed on it (e.g. raw pages partitioned by ts_day/url_bucket), pass
    `key_expr` (a Column deriving the key) — each chunk then re-scans the
    input with only the needed columns (html stays pruned); at cluster
    scale, make the first stage a one-shuffle re-bucket and checkpoint that.

    `fail_after_chunks` injects a crash for resume tests.
    """
    src = read_table(spark, in_path)
    if bucket_col not in src.columns:
        key = key_expr if key_expr is not None else F.col(key_col)
        src = src.withColumn(bucket_col,
                             F.pmod(F.xxhash64(key), F.lit(n_buckets)))
    man = Manifest(out_path)
    done = man.committed()
    todo = [b for b in range(n_buckets) if str(b) not in done]
    if not todo:
        return man
    in_man = Manifest(in_path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    chunks = [todo[i:i + chunk] for i in range(0, len(todo), chunk)]
    for ci, bucket_ids in enumerate(chunks):
        if fail_after_chunks is not None and ci >= fail_after_chunks:
            raise RuntimeError(f"injected failure before chunk {ci}")
        sl = src.filter(F.col(bucket_col).isin(bucket_ids))
        out = fn(sl)
        if bucket_col not in out.columns:
            out = out.withColumn(bucket_col,
                                 F.pmod(F.xxhash64(key_col), F.lit(n_buckets)))
        out = out.persist()
        metrics = {str(r[bucket_col]): {"rows": r["n"]}
                   for r in out.groupBy(bucket_col)
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
        for b in bucket_ids:          # empty buckets still count as done
            metrics.setdefault(str(b), {"rows": 0})
        (out.write.mode("overwrite").partitionBy(bucket_col)
         .parquet(str(out_path)))
        out.unpersist()
        man.commit_partitions(metrics)
    man.new_snapshot(table=stage, op="stage",
                     lineage={"input": str(in_path),
                              "input_snapshot": in_man.current_snapshot,
                              "stage": stage})
    man.data["lineage"] = {"stage": stage, "input": str(in_path),
                           "input_snapshot": in_man.current_snapshot}
    man.save()
    return man


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort_by: tuple[str, ...] = (),
                   mode: str = "overwrite") -> None:
    """Write `df` as a BUCKETED parquet table (Hive-style bucketing via
    the session catalog): rows are hash-distributed into `n_buckets`
    files per write task by `key`, and the layout is recorded in the
    table metadata.

    This is the co-located-join primitive the 100-TB tier needs: two
    fact tables bucketed on the same key with the same bucket count
    join WITHOUT ANY EXCHANGE — each task reads bucket i of both sides
    (Spark recognizes the matching HashPartitioning from the catalog
    metadata), so the petabyte shuffle that dominates a large-large
    join simply disappears, and repeated joins amortize ONE write-time
    shuffle across every future query.  groupBy on the bucket key is
    likewise exchange-free.  `sort_by` additionally sorts rows inside
    each bucket file (tight row-group stats; sort-merge join can skip
    its sort when each bucket holds one file)."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if mode == "overwrite":
        # the default catalog is in-memory: a table written by a dead
        # session leaves its warehouse directory behind with no catalog
        # entry, and saveAsTable refuses the location.  Overwrite means
        # overwrite — drop the entry and clear a stale location.
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = Path(wh.removeprefix("file:")) / table.lower()
        if loc.exists():
            import shutil
            shutil.rmtree(loc)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str,
                  how: str = "inner") -> DataFrame:
    """Join two same-bucket-count catalog tables on their bucket keys.
    With bucketing metadata present, Catalyst plans a sort-merge join
    whose BOTH inputs read pre-bucketed files — zero Exchange operators
    (plan-pinned in tests); AQE is free to leave it alone because there
    is nothing to re-plan."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key], how)


# ---------------------------------------------------------------------------
# merge-on-read CDC table (streaming upsert target) + compaction
# ---------------------------------------------------------------------------

def write_cdc_delta(changes: DataFrame, path: str | Path, batch_id: int,
                    key_cols: list[str] | str, op_col: str = "op",
                    seq_col: str = "seq") -> bool:
    """Commit one CDC micro-batch as a MERGE-ON-READ delta file.

    This is the Iceberg-v2/Hudi-MOR write shape: the batch is reduced
    per key (max-seq winner, uniqueness enforced — merge_upsert's
    contract) and written as `delta-<batch>`; the base table is NEVER
    rewritten on ingest.  At 100 TB of table and GBs of CDC per trigger
    this is the difference between O(batch) and O(table) per commit.

    Ordering contract: batch order must follow CDC seq order (binlog
    position and commit order are the same order — true of any real CDC
    producer).  Within and across uncompacted deltas the per-key winner
    is decided by `seq`; once a compaction folds deltas into a base the
    base's seq is gone, so a LATER batch supersedes the base
    unconditionally — which is only correct because later batches carry
    later seqs.

    Exactly-once under foreachBatch replay: Structured Streaming re-runs
    a batch after a crash between sink write and checkpoint commit; the
    manifest records applied batch ids, a replayed id returns False and
    writes nothing (the manifest save is an atomic tmp+rename, so a
    half-written delta dir without a manifest entry is invisible and
    safely overwritten by the retry).  Returns True iff the batch was
    newly applied."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    man = Manifest(path)
    applied = man.data["lineage"].setdefault("applied_batches", [])
    if batch_id in applied:
        return False
    payload = [c for c in changes.columns if c not in (op_col, seq_col)]
    others = [c for c in payload if c not in keys]
    dup = (changes.groupBy(*keys, seq_col)
           .agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > 1).limit(1).collect())
    if dup:
        raise ValueError(f"write_cdc_delta: non-unique (key, {seq_col}) "
                         f"in batch {batch_id} (e.g. {dup[0]})")
    latest = (changes.groupBy(*keys)
              .agg(*[F.max_by(c, seq_col).alias(c) for c in others],
                   F.max_by(op_col, seq_col).alias(op_col),
                   F.max(seq_col).alias(seq_col)))
    # schema evolution (Iceberg ADD COLUMN): a batch may carry columns
    # the table has never seen (they become part of the table schema;
    # older rows read as NULL) or omit known ones (this batch's rows
    # read as NULL there).  What it may NOT do is change a known
    # column's type — the emulation is add-only, no promotions.
    schema_now = {f.name: f.dataType.simpleString()
                  for f in latest.schema.fields}
    known = man.data["lineage"].get("schema", {})
    for cname, t in schema_now.items():
        if cname in known and known[cname] != t:
            raise ValueError(
                f"write_cdc_delta: column {cname!r} type {t} conflicts "
                f"with table type {known[cname]} (add-only schema "
                "evolution; type changes are not supported)")
    man.data["lineage"]["schema"] = {**known, **schema_now}
    out = Path(path) / f"delta-{batch_id:08d}"
    latest.write.mode("overwrite").parquet(str(out))
    n = latest.count()
    man.new_snapshot(op="cdc_delta", batch=int(batch_id), rows=int(n),
                     file=out.name)
    applied.append(int(batch_id))
    man.data["partitions"][out.name] = {"rows": int(n)}
    man.save()
    return True


def read_merge_on_read(spark: SparkSession, path: str | Path,
                       key_cols: list[str] | str, op_col: str = "op",
                       seq_col: str = "seq",
                       as_of: int | None = None) -> DataFrame:
    """Read the state of a MOR CDC table: base snapshot (if any) with
    all subsequently-committed deltas folded in ONE merge pass.

    Per-batch reduction already kept only each batch's per-key winner
    and the winner-of-winners is the global winner (max-seq is
    associative), so the union of deltas feeds a single merge_upsert —
    the read amplification is one tiny-side shuffle regardless of how
    many deltas accumulated, not one join per delta.

    `as_of` is Iceberg-style snapshot time travel: the view is
    reconstructed from the manifest's snapshot LOG (the last compact at
    or before `as_of` supplies the base; deltas committed after it and
    at or before `as_of` fold on top).  Compaction never deletes files,
    so every historical snapshot stays readable until an explicit GC."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    man = Manifest(path)
    snaps = man.data["snapshots"]
    if as_of is not None:
        snaps = [s for s in snaps if s["id"] <= as_of]
    base_name, deltas = None, []
    for s in snaps:
        if s["op"] == "compact":
            base_name, deltas = s["file"], []
        elif s["op"] == "cdc_delta":
            deltas.append(s["file"])
    if not deltas and not base_name:
        raise ValueError(f"read_merge_on_read: no snapshot at or before "
                         f"as_of={as_of} in CDC table at {path}")
    dfs = [spark.read.parquet(str(Path(path) / d)) for d in deltas]
    base0 = (spark.read.parquet(str(Path(path) / base_name))
             if base_name else None)
    # schema evolution: the view's schema is the NAME-UNION of every
    # file in it (first-seen column order); a file that predates an
    # added column contributes typed NULLs there — the Iceberg
    # read-by-name resolution.  as_of views that predate an evolution
    # naturally keep the old schema (the newer files aren't in them).
    types, order = {}, []
    for df_ in ([base0] if base0 is not None else []) + dfs:
        for f in df_.schema.fields:
            if f.name not in types:
                types[f.name] = f.dataType
                order.append(f.name)

    def _align(df_, cols):
        return df_.select(*[
            F.col(c) if c in df_.columns
            else F.lit(None).cast(types[c]).alias(c) for c in cols])

    payload_order = [c for c in order if c not in (op_col, seq_col)]
    changes = None
    for df_ in dfs:
        a = _align(df_, payload_order + [op_col, seq_col])
        changes = a if changes is None else changes.unionByName(a)
    if base0 is not None:
        base = _align(base0, payload_order)
    else:
        base = changes.select(*payload_order).limit(0)
    if changes is None:
        return base
    return merge_upsert(base, changes, keys, op_col, seq_col,
                        enforce_unique_seq=False)  # enforced per delta


def compact_cdc_table(spark: SparkSession, path: str | Path,
                      key_cols: list[str] | str, op_col: str = "op",
                      seq_col: str = "seq") -> int:
    """Fold base + all deltas into a new base snapshot (the OPTIMIZE /
    Hudi-compaction maintenance op that bounds MOR read amplification).
    The new base commits via the atomic manifest swap: readers see
    either the old (base, deltas) view or the new base — both resolve
    to the same rows.  Compacted delta files are dropped from the
    manifest (and can safely be garbage-collected later).  Returns the new
    snapshot id."""
    state = read_merge_on_read(spark, path, key_cols, op_col, seq_col)
    man = Manifest(path)
    sid_next = (man.current_snapshot or 0) + 1
    out = Path(path) / f"base-{sid_next:08d}"
    state.write.mode("overwrite").parquet(str(out))
    n = state.count()
    sid = man.new_snapshot(op="compact", rows=int(n), file=out.name)
    man.data["partitions"] = {out.name: {"rows": int(n)}}
    man.data["lineage"]["base"] = out.name
    man.save()
    return sid


def _scd2_check_unique(changes: DataFrame, keys: list[str],
                       seq_col: str, where: str) -> None:
    dup = (changes.groupBy(*keys, seq_col)
           .agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > 1).limit(1).collect())
    if dup:
        raise ValueError(f"{where}: non-unique (key, {seq_col}) "
                         f"(e.g. {dup[0]}) — version order would be "
                         "engine-dependent")


def scd2_build(changes: DataFrame, key_cols: list[str] | str,
               op_col: str = "op", seq_col: str = "seq",
               enforce_unique_seq: bool = True) -> DataFrame:
    """Build a Slowly-Changing-Dimension TYPE 2 table from a change log
    (the dimension-history shape every warehouse keeps beside the
    merge_upsert TYPE-1 snapshot): one VERSION row per I/U change,
    validity interval [eff_from, eff_to) in CDC seq coordinates —
    eff_from is the change's own seq, eff_to the key's next change seq
    (NULL while current), is_current = open-ended.  A delete closes the
    preceding version (its seq becomes that version's eff_to) and emits
    no row of its own, so a deleted key simply has no current version; a
    later re-insert opens a fresh one.

    Scale shape: ONE exchange — the (key) hash partition for the
    lead() window — over the change log only (changes are GBs/day where
    the corpus is TBs; history accumulates in storage, not in any
    shuffle).  All arithmetic is column moves; no floats are created, so
    the output is bit-portable by construction."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if enforce_unique_seq:
        _scd2_check_unique(changes, keys, seq_col, "scd2_build")
    from pyspark.sql import Window
    payload = [c for c in changes.columns if c not in (op_col, seq_col)]
    w = Window.partitionBy(*keys).orderBy(seq_col)
    nxt = F.lead(seq_col).over(w)
    return (changes
            .select(*payload, F.col(op_col).alias("_op"),
                    F.col(seq_col).alias("eff_from"), nxt.alias("eff_to"))
            .filter(F.col("_op") != "D").drop("_op")
            .withColumn("is_current", F.col("eff_to").isNull()))


def scd2_apply(dim: DataFrame, changes: DataFrame,
               key_cols: list[str] | str, op_col: str = "op",
               seq_col: str = "seq",
               enforce_order: bool = True) -> DataFrame:
    """Incrementally apply a CDC batch to an existing SCD2 dimension:
    the exact-equivalence contract is

        scd2_apply(scd2_build(log[:k]), log[k:]) == scd2_build(log)

    (pytest-pinned), so consumers can maintain the dimension per batch
    instead of rebuilding from the full log.

    Scale shape: the DIMENSION NEVER SHUFFLES.  The batch reduces to one
    tiny (key, first_seq) table; the dimension takes a single
    broadcastable left join against it and a map-only column rewrite
    (only an affected key's CURRENT row changes: eff_to closes at the
    batch's first seq for that key).  New versions come from
    scd2_build(batch) — one batch-sized window exchange — where the
    oldest version per key inherits nothing from the dimension (its
    eff_from is its own seq).  At 100 TB of history + GBs of CDC this is
    a map-only pass over the big side, the merge_upsert posture.

    Ordering contract (enforced, RAISES): every batch seq for a key must
    exceed every seq the dimension has recorded for it (eff_from and the
    closing eff_to) — CDC batch order follows binlog order, the
    write_cdc_delta contract; violating it would interleave history."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    first = (changes.groupBy(*keys)
             .agg(F.min(seq_col).alias("_first_seq")))
    if enforce_order:
        dim_max = (dim.groupBy(*keys)
                   .agg(F.max(F.coalesce("eff_to", "eff_from"))
                        .alias("_dim_max")))
        bad = (first.join(dim_max, keys)
               .filter(F.col("_first_seq") <= F.col("_dim_max"))
               .limit(1).collect())
        if bad:
            raise ValueError(
                f"scd2_apply: batch seq <= existing dimension seq for a "
                f"key (e.g. {bad[0]}) — CDC batch order must follow seq "
                "order (write_cdc_delta contract)")
    j = dim.join(first, keys, "left")
    closing = (F.col("is_current") & F.col("_first_seq").isNotNull())
    rewritten = (j.withColumn("eff_to", F.when(closing, F.col("_first_seq"))
                              .otherwise(F.col("eff_to")))
                 .withColumn("is_current", F.col("is_current") & ~closing)
                 .drop("_first_seq"))
    fresh = scd2_build(changes, keys, op_col, seq_col)
    return rewritten.unionByName(fresh.select(*rewritten.columns))


def incr_agg_apply(agg: DataFrame, state: DataFrame, batch: DataFrame,
                   key_cols: list[str] | str, group_col: str,
                   val_col: str, op_col: str = "op",
                   seq_col: str = "seq") -> DataFrame:
    """Incrementally maintain a grouped (count, sum) aggregate over a
    CDC-upserted table — the SELF-MAINTAINABLE materialized view: when a
    batch lands, the view updates from the batch plus the PRE-batch rows
    of only the affected keys, never a full re-aggregation.

        agg'(g) = agg(g) - contrib(old rows of batch keys)
                         + contrib(new non-delete batch rows)

    `agg` carries (group_col, cnt, total); `state` is the table's
    pre-batch logical view (read_merge_on_read BEFORE the batch commit);
    `batch` is the raw CDC micro-batch (op/seq columns, write_cdc_delta's
    contract incl. unique (key, seq)).  Groups whose count reaches zero
    drop out of the view.

    Scale shape: work is O(batch + affected rows) — the batch reduces
    per key, old contributions come from a LEFT SEMI join of the state
    against the batch's (tiny, broadcastable) key set (with the bucketed
    /z-ordered layouts in this repo that semi probe is partition-pruned;
    it is never a re-aggregation), and the view update is an outer join
    of two GROUP-cardinality tables.  COUNT/SUM are self-maintainable
    under inserts, updates AND deletes because contributions subtract
    exactly; MIN/MAX are NOT (a deleted extremum forces a per-group
    re-scan) — by design this helper only maintains the (cnt, sum)
    pair (avg = total/cnt at read time)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in batch.columns if c not in (op_col, seq_col)]
    others = [c for c in payload if c not in keys]
    latest = (batch.groupBy(*keys)
              .agg(*[F.max_by(c, seq_col).alias(c) for c in others],
                   F.max_by(op_col, seq_col).alias(op_col)))
    old = state.join(latest.select(*keys), keys, "left_semi")
    minus = (old.groupBy(group_col)
             .agg((-F.count(F.lit(1))).alias("d_cnt"),
                  (-F.sum(val_col)).alias("d_total")))
    plus = (latest.filter(F.col(op_col) != "D")
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("d_cnt"),
                 F.sum(val_col).alias("d_total")))
    delta = (minus.unionByName(plus)
             .groupBy(group_col)
             .agg(F.sum("d_cnt").alias("d_cnt"),
                  F.sum("d_total").alias("d_total")))
    return (agg.join(delta, group_col, "full_outer")
            .select(F.col(group_col),
                    (F.coalesce("cnt", F.lit(0))
                     + F.coalesce("d_cnt", F.lit(0))).alias("cnt"),
                    (F.coalesce("total", F.lit(0))
                     + F.coalesce("d_total", F.lit(0))).alias("total"))
            .filter(F.col("cnt") > 0))


def incr_minmax_apply(agg: DataFrame, state: DataFrame, batch: DataFrame,
                      key_cols: list[str] | str, group_col: str,
                      val_col: str, op_col: str = "op",
                      seq_col: str = "seq") -> DataFrame:
    """Incrementally maintain a grouped (min, max, cnt) view over a CDC
    table — the NON-self-maintainable half of the matview family that
    incr_agg_apply's docstring defers: a deleted extremum cannot be
    subtracted out, so affected GROUPS rescan, but ONLY affected groups.

        agg'(g) = agg(g)                       for g untouched by batch
        agg'(g) = min/max/cnt over post-batch  for g in affected(batch)
                  rows of g

    affected(batch) = groups of the replaced pre-batch rows (the batch's
    key set, left-semi probed) UNION groups of the batch's non-delete
    winners — a batch-derived, broadcastable set.  Post-batch rows of
    those groups = (state rows of affected groups) MINUS batch keys PLUS
    batch survivors, re-aggregated; groups whose membership empties drop
    out by producing no row.

    Scale shape: O(batch + affected-group rows).  Both probes broadcast
    the batch-derived side; under a group-partitioned / z-ordered layout
    the affected-group semi scan is partition-pruned, the same posture
    as incr_agg_apply's key probe.  Contract: apply == full recompute at
    every batch boundary (pytest-pinned); `state` is the PRE-batch
    merge-on-read view and `batch` honors write_cdc_delta's unique
    (key, seq) rule."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in batch.columns if c not in (op_col, seq_col)]
    others = [c for c in payload if c not in keys]
    latest = (batch.groupBy(*keys)
              .agg(*[F.max_by(c, seq_col).alias(c) for c in others],
                   F.max_by(op_col, seq_col).alias(op_col)))
    old = state.join(latest.select(*keys), keys, "left_semi")
    survivors = latest.filter(F.col(op_col) != "D").select(*state.columns)
    affected = (old.select(group_col)
                .unionByName(survivors.select(group_col))
                .distinct())
    post = (state.join(F.broadcast(affected), group_col, "left_semi")
            .join(latest.select(*keys), keys, "left_anti")
            .unionByName(survivors))
    recomputed = (post.groupBy(group_col)
                  .agg(F.min(val_col).alias("mn"),
                       F.max(val_col).alias("mx"),
                       F.count(F.lit(1)).alias("cnt")))
    untouched = agg.join(F.broadcast(affected), group_col, "left_anti")
    return untouched.unionByName(recomputed)


def write_evolved_gen(df: DataFrame, path: str | Path, gen_id: int,
                      spec: dict[str, "F.Column"]) -> None:
    """Write one GENERATION of a partition-evolving table (Iceberg
    partition-spec evolution): `spec` maps partition column names to the
    derived expressions that compute them (hidden-partitioning style —
    days(ts), bucket(k, col), cell prefixes...).  Each generation keeps
    its OWN spec; evolving the spec never rewrites earlier generations
    (the whole point at 100 TB — re-partitioning a petabyte table to
    improve pruning of FUTURE writes costs nothing retroactively).
    The manifest records (generation -> spec columns) so the reader can
    prune each generation under the spec it was written with."""
    man = Manifest(path)
    gens = man.data["lineage"].setdefault("generations", {})
    if str(gen_id) in gens:
        raise ValueError(f"generation {gen_id} already written")
    out = Path(path) / f"gen-{gen_id:04d}"
    dfp = df
    for cname, expr in spec.items():
        dfp = dfp.withColumn(cname, expr)
    dfp.write.mode("overwrite").partitionBy(*spec.keys()).parquet(str(out))
    n = df.count()
    man.new_snapshot(op="gen_write", gen=int(gen_id),
                     spec=list(spec.keys()), rows=int(n), file=out.name)
    gens[str(gen_id)] = {"spec": list(spec.keys()), "file": out.name}
    man.save()


def read_evolved(spark: SparkSession, path: str | Path,
                 part_filters: dict[str, object] | None = None,
                 logical_cols: list[str] | None = None) -> DataFrame:
    """Read a partition-evolving table: every generation is scanned
    UNDER ITS OWN SPEC — a partition predicate prunes the generations
    whose spec contains that column (static PartitionFilters, no file
    ever opened) and applies as a plain pushed row filter nowhere (the
    column simply doesn't exist pre-evolution, so those generations
    contribute all their rows; the caller's exact row predicate, if
    any, belongs on the LOGICAL columns after this read).  This is the
    Iceberg read contract: spec evolution changes pruning power for new
    data only, never correctness.

    `part_filters` maps partition column -> required value; generations
    lacking the column ignore that filter.  `logical_cols` projects the
    result (partition columns are derived/hidden, so by default they are
    dropped from the unioned output)."""
    man = Manifest(path)
    gens = man.data["lineage"].get("generations", {})
    if not gens:
        raise ValueError(f"no generations at {path}")
    part_filters = part_filters or {}
    out = None
    for gid in sorted(gens, key=int):
        g = gens[gid]
        df = spark.read.parquet(str(Path(path) / g["file"]))
        for cname, val in part_filters.items():
            if cname in g["spec"]:
                df = df.filter(F.col(cname) == F.lit(val))
        keep = logical_cols or [c for c in df.columns
                                if c not in g["spec"]]
        df = df.select(*keep).withColumn("gen_id", F.lit(int(gid)))
        out = df if out is None else out.unionByName(df)
    return out


def diff_snapshots(spark: SparkSession, path: str | Path,
                   key_cols: list[str] | str, from_snap: int,
                   to_snap: int | None = None, op_col: str = "op",
                   seq_col: str = "seq") -> DataFrame:
    """Net row-level CHANGELOG between two snapshots of the MOR CDC
    table — the Iceberg incremental-read shape, i.e. what a downstream
    consumer replays to move its copy from snapshot A to snapshot B
    without re-reading the table: per key, 'I' (absent at A, present at
    B), 'D' (present at A, absent at B) or 'U' (present in both with any
    payload change; unchanged rows emit NOTHING — the net diff, not the
    raw delta stream, so a key updated five times then restored to its
    A-state disappears from the changelog).

    Output: key columns + op + one (old_<c>, new_<c>) pair per payload
    column (old_* NULL for I, new_* NULL for D).

    Scale shape: two as-of reads (each ONE associative max-seq fold —
    read_merge_on_read's contract) full-outer-joined on the key; at
    sane churn rates the joined frames are snapshot-sized but the diff
    emitted is churn-sized.  A real consumer tails the raw deltas for
    streaming; this is the reconciliation/backfill primitive."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    a = read_merge_on_read(spark, path, keys, op_col, seq_col,
                           as_of=from_snap)
    b = read_merge_on_read(spark, path, keys, op_col, seq_col,
                           as_of=to_snap)
    payload = [c for c in b.columns if c not in keys]
    a2 = a.select(*keys, F.lit(True).alias("_in_a"),
                  *[F.col(c).alias(f"old_{c}") for c in payload
                    if c in a.columns])
    b2 = b.select(*keys, F.lit(True).alias("_in_b"),
                  *[F.col(c).alias(f"new_{c}") for c in payload])
    j = a2.join(b2, keys, "full_outer")
    ina, inb = F.col("_in_a").isNotNull(), F.col("_in_b").isNotNull()
    changed = F.lit(False)
    for c in payload:
        old = (F.col(f"old_{c}") if f"old_{c}" in j.columns
               else F.lit(None))
        changed = changed | ~old.eqNullSafe(F.col(f"new_{c}"))
    out_cols = ([F.col(c) for c in keys]
                + [F.when(~ina, "I").when(~inb, "D").otherwise("U")
                   .alias(op_col)]
                + [x for c in payload for x in
                   ((F.col(f"old_{c}") if f"old_{c}" in j.columns
                     else F.lit(None).cast(b.schema[c].dataType))
                    .alias(f"old_{c}"),
                    F.col(f"new_{c}"))])
    return (j.filter((~ina & inb) | (ina & ~inb) | (ina & inb & changed))
            .select(*out_cols))


def incr_gyration_apply(agg: DataFrame, state: DataFrame,
                        batch: DataFrame, key_cols: list[str] | str,
                        group_col: str, x_col: str, y_col: str,
                        op_col: str = "op",
                        seq_col: str = "seq") -> DataFrame:
    """Incrementally maintain the per-group MOBILITY STATE — count,
    Σx, Σy, Σ(x²+y²), the sufficient statistics of A57's radius of
    gyration — over a CDC-upserted positions table: the lakehouse ×
    geospatial bridge.  All four measures are plain sums, so the view
    is SELF-MAINTAINABLE under inserts, updates AND deletes exactly
    like incr_agg_apply's (count, sum) pair:

        agg'(g) = agg(g) − contrib(old rows of batch keys)
                         + contrib(new non-delete batch rows)

    and the contract incr == full-recompute is pytest-pinned.  The
    gyration numerator rg2_num = n·Σ(x²+y²) − (Σx)² − (Σy)² and
    rg2_den = n² ride as derived columns at read time (A57's
    envelope applies to the derivation: keep |coord| < 2¹⁵ and group
    sizes <= 2¹⁵ upstream — the maintenance itself is sums-only and
    has no product envelope).

    Scale shape identical to incr_agg_apply: batch reduces per key
    (max_by seq), old contributions via a LEFT SEMI probe of the
    state against the batch's broadcastable key set, view update an
    outer join of two GROUP-cardinality tables; groups whose count
    reaches zero drop out.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in batch.columns if c not in (op_col, seq_col)]
    others = [c for c in payload if c not in keys]
    latest = (batch.groupBy(*keys)
              .agg(*[F.max_by(c, seq_col).alias(c) for c in others],
                   F.max_by(op_col, seq_col).alias(op_col)))
    xl = F.col(x_col).cast("long")
    yl = F.col(y_col).cast("long")

    def contrib(df: DataFrame, sign: int) -> DataFrame:
        s = F.lit(sign)
        return (df.groupBy(group_col)
                .agg((s * F.count(F.lit(1))).alias("d_cnt"),
                     (s * F.sum(xl)).alias("d_sx"),
                     (s * F.sum(yl)).alias("d_sy"),
                     (s * F.sum(xl * xl + yl * yl)).alias("d_ssq")))

    old = state.join(latest.select(*keys), keys, "left_semi")
    delta = (contrib(old, -1)
             .unionByName(contrib(
                 latest.filter(F.col(op_col) != "D"), 1))
             .groupBy(group_col)
             .agg(F.sum("d_cnt").alias("d_cnt"),
                  F.sum("d_sx").alias("d_sx"),
                  F.sum("d_sy").alias("d_sy"),
                  F.sum("d_ssq").alias("d_ssq")))
    z = F.lit(0).cast("long")
    merged = (agg.join(delta, group_col, "full_outer")
              .select(
                  F.col(group_col),
                  (F.coalesce(F.col("cnt"), z)
                   + F.coalesce(F.col("d_cnt"), z)).alias("cnt"),
                  (F.coalesce(F.col("sx"), z)
                   + F.coalesce(F.col("d_sx"), z)).alias("sx"),
                  (F.coalesce(F.col("sy"), z)
                   + F.coalesce(F.col("d_sy"), z)).alias("sy"),
                  (F.coalesce(F.col("ssq"), z)
                   + F.coalesce(F.col("d_ssq"), z)).alias("ssq"))
              .filter(F.col("cnt") > 0))
    return merged.select(
        group_col,
        F.col("cnt").cast("long").alias("cnt"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.col("ssq").cast("long").alias("ssq"))
