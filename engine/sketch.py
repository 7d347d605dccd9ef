"""Mergeable frequency sketches: Misra-Gries heavy hitters over tokens.

The 100-TB problem: "which tokens/domains/urls dominate the corpus" is a
full token-explode + groupBy at corpus scale — the widest shuffle a
curation pipeline can emit (one exchange row per TOKEN OCCURRENCE).  A
Misra-Gries summary answers it with NO corpus-wide token exchange:

  1. each input partition reduces to <= k counter rows inside one
     whole-batch pandas kernel (explode + value_counts per Arrow batch,
     counter-merge + MG reduction in numpy — no per-row Python),
  2. the union of per-partition summaries (<= k rows per partition, i.e.
     KB not TB) is merged with an ordinary tiny groupBy,
  3. one final MG reduction on the merged counter set (driver-side,
     under an enforced envelope) yields the global summary.

Guarantees (mergeable-summaries theorem — Agarwal, Cormode, Huang,
Phillips, Wei, Yi, PODS 2012: MG summaries are mergeable with no error
growth): for total token count n and capacity k,

    * one-sided error:  0 <= true(t) - est(t) <= n/(k+1)  for every
      token in the summary;
    * every token with true(t) > n/(k+1) IS in the summary;
    * if the true vocabulary has <= k distinct tokens, no decrement ever
      fires and the summary equals the EXACT token counts — which is what
      makes the k >= vocab regime value-hash checkable against a plain
      SQL tokenize+count oracle while still running the sketch plan.

Reference scope note: frequency sketches are graft-mandated pipeline ops
(SURVEY §2 LLM-data block); the reference repo has no counterpart
(directory empty through round 4 — SURVEY §0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine.text import tokens_col

#: Hard ceiling on merged-summary rows collected to the driver for the
#: final reduction (k * n_partitions).  At k=1024 and 8192 partitions
#: this is 8.4M tiny rows — far past any sane config — so the raise is a
#: misconfiguration guard, not a scale limit.
MG_MAX_MERGED_ROWS = 1 << 23


def mg_merge_counts(acc: pd.Series, batch: pd.Series, k: int) -> pd.Series:
    """Merge two counter sets and reduce to <= k counters (Misra-Gries
    batch step): sum counts for shared tokens, then subtract the
    (k+1)-th largest count from all and drop the non-positive.  The
    subtraction is exactly the classic one-decrement step applied in
    bulk; each merge's total undercount is bounded by the subtracted
    value, and the PODS'12 theorem bounds the end-to-end error of any
    merge tree by n/(k+1)."""
    s = acc.add(batch, fill_value=0) if len(acc) else batch
    if len(s) <= k:
        return s.astype("int64")
    v = np.asarray(s.values, dtype="int64")
    # (k+1)-th largest = element at index len-k-1 of the ascending sort
    cut = np.partition(v, len(v) - k - 1)[len(v) - k - 1]
    out = s[s > cut] - cut
    return out.astype("int64")


def heavy_hitters_mg(df: DataFrame, k: int = 64, text_col: str = "text",
                     ) -> DataFrame:
    """Global Misra-Gries token summary as a DataFrame of
    (token string, est bigint), est descending then token.

    Plan shape: tokenize (native split/filter) -> mapInPandas partition
    summaries (<= k rows out per partition, whole-batch kernel) ->
    groupBy(token) over the tiny union -> enveloped driver reduction ->
    literal result.  The corpus text never crosses an exchange; the only
    shuffle carries <= k rows per input partition."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def summarize(batches):
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            toks = pdf["_toks"].explode().dropna()
            if len(toks) == 0:
                continue
            acc = mg_merge_counts(acc, toks.value_counts(), k)
        if len(acc):
            yield pd.DataFrame({"token": acc.index.astype(str),
                                "est": acc.to_numpy(dtype="int64")})

    parts = (df.select(tokens_col(F.col(text_col)).alias("_toks"))
             .mapInPandas(summarize, "token string, est long"))
    merged = parts.groupBy("token").agg(F.sum("est").alias("est"))
    rows = merged.collect()
    if len(rows) > MG_MAX_MERGED_ROWS:
        raise RuntimeError(
            f"merged MG summary has {len(rows)} rows > MG_MAX_MERGED_ROWS="
            f"{MG_MAX_MERGED_ROWS}; raise the envelope or lower k — the "
            "merge is k rows per input partition, so this indicates a "
            "runaway partition count, not data size")
    final = mg_merge_counts(
        pd.Series(dtype="int64"),
        pd.Series({r["token"]: r["est"] for r in rows}, dtype="int64"), k)
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(str(t), int(c)) for t, c in final.items()],
        "token string, est long") if len(final) else spark.createDataFrame(
        [], "token string, est long")
    return out.orderBy(F.desc("est"), "token")


def exact_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact (token, n) counts — the verification twin (full explode +
    groupBy; the shuffle the sketch exists to avoid).  Used by gates and
    tests only."""
    return (df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def _cms_pos(tok, row: int, width: int):
    """Portable CMS position: first 60 bits of md5(f"{row}:" || token)
    mod width — the repo's md5_60 exchange-hash family (decontaminate_
    bloom's contract), reproducible in any engine."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(f"{row}:"), tok)),
                               1, 15), 16, 10).cast("long") % width)


def count_min_build(df: DataFrame, depth: int = 4, width: int = 1024,
                    text_col: str = "text") -> DataFrame:
    """Build a Count-Min sketch over the corpus token stream: a
    depth x width counter matrix as (row, pos, c) rows.

    Scale shape: the token explode feeds a (row, pos)-keyed partial-agg
    — map-side combine collapses each partition to <= depth*width
    counter rows BEFORE the exchange, so like Misra-Gries the shuffle is
    KB per partition regardless of corpus size, but unlike MG the
    summary answers point queries for EVERY token (not only survivors)
    with the one-sided guarantee est >= true, and two sketches merge by
    plain cell-wise addition (linear sketch).

    Unlike most sketches, the whole construction is integer sums over a
    portable hash family, so a DuckDB oracle replays it EXACTLY — no
    error-gate needed for the build itself."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    toks = df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
    rows = toks.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 _cms_pos(F.col("tok"), i, width).alias("pos"))
        for i in range(depth)])).alias("_rp"))
    return (rows.select(F.col("_rp.row").alias("row"),
                        F.col("_rp.pos").alias("pos"))
            .groupBy("row", "pos")
            .agg(F.count(F.lit(1)).alias("c")))


def count_min_estimate(sketch: DataFrame, queries: DataFrame,
                       depth: int = 4, width: int = 1024,
                       token_col: str = "token") -> DataFrame:
    """Point-frequency estimates: est(t) = min over rows of the counter
    at that row's position — the CMS guarantee est >= true always (hash
    collisions only ADD), with P[est > true + eps*n] <= (1/e)^depth at
    width = e/eps.  The sketch side is depth*width rows (KB — broadcast
    by AQE); queries probe map-only + one tiny min-agg."""
    probes = queries.select(
        F.col(token_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     _cms_pos(F.col(token_col), i, width).alias("pos"))
            for i in range(depth)])).alias("_rp")) \
        .select(token_col, F.col("_rp.row").alias("row"),
                F.col("_rp.pos").alias("pos"))
    return (probes.join(sketch, ["row", "pos"], "left")
            .groupBy(token_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est")))
