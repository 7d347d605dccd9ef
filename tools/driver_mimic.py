"""Local mimic of the driver's correctness gate: run each __spark_entry__
query AND its DuckDB oracle at a given sf dir, compare row count + column
names + exact sorted values.  Usage:

    python tools/driver_mimic.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif str(df[c].dtype) in ("int32", "uint32", "int16", "Int64", "Int32"):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    a, b = normalize(sdf.copy()), normalize(odf.copy())
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # dtype-strict: the driver's value hash is representation-sensitive
        # (a DuckDB HUGEINT sum materializes as float64 while Spark returns
        # int64 — the values compare equal but the driver flags the hash).
        # Fail loudly on int-vs-float so the mimic predicts the driver.
        kinds = {av.dtype.kind, bv.dtype.kind}
        if kinds == {"i", "f"} or kinds == {"u", "f"}:
            problems.append(
                f"col {c}: dtype mismatch spark={av.dtype} oracle={bv.dtype} "
                f"(driver hash is dtype-sensitive — CAST the oracle side)")
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(f"col {c}: {int(bad.sum())} exact mismatches "
                                f"(first: {av[i]!r} vs {bv[i]!r})")
        else:
            bad = av != bv
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(f"col {c}: {int(bad.sum())} mismatches "
                                f"(first: {av[i]!r} vs {bv[i]!r})")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from engine.session import get_spark
    spark = get_spark("driver-mimic", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in osql:
            status = "ROWS-ONLY" if len(sdf) >= 0 else "?"
            print(f"ok?  {name}: {status} rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = con.sql(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name}: rows={len(sdf)}")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
