"""Capture .explain("formatted") for a set of declared queries into a
directory — the before/after plan evidence for optimization rounds.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [sf_dir] [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt.  Runs at sf0.001 by default: plan
SHAPE is scale-independent and the envelope-check jobs some query
builders run stay cheap.  Streaming queries (no batch explain) are
skipped automatically.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    names = sys.argv[4:]
    outdir.mkdir(parents=True, exist_ok=True)

    import __spark_entry__ as entrymod
    from engine.session import get_spark
    spark = get_spark("capture-plans", master="local[8]",
                      shuffle_partitions=16)
    qs = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not a declared query")
            continue
        try:
            df = qs[name](spark, sf_dir)
            if df.isStreaming:
                print(f"SKIP {name}: streaming")
                continue
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            continue
        p = outdir / f"{name}_{suffix}.txt"
        p.write_text(plan)
        print(f"wrote {p} ({plan.count('Exchange')} Exchange)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
