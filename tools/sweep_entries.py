#!/usr/bin/env python
"""Time EVERY `queries()` entry at a larger scale than the oracle
gate exercises (default sf0.1 = 10× the driver's sf0.01) — the
frequent_item_sets lesson: a plan can be gate-green at sf0.01 while a
hidden O(candidates·docs) stage blows up one scale later. One pass,
wall-clock per entry, slowest first; entries above --flag seconds are
listed as AUDIT candidates.

Usage: python tools/sweep_entries.py [sf_dir] [--flag 10] [--only k1,k2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--flag", type=float, default=10.0)
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS",
                                                     "12"))
    args = ap.parse_args()

    import __spark_entry__ as em
    from engine.session import get_spark

    spark = get_spark(app="sweep-entries", master=f"local[{args.cpus}]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    qs = em.queries()
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    # warmup (bench.py discipline): the first index touch in a fresh
    # JVM pays parquet discovery + whole-stage-codegen compilation —
    # without this, whichever index entry runs first absorbs ~8-25 s
    # of one-time cost and reads as a plan problem (it is not)
    try:
        em._cached_index(spark, args.sf_dir)
        em.entry(spark).count()
    except Exception:
        pass

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            n = fn(spark, args.sf_dir).count()
        except Exception:
            errors[name] = traceback.format_exc(limit=1).strip()
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 2)
        print(f"{dt:8.2f}s  {n:>8} rows  {name}", flush=True)

    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    flagged = [(k, v) for k, v in ranked if v >= args.flag]
    print("\n==== slowest 20 ====")
    for k, v in ranked[:20]:
        print(f"{v:8.2f}s  {k}")
    print(json.dumps({"sf": args.sf_dir,
                      "total_s": round(sum(timings.values()), 1),
                      "n_entries": len(timings),
                      "flagged": dict(flagged),
                      "errors": errors}))
    spark.stop()


if __name__ == "__main__":
    main()
