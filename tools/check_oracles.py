#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir, compare row count, schema (column names) and
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: str(v) if v is not None else None)
        elif out[c].dtype.kind == "f":
            out[c] = out[c].round(6)
        elif out[c].dtype.kind in "iu":
            out[c] = out[c].astype("Int64")
    rows = [tuple(None if pd.isna(v) else v for v in r)
            for r in out.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(app="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # unpersist discipline (VERDICT r2 item 9): queries that
            # persist internals expose cleanup handles where they can,
            # but the gate runs 74 of them in one session — clear the
            # storage between queries so cached blocks never
            # accumulate across the run
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)}, "
                  f"cols={list(sdf.columns)})")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_rows = len(sdf) == len(odf)
        ok_vals = False
        if ok_cols and ok_rows:
            ok_vals = normalize(sdf) == normalize(odf)
        status = "OK  " if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(f"{status}  {name}: spark {len(sdf)}x{len(sdf.columns)} "
              f"vs duck {len(odf)}x{len(odf.columns)} "
              f"cols={'=' if ok_cols else sorted(sdf.columns)}"
              f"{'' if ok_cols else ' vs ' + str(sorted(odf.columns))}"
              f" vals={'=' if ok_vals else 'DIFF'}")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                a, b = normalize(sdf), normalize(odf)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"      spark: {x}\n      duck : {y}")
            elif ok_cols:
                sa = set(map(tuple, normalize(sdf)))
                sb = set(map(tuple, normalize(odf)))
                print(f"      only-spark: {list(sa - sb)[:2]}")
                print(f"      only-duck : {list(sb - sa)[:2]}")
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
