"""Driver-gate simulation: run the first-50 registered queries exactly
the way the spark-graft driver does (its own plain SparkSession, DuckDB
oracle on the same parquet at sf0.01), and compare rows, columns, and
pandas DTYPES — the dtype check is what catches HUGEINT-vs-BIGINT-class
hash mismatches that a pure value compare would miss.

Usage:  python tests/driver_sim.py [sf_dir] [first_n]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # the driver hashes values after widening within a numeric family
    # (int32==int64 passes; int64 vs HUGEINT/float does NOT) — mirror
    # that by upcasting ints to int64 and floats to float64, and by
    # normalizing the None/NaN spelling of nulls in object columns
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.signedinteger):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.unsignedinteger):
            df[c] = df[c].astype("uint64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.map(str))
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)[:first_n]
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = sdf.toPandas()
            if name not in osql:
                print(f"  {name}: rows-only ({len(spdf)} rows) "
                      f"[{time.time()-t0:.1f}s]")
                continue
            odf = con.execute(osql[name]).df()
            a, b = normalize(spdf), normalize(odf)
            status = []
            if list(a.columns) != list(b.columns):
                status.append(f"COLS spark={list(a.columns)} "
                              f"oracle={list(b.columns)}")
            elif len(a) != len(b):
                status.append(f"ROWS spark={len(a)} oracle={len(b)}")
            else:
                for c in a.columns:
                    x, y = a[c], b[c]
                    if x.dtype != y.dtype:
                        status.append(f"DTYPE {c}: spark={x.dtype} "
                                      f"oracle={y.dtype}")
                        continue
                    if x.dtype == object:
                        eq = (x.map(str) == y.map(str)).all()
                    elif np.issubdtype(x.dtype, np.floating):
                        eq = np.allclose(x.fillna(np.nan), y.fillna(np.nan),
                                         rtol=0, atol=0, equal_nan=True)
                    else:
                        eq = x.equals(y)
                    if not eq:
                        diffs = (x.map(str) != y.map(str))
                        i = int(np.argmax(diffs.values))
                        status.append(f"VALUES {c}: first diff row {i}: "
                                      f"spark={x.iloc[i]!r} "
                                      f"oracle={y.iloc[i]!r}")
            if status:
                failures.append(name)
                print(f"  {name}: FAIL {'; '.join(status)}")
            else:
                print(f"  {name}: ok ({len(a)} rows) "
                      f"[{time.time()-t0:.1f}s]")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  {name}: ERROR {type(exc).__name__}: {exc}")
    print(f"\n{len(names)-len(failures)}/{len(names)} matched at {sf_dir}")
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
