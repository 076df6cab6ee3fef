#!/usr/bin/env python
"""Targeted oracle check: driver_sim's exact compare, but over an
explicit list of query names (any registered row, windowed or not).

Usage: python tools/oracle_check.py <sf_dir> name [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from tests.driver_sim import TABLES, normalize  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
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
    failures = []
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            if name not in osql:
                print(f"  {name}: rows-only ({len(spdf)} rows) "
                      f"[{time.time()-t0:.1f}s]")
                continue
            odf = con.execute(osql[name]).df()
            a, b = normalize(spdf), normalize(odf)
            bad = []
            if list(a.columns) != list(b.columns):
                bad.append("COLS")
            elif len(a) != len(b):
                bad.append(f"ROWS spark={len(a)} oracle={len(b)}")
            else:
                for c in a.columns:
                    x, y = a[c], b[c]
                    if x.dtype != y.dtype:
                        bad.append(f"DTYPE {c}")
                    elif x.dtype == object:
                        if not (x.map(str) == y.map(str)).all():
                            bad.append(f"VALUES {c}")
                    elif np.issubdtype(x.dtype, np.floating):
                        if not np.allclose(x.fillna(np.nan),
                                           y.fillna(np.nan), rtol=0,
                                           atol=0, equal_nan=True):
                            bad.append(f"VALUES {c}")
                    elif not x.equals(y):
                        bad.append(f"VALUES {c}")
            if bad:
                failures.append(name)
                print(f"  {name}: FAIL {'; '.join(bad)}")
            else:
                print(f"  {name}: ok ({len(a)} rows) "
                      f"[{time.time()-t0:.1f}s]")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  {name}: ERROR {type(exc).__name__}: {exc}")
    print(f"{len(names)-len(failures)}/{len(names)} matched at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
