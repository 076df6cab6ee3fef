#!/usr/bin/env python
"""Scale-factor escalation data: replicate the driver's sf0.1 tables
xN with key offsets so joins keep their selectivity and the data
volume grows linearly. Used by tools/scale_check.py to prove the
headline queries scale ~linearly sf0.1 -> sf1 -> sf10 (VERDICT r5
item 4); output lands under .scaledata/ (gitignored).

Key structure per copy i: every surrogate key k becomes k + i*(max+1)
for its own key space, so each copy is a disjoint, fully-joinable
replica (orders->customer, lineitem->part/supplier all stay 1:1 with
the original distribution). Timestamps are left as-is: a time-range
predicate then selects xN rows, which is exactly the linear-growth
property the check asserts. Document text gets a per-copy suffix so
the dedup operators see realistic near-dup structure instead of every
doc exploding into an N-way exact-dup group.

Usage: python tools/scale_data.py <factor> [<out_dir>]
       factor 10 -> sf1, factor 100 -> sf10
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from nowdb_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# per-table key columns that need per-copy offsets, keyed by the
# table that OWNS the key space (offset = max over the owner +1)
KEYS = {
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "orders": [("o_orderkey", "orders", "o_orderkey"),
               ("o_custkey", "customer", "c_custkey")],
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "events": [("event_id", "events", "event_id"),
               ("user_id", "events", "user_id")],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}
COPY_AS_IS = ["region", "nation"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else str(
        Path(__file__).resolve().parent.parent
        / ".scaledata" / f"sf{factor / 10:g}")
    spark = get_spark("scale_data")

    offs: dict[tuple[str, str], int] = {}
    for tbl, keys in KEYS.items():
        for _, owner, okey in keys:
            if (owner, okey) not in offs:
                df = spark.read.parquet(f"{SRC}/{owner}.parquet")
                offs[(owner, okey)] = int(
                    df.agg(F.max(okey)).collect()[0][0]) + 1

    for t in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{out}/{t}.parquet")

    for t, keys in KEYS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        rep = df.crossJoin(
            spark.range(factor).select(F.col("id").alias("__copy")))
        for col, owner, okey in keys:
            rep = rep.withColumn(
                col, F.col(col) + F.col("__copy") * offs[(owner, okey)])
        if t == "documents":
            rep = rep.withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text"))
                .otherwise(F.concat(F.col("text"), F.lit(" rep"),
                                    F.col("__copy"))))
        (rep.drop("__copy")
         .repartition(max(4, factor))
         .write.mode("overwrite").parquet(f"{out}/{t}.parquet"))
        print(f"{t}: x{factor} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
