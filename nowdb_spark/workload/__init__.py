"""The oracle-checked query battery (driver contract).

Each entry pairs a PySpark implementation with an ANSI-SQL oracle that
DuckDB runs over the same parquet tables. Column names/aliases are kept
identical on both sides (the driver's compare sorts columns by name and
hashes values). Floating-point aggregates are rounded on BOTH sides at
a precision far above cross-engine summation-order noise.

Registry shape:
    QUERIES: dict[name, QuerySpec(spark=callable(spark, sf_dir) -> DF,
                                  oracle=SQL string | None)]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(spark=fn, oracle=oracle, doc=doc)
        return fn
    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver supplies its own SparkSession; make sure parquet
    # TIMESTAMP(NANOS) columns (events.ts) read as ns-Longs — the
    # engine's nowdb stamp policy (runtime-settable SQL conf).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# populate the registry
from nowdb_spark.workload import core  # noqa: E402,F401
from nowdb_spark.workload import dialect  # noqa: E402,F401
from nowdb_spark.workload import graph  # noqa: E402,F401
from nowdb_spark.workload import pipeline  # noqa: E402,F401
from nowdb_spark.workload import timeseries  # noqa: E402,F401
