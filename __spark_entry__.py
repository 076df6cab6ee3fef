"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001
queries()     — every implemented operator (SURVEY.md §2 + pipeline
                extensions), one callable per name
oracle_sql()  — matching DuckDB SQL for the correctness gate

The real implementations live in nowdb_spark/ (operators, functions,
workload registry); this file only adapts them to the driver API.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, _REPO)
# python workers (Arrow-batch kernels) must also resolve nowdb_spark
# when the repo is used path-added rather than pip-installed
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))

from nowdb_spark.workload import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue per part brand
    through the two-dimension edge join (q16)."""
    return QUERIES["q16_join_two_dims"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items()
            if spec.oracle is not None}
