"""nowdb function surface as PySpark Column builders.

scalar.py     — the scalar op table (reference: fun/expr.h:414-521,
                name resolution fun/expr.c:2762-2860)
aggregates.py — the aggregate table with nowdb edge-case semantics
                (reference: fun/fun.h:20-35, fun/fun.c)
"""

from nowdb_spark.functions.aggregates import (  # noqa: F401
    AGGREGATES,
    avg0,
    median,
    prod,
    spread,
    stddev0,
)
from nowdb_spark.functions.scalar import SCALAR_OPS, build_scalar  # noqa: F401
