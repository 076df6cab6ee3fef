"""The nowdb scalar operator surface as Column builders.

One entry per SQL-reachable op of the reference's expression engine
(op codes fun/expr.h:414-521; SQL name resolution
fun/expr.c:2762-2860). Semantics notes:

  - `/` on two integers is FLOAT division (reference DIV macro,
    fun/fun.c:44-46) — the binder casts operands to double.
  - `%` is integer remainder, `^` is pow.
  - `log` is the natural logarithm (C log()).
  - ceil/floor/round keep float type (C ceil/floor/round).
  - `=`/`!=` against NULL is always false; only `is [not] null`
    matches NULL (doc/manual/sql.tex:311-333) — native Spark
    three-valued logic already gives a false-ish (NULL) filter
    result, matching observable behavior.
  - time component extractors operate on ns-Long stamps (timeutil).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from nowdb_spark import timeutil as TU


def nowdb_div(a: Column, b: Column) -> Column:
    """nowdb `/`: always float division (fun/fun.c:44-46)."""
    return a.cast("double") / b.cast("double")


def nowdb_rem(a: Column, b: Column) -> Column:
    return a.cast("long") % b.cast("long")


def nowdb_pow(a: Column, b: Column) -> Column:
    return F.pow(a, b)


def _ident(c: Column) -> Column:
    return c


# name -> (arity, builder). arity -1 = variadic.
SCALAR_OPS: dict[str, tuple[int, object]] = {
    # arithmetic (fun/expr.h:424-429)
    "+": (2, lambda a, b: a + b),
    "-": (2, lambda a, b: a - b),
    "*": (2, lambda a, b: a * b),
    "/": (2, nowdb_div),
    "%": (2, nowdb_rem),
    "^": (2, nowdb_pow),
    # rounding / math (fun/expr.h:430-435)
    "log": (1, F.log),
    "abs": (1, F.abs),
    "ceil": (1, lambda c: F.ceil(c).cast("double")),
    "floor": (1, lambda c: F.floor(c).cast("double")),
    "round": (1, lambda c: F.round(c, 0)),
    # trigonometry + aliases (fun/expr.h:436-447, names expr.c:2787-2816)
    "sin": (1, F.sin), "sine": (1, F.sin),
    "cos": (1, F.cos), "cosine": (1, F.cos),
    "tan": (1, F.tan), "tang": (1, F.tan), "tangent": (1, F.tan),
    "asin": (1, F.asin), "asine": (1, F.asin),
    "arcsin": (1, F.asin), "arcsine": (1, F.asin),
    "acos": (1, F.acos), "acosine": (1, F.acos),
    "arccos": (1, F.acos), "arccosine": (1, F.acos),
    "atan": (1, F.atan), "atang": (1, F.atan), "atangent": (1, F.atan),
    "arctan": (1, F.atan), "arctang": (1, F.atan),
    "arctangent": (1, F.atan),
    "sinh": (1, F.sinh),
    "cosh": (1, F.cosh),
    "tanh": (1, F.tanh),
    "asinh": (1, F.asinh), "arcsinh": (1, F.asinh),
    "acosh": (1, F.acosh), "arccosh": (1, F.acosh),
    "atanh": (1, F.atanh), "arctanh": (1, F.atanh),
    # constants (fun/expr.h:449-450)
    "pi": (0, lambda: F.lit(math.pi)),
    "e": (0, lambda: F.lit(math.e)),
    # conversions (fun/expr.h:414-418)
    "tofloat": (1, lambda c: c.cast("double")),
    "toint": (1, lambda c: c.cast("long")),
    "touint": (1, lambda c: c.cast("long")),
    "totime": (1, lambda c: c.cast("long")),
    # logic helpers (fun/expr.h:456-473)
    "coal": (-1, F.coalesce),
    "coalesce": (-1, F.coalesce),
    "just": (1, _ident),
    # time extraction over ns-Long (fun/expr.h:479-494)
    "year": (1, TU.year),
    "month": (1, TU.month),
    "mday": (1, TU.mday),
    "wday": (1, TU.wday),
    "yday": (1, TU.yday),
    "hour": (1, TU.hour),
    "minute": (1, TU.minute),
    "second": (1, TU.second),
    "milli": (1, TU.milli),
    "micro": (1, TU.micro),
    "nano": (1, TU.nano),
    "epoch": (1, TU.epoch),
    # time constants (fun/expr.h:491-493)
    "dawn": (0, TU.dawn),
    "dusk": (0, TU.dusk),
    "now": (0, TU.now),
    # time bucketing (extension — composes with GROUP BY expressions:
    # `group by bucket(stamp, 3600000000000)` = hourly rollup; exact
    # i64 floor, same math as operators/timeseries.time_bucket)
    "bucket": (2, lambda ns, w: ns - F.pmod(ns, w)),
    # internal (fun/expr.h:521)
    "version": (0, lambda: F.lit("nowdb_spark-0.1.0")),
}


def build_scalar(name: str, *args: Column) -> Column:
    """Resolve a nowdb function name and apply it (case-insensitive)."""
    key = name.lower()
    if key not in SCALAR_OPS:
        raise KeyError(f"unknown nowdb function: {name}")
    arity, fn = SCALAR_OPS[key]
    if arity >= 0 and len(args) != arity:
        raise TypeError(f"{name} expects {arity} args, got {len(args)}")
    return fn(*args)
