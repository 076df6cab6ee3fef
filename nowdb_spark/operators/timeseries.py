"""Time-series operators over ns-Long stamp columns.

The reference's time-series support is storage-level (stamped records,
time-partitioned files, period pruning — SURVEY §2.6); its only
declared-but-broken analytics aggregate is `integral`
(fun/fun.h:35). This module supplies the analytics layer:

  time_bucket    — floor a stamp to a bucket width (exact i64 math)
  downsample     — bucketed groupBy aggregation
  moving         — row-window moving aggregates per key
  integral       — trapezoid area under (t, y) per key (the working
                   version of the reference's integral, windowed —
                   no in-memory collection, unlike fun/fun.c:320-347)
  gap_fill       — materialize empty buckets per key (sequence +
                   explode; zero-filled counts, optional forward fill)

All pure Column/window compositions — one shuffle on the key, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nowdb_spark import timeutil as TU


def time_bucket(ns: Column, width_ns: int) -> Column:
    """Bucket start (ns) containing the stamp — exact long arithmetic."""
    return ns - F.pmod(ns, F.lit(width_ns))


def downsample(df: DataFrame, stamp_col: str, width_ns: int,
               keys: list[str], aggs: list) -> DataFrame:
    """Bucketed aggregation: (bucket_ns, keys..., aggs...)."""
    return (df.withColumn("bucket_ns",
                          time_bucket(F.col(stamp_col), width_ns))
            .groupBy("bucket_ns", *keys).agg(*aggs))


def moving(df: DataFrame, stamp_col: str, key_col: str, value_col: str,
           n_rows: int = 3, tiebreak: str | None = None) -> DataFrame:
    """Moving avg/min/max over the last n_rows+1 rows per key, ordered
    by stamp (deterministic with a tiebreak column)."""
    order = [F.col(stamp_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (W.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-n_rows, 0))
    return df.select(
        key_col, stamp_col,
        *( [tiebreak] if tiebreak else [] ),
        F.avg(value_col).over(w).alias("mov_avg"),
        F.min(value_col).over(w).alias("mov_min"),
        F.max(value_col).over(w).alias("mov_max"),
    )


def integral(df: DataFrame, stamp_col: str, key_col: str, value_col: str,
             tiebreak: str | None = None) -> DataFrame:
    """Trapezoid ∫y dt per key, t in seconds (reference `integral`,
    manual sql.tex:1360-1377, fixed and made streaming-safe)."""
    order = [F.col(stamp_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(key_col).orderBy(*order)
    us = TU.ns_to_us(F.col(stamp_col))
    prev_us = F.lag(us).over(w)
    prev_v = F.lag(F.col(value_col)).over(w)
    dt_s = (us - prev_us).cast("double") / 1e6
    area = dt_s * (F.col(value_col) + prev_v) / 2.0
    return (df.withColumn("__area", area)
            .groupBy(key_col)
            .agg(F.coalesce(F.sum("__area"), F.lit(0.0)).alias("integral")))


def gap_fill_interp(df: DataFrame, stamp_col: str, width_ns: int,
                    key_col: str, agg: Column) -> DataFrame:
    """Gap fill with LINEAR INTERPOLATION: missing buckets take the
    value interpolated between the nearest present buckets; leading/
    trailing gaps take the nearest present value (cannot extrapolate).

    Same distributed shape as gap_fill (bucketed agg → per-key domain
    via sequence+explode → left join) plus two ordered window passes
    (last/first over ignorenulls) — no UDFs, one shuffle on the key.
    """
    bucketed = (df.withColumn("bucket_ns",
                              time_bucket(F.col(stamp_col), width_ns))
                .groupBy(key_col, "bucket_ns").agg(agg.alias("__v")))
    spans = bucketed.groupBy(key_col).agg(
        F.min("bucket_ns").alias("lo"), F.max("bucket_ns").alias("hi"))
    domain = spans.select(
        key_col,
        F.explode(F.sequence("lo", "hi", F.lit(width_ns)))
        .alias("bucket_ns"))
    joined = domain.join(bucketed, [key_col, "bucket_ns"], "left")

    wb = (W.partitionBy(key_col).orderBy("bucket_ns")
          .rowsBetween(W.unboundedPreceding, 0))
    wf = (W.partitionBy(key_col).orderBy("bucket_ns")
          .rowsBetween(0, W.unboundedFollowing))
    v = F.col("__v").cast("double")
    present_b = F.when(F.col("__v").isNotNull(), F.col("bucket_ns"))
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_b = F.last(present_b, ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_b = F.first(present_b, ignorenulls=True).over(wf)
    frac = ((F.col("bucket_ns") - prev_b).cast("double")
            / (next_b - prev_b).cast("double"))
    interp = (F.when(v.isNotNull(), v)
              .when(prev_v.isNull(), next_v)
              .when(next_v.isNull(), prev_v)
              .otherwise(prev_v + (next_v - prev_v) * frac))
    return joined.select(key_col, "bucket_ns", interp.alias("v"))


def zscore(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key z-score (sample stddev): (v - μ_key) / σ_key, 0.0 for
    degenerate keys (σ=0 or n<2). Pure unordered window expressions —
    one shuffle on the key, no UDFs, scales to any key cardinality."""
    w = W.partitionBy(key_col)
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mu) / sd).otherwise(F.lit(0.0))
    return df.withColumn("z", z)


def ewma(df: DataFrame, stamp_col: str, key_col: str, value_col: str,
         alpha: float, tiebreak: str | None = None) -> DataFrame:
    """Exponentially weighted moving average per key in stamp order:
    y_0 = v_0, y_i = (1-α)·y_{i-1} + α·v_i  (pandas ewm adjust=False).

    The recurrence is inherently sequential — it is NOT expressible as
    a window aggregate without (1-α)^(n-i) rescaling terms that under/
    overflow at realistic series lengths — so this is the documented
    Pandas-UDF escape hatch: one shuffle on the key, then an
    Arrow-batched applyInPandas per key group. Each key's series must
    fit one executor (true of any per-entity series; segment by coarse
    time range upstream if a single key exceeds memory).
    """
    cols = [key_col, stamp_col] + ([tiebreak] if tiebreak else []) \
        + [value_col]
    src = df.select(*cols)
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                           for f in src.schema.fields)
    order = [stamp_col] + ([tiebreak] if tiebreak else [])

    def fn(pdf):
        pdf = pdf.sort_values(order)
        # explicit recurrence (not pandas .ewm, whose internal
        # normalized-weight update differs by an ulp): exactly
        # y = (1-α)·y + α·v per step, in input order
        vals = pdf[value_col].to_numpy()
        out = vals.copy().astype("float64")
        y = 0.0
        for i, v in enumerate(vals):
            y = v if i == 0 else (1 - alpha) * y + alpha * v
            out[i] = y
        pdf["ewma"] = out
        return pdf

    return src.groupBy(key_col).applyInPandas(
        fn, schema=f"{out_fields}, ewma double")


def gap_fill(df: DataFrame, stamp_col: str, width_ns: int,
             key_col: str, agg: Column,
             fill_value=0) -> DataFrame:
    """Zero-fill missing buckets per key between each key's min and
    max bucket. Bucket domain is generated per key with
    sequence+explode (distributed; no driver-side calendar)."""
    bucketed = (df.withColumn("bucket_ns",
                              time_bucket(F.col(stamp_col), width_ns))
                .groupBy(key_col, "bucket_ns").agg(agg.alias("__v")))
    spans = bucketed.groupBy(key_col).agg(
        F.min("bucket_ns").alias("lo"), F.max("bucket_ns").alias("hi"))
    domain = spans.select(
        key_col,
        F.explode(F.sequence("lo", "hi", F.lit(width_ns)))
        .alias("bucket_ns"))
    return (domain.join(bucketed, [key_col, "bucket_ns"], "left")
            .select(key_col, "bucket_ns",
                    F.coalesce(F.col("__v"), F.lit(fill_value)).alias("v")))
