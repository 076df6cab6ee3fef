"""Time-series workload over `events` (stamp = i64 ns), each paired
with a DuckDB oracle. DuckDB sees the parquet ns timestamps
µs-truncated, so oracles use epoch_us/epoch_ns consistently with the
engine's exact integer bucket math (bucket widths ≥ seconds make the
sub-µs difference unobservable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.operators import timeseries as TS
from nowdb_spark.workload import register, table

_HOUR_NS = 3_600_000_000_000
_6H_NS = 6 * _HOUR_NS
_DAY_NS = 24 * _HOUR_NS


@register(
    "ts01_downsample",
    f"""
    SELECT epoch_ns(ts) - (epoch_ns(ts) % {_6H_NS}) AS bucket_ns,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
    doc="6-hour bucket downsampling per event type",
)
def ts01(spark, sf):
    ev = table(spark, sf, "events")
    return TS.downsample(
        ev, "ts", _6H_NS, ["event_type"],
        [F.count(F.lit(1)).alias("n"),
         F.round(F.sum("value"), 4).alias("total")])


@register(
    "ts02_moving_avg",
    """
    SELECT user_id, epoch_us(ts) AS t_us, event_id,
           round(avg(value) OVER w, 6) AS mov_avg_r,
           min(value) OVER w AS mov_min,
           max(value) OVER w AS mov_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="row-window moving aggregates per user",
)
def ts02(spark, sf):
    from nowdb_spark import timeutil as TU

    ev = table(spark, sf, "events")
    out = TS.moving(ev, "ts", "user_id", "value", n_rows=3,
                    tiebreak="event_id")
    return out.select(
        "user_id",
        TU.ns_to_us(F.col("ts")).alias("t_us"),
        "event_id",
        F.round(F.col("mov_avg"), 6).alias("mov_avg_r"),
        "mov_min", "mov_max")


@register(
    "ts03_integral",
    """
    SELECT user_id,
           round(coalesce(sum(area), 0.0), 4) AS integral_r
    FROM (
      SELECT user_id,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6
               * (value + lag(value) OVER w) / 2.0 AS area
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) GROUP BY user_id
    """,
    doc="trapezoid integral of value over time per user (the working "
        "version of the reference's declared-broken `integral`)",
)
def ts03(spark, sf):
    ev = table(spark, sf, "events")
    out = TS.integral(ev, "ts", "user_id", "value", tiebreak="event_id")
    return out.select("user_id",
                      F.round(F.col("integral"), 4).alias("integral_r"))


@register(
    "ts05_ohlc",
    f"""
    SELECT user_id,
           epoch_ns(ts) - (epoch_ns(ts) % {_DAY_NS}) AS bucket_ns,
           arg_min(value, (epoch_ns(ts) % {_DAY_NS}) * 10000 + event_id)
             AS open_v,
           arg_max(value, (epoch_ns(ts) % {_DAY_NS}) * 10000 + event_id)
             AS close_v,
           max(value) AS high_v,
           min(value) AS low_v,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    doc="per-user daily OHLC downsample (arg_min/arg_max on a "
        "deterministic within-day-offset + id key)",
)
def ts05(spark, sf):
    ev = table(spark, sf, "events")
    # deterministic ordering key: ns offset within the day bucket
    # (< 8.64e13, so ×10⁴ + event_id stays inside i64), id tiebreak
    okey = F.pmod(F.col("ts"), F.lit(_DAY_NS)) * 10000 + F.col("event_id")
    return (
        ev.withColumn("bucket_ns", TS.time_bucket(F.col("ts"), _DAY_NS))
        .groupBy("user_id", "bucket_ns")
        .agg(F.min_by("value", okey).alias("open_v"),
             F.max_by("value", okey).alias("close_v"),
             F.max("value").alias("high_v"),
             F.min("value").alias("low_v"),
             F.count(F.lit(1)).alias("n"))
    )


@register(
    "ts06_zscore",
    """
    SELECT user_id, event_id,
           round(CASE WHEN stddev_samp(value) OVER w > 0
                 THEN (value - avg(value) OVER w)
                      / stddev_samp(value) OVER w
                 ELSE 0.0 END, 4) AS z_r
    FROM events WINDOW w AS (PARTITION BY user_id)
    """,
    doc="per-user z-score anomaly signal (unordered window mean/std)",
)
def ts06(spark, sf):
    ev = table(spark, sf, "events")
    out = TS.zscore(ev, "user_id", "value")
    return out.select("user_id", "event_id",
                      F.round(F.col("z"), 4).alias("z_r"))


@register(
    "ts07_ewma",
    """
    WITH RECURSIVE src AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), rec AS (
      SELECT user_id, t_us, event_id, value, rn, value AS ew
      FROM src WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.t_us, s.event_id, s.value, s.rn,
             (1 - 0.3) * r.ew + 0.3 * s.value
      FROM src s, rec r
      WHERE s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, t_us, event_id, round(ew, 6) AS ewma_r FROM rec
    """,
    doc="per-user EWMA (α=0.3; sequential recurrence via Arrow-batched "
        "applyInPandas; oracle recomputes the identical recurrence with "
        "a recursive CTE. α must NOT be dyadic (e.g. 0.5): over fixed-"
        "decimal inputs that lands EWMA values exactly on 6dp rounding "
        "boundaries, where Spark round (decimal HALF_UP) and DuckDB "
        "round (binary-scaled) disagree; 0.3 keeps every value off the "
        "boundary while both engines run bit-identical IEEE ops)",
)
def ts07(spark, sf):
    from nowdb_spark import timeutil as TU

    ev = table(spark, sf, "events")
    out = TS.ewma(ev, "ts", "user_id", "value", alpha=0.3,
                  tiebreak="event_id")
    return out.select("user_id",
                      TU.ns_to_us(F.col("ts")).alias("t_us"),
                      "event_id",
                      F.round(F.col("ewma"), 6).alias("ewma_r"))


@register(
    "ts08_gap_fill_interp",
    f"""
    WITH b AS (
      SELECT user_id,
             epoch_ns(ts) - (epoch_ns(ts) % {_DAY_NS}) AS bucket_ns,
             count(*) AS v
      FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(bucket_ns) AS lo, max(bucket_ns) AS hi
              FROM b GROUP BY user_id),
    dom AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, {_DAY_NS})) AS bucket_ns
      FROM spans
    ),
    j AS (
      SELECT dom.user_id, dom.bucket_ns, CAST(b.v AS DOUBLE) AS v,
             CASE WHEN b.v IS NOT NULL THEN dom.bucket_ns END AS pb
      FROM dom LEFT JOIN b
        ON dom.user_id = b.user_id AND dom.bucket_ns = b.bucket_ns
    ),
    w AS (
      SELECT user_id, bucket_ns, v,
             last_value(v IGNORE NULLS)  OVER wb AS prev_v,
             last_value(pb IGNORE NULLS) OVER wb AS prev_b,
             first_value(v IGNORE NULLS)  OVER wf AS next_v,
             first_value(pb IGNORE NULLS) OVER wf AS next_b
      FROM j
      WINDOW wb AS (PARTITION BY user_id ORDER BY bucket_ns
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY bucket_ns
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket_ns,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NULL THEN next_v
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v)
                  * (CAST(bucket_ns - prev_b AS DOUBLE)
                     / CAST(next_b - prev_b AS DOUBLE))
           END, 6) AS v_r
    FROM w
    """,
    doc="daily gap-fill with linear interpolation (exact-integer "
        "bucket counts interpolated — identical IEEE formula on both "
        "sides, so values are bit-stable)",
)
def ts08(spark, sf):
    ev = table(spark, sf, "events")
    out = TS.gap_fill_interp(ev, "ts", _DAY_NS, "user_id",
                             F.count(F.lit(1)))
    return out.select("user_id", "bucket_ns",
                      F.round(F.col("v"), 6).alias("v_r"))


@register(
    "ts04_gap_fill",
    f"""
    WITH b AS (
      SELECT user_id,
             epoch_ns(ts) - (epoch_ns(ts) % {_DAY_NS}) AS bucket_ns,
             count(*) AS v
      FROM events GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(bucket_ns) AS lo, max(bucket_ns) AS hi
              FROM b GROUP BY user_id),
    dom AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, {_DAY_NS})) AS bucket_ns
      FROM spans
    )
    SELECT dom.user_id, dom.bucket_ns,
           CAST(coalesce(b.v, 0) AS BIGINT) AS v
    FROM dom LEFT JOIN b
      ON dom.user_id = b.user_id AND dom.bucket_ns = b.bucket_ns
    """,
    doc="daily gap-fill per user (zero-filled missing buckets)",
)
def ts04(spark, sf):
    ev = table(spark, sf, "events")
    out = TS.gap_fill(ev, "ts", _DAY_NS, "user_id",
                      F.count(F.lit(1)))
    return out.select("user_id", "bucket_ns", F.col("v").cast("long").alias("v"))


@register(
    "ts09_asof_join",
    """
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(v.ts) AS view_us,
           round(v.value, 4) AS view_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="generic two-frame as-of join (union-window merge, one "
        "shuffle, no range explosion) — oracle is DuckDB's NATIVE "
        "ASOF LEFT JOIN, a true cross-engine semantics check",
)
def ts09(spark, sf):
    from nowdb_spark import timeutil as TU
    ev = table(spark, sf, "events")
    purchases = (ev.where(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts"))
    views = (ev.where(F.col("event_type") == "view")
               .select("user_id", "ts", "value"))
    j = TS.asof_join(purchases, views, ["user_id"], "ts")
    return j.select(
        "event_id", "user_id",
        TU.ns_to_us(F.col("ts")).alias("purchase_us"),
        TU.ns_to_us(F.col("ts_r")).alias("view_us"),
        F.round(F.col("value"), 4).alias("view_value"))


@register(
    "ts10_anomaly_mad",
    """
    WITH b AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id, value,
             list(value) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS BETWEEN 6 PRECEDING
                                        AND CURRENT ROW) AS w_arr
      FROM events),
    m AS (
      SELECT *, list_sort(w_arr) AS s, len(w_arr) AS n FROM b),
    m2 AS (
      SELECT user_id, t_us, event_id, value, w_arr,
             CASE WHEN n % 2 = 1 THEN s[(n + 1) // 2]
                  ELSE (s[n // 2] + s[n // 2 + 1]) / 2.0 END AS med_x
      FROM m),
    m3 AS (
      SELECT *,
             list_sort(list_transform(w_arr,
                                      x -> abs(x - med_x))) AS ds,
             len(w_arr) AS n
      FROM m2),
    m4 AS (
      SELECT user_id, t_us, event_id, value, med_x,
             CASE WHEN n % 2 = 1 THEN ds[(n + 1) // 2]
                  ELSE (ds[n // 2] + ds[n // 2 + 1]) / 2.0 END AS mad_x
      FROM m3)
    SELECT user_id, t_us, event_id, value,
           round(med_x, 6) AS med,
           round(mad_x, 6) AS mad,
           CAST(abs(value - med_x) > 4.4478 * mad_x AS BIGINT)
             AS is_anomaly
    FROM m4
    """,
    doc="rolling-median/MAD anomaly detection per user (trailing "
        "7-row window, exact middle-element median, |x-med| > "
        "3·1.4826·MAD) — the robust outlier flag of metric "
        "pipelines; the decision arithmetic is division/compare on "
        "identical doubles, so both engines agree bit-for-bit",
)
def ts10(spark, sf):
    ev = table(spark, sf, "events")
    return TS.rolling_mad_anomaly(ev, "ts", "user_id", "value",
                                  n_rows=6)


@register(
    "ts11_seasonal",
    f"""
    WITH b AS (
      SELECT event_type,
             epoch_ns(ts) - epoch_ns(ts) % {_HOUR_NS} AS bucket_ns,
             sum(value) AS v
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, bucket_ns, v,
             CASE WHEN count(v) OVER w = 25
                  THEN avg(v) OVER w END AS trend,
             CAST((bucket_ns // {_HOUR_NS}) % 24 AS BIGINT) AS phase
      FROM b
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ns
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    s AS (SELECT event_type, phase, avg(v - trend) AS seasonal
          FROM t GROUP BY 1, 2)
    SELECT event_type, bucket_ns, v,
           round(trend, 6) AS trend,
           round(seasonal, 6) AS seasonal,
           round(v - trend - seasonal, 6) AS residual
    FROM t JOIN s USING (event_type, phase)
    """,
    doc="classical additive seasonal decomposition of each "
        "event_type's hourly series (centered 25-bucket trend MA "
        "with full-window NULL edges, per-hour-of-day seasonal "
        "means, residual) — the STL-lite anomaly/forecast "
        "preprocessing step. key_col partitions the trend window "
        "per metric (10k metrics = 10k parallel series, no "
        "single-task wall); oracle replays the same window algebra",
)
def ts11(spark, sf):
    ev = table(spark, sf, "events")
    return TS.seasonal_decompose(ev, "ts", "value", _HOUR_NS,
                                 period=24, half=12,
                                 key_col="event_type")


@register(
    "ts12_interval_join",
    f"""
    WITH iv AS (
      SELECT u AS user_id, j AS interval_id,
             CAST(1704067200000000000 AS BIGINT)
               + u * {_HOUR_NS} + j * 50 * {_HOUR_NS} AS start_ns,
             CAST(1704067200000000000 AS BIGINT)
               + u * {_HOUR_NS} + j * 50 * {_HOUR_NS}
               + (j % 3 + 1) * 5 * {_HOUR_NS} AS end_ns
      FROM (SELECT unnest(range(0, 20)) AS u),
           LATERAL (SELECT unnest(range(0, 4)) AS j)),
    p AS (SELECT user_id, epoch_ns(ts) AS t_ns, event_id, value
          FROM events)
    SELECT p.user_id, p.t_ns // 1000 AS t_us, p.event_id,
           CAST(iv.interval_id AS BIGINT) AS interval_id,
           round(p.value, 4) AS value
    FROM p JOIN iv ON iv.user_id = p.user_id
                  AND p.t_ns BETWEEN iv.start_ns AND iv.end_ns
    """,
    doc="point-in-interval (range) join of events against per-user "
        "maintenance windows, executed by TIME-BUCKET decomposition "
        "(interval -> covered buckets, point -> its bucket, "
        "equi-join + containment filter) instead of the nested-loop "
        "a naive BETWEEN join plans; oracle runs the plain non-equi "
        "join — same rows, different physical strategy",
)
def ts12(spark, sf):
    base = 1704067200000000000
    iv = (spark.range(20).select(F.col("id").alias("user_id"))
          .crossJoin(spark.range(4).select(F.col("id")
                                           .alias("interval_id")))
          .select("user_id", "interval_id",
                  (F.lit(base) + F.col("user_id") * _HOUR_NS
                   + F.col("interval_id") * 50 * _HOUR_NS)
                  .alias("start_ns")))
    iv = iv.withColumn(
        "end_ns",
        F.col("start_ns")
        + (F.col("interval_id") % 3 + 1) * 5 * _HOUR_NS)
    ev = table(spark, sf, "events").select(
        "user_id", F.col("ts").alias("t_ns"), "event_id", "value")
    out = TS.interval_join(ev, iv, "t_ns", "user_id",
                           bucket_ns=_HOUR_NS)
    from nowdb_spark import timeutil as TU
    return out.select(
        "user_id", TU.int_div_floor(F.col("t_ns"), 1000).alias("t_us"),
        "event_id", "interval_id",
        F.round("value", 4).alias("value"))


# ------------------------------------------------------------------
# Holt linear-trend smoothing (ts13): double exponential smoothing
# folded over each event_type's hourly series. The recurrence is
# written in EXPANDED linear form and the oracle replays it with a
# per-key recursive CTE (ts07's proven shape) — NOT a list_reduce
# struct fold: DuckDB 1.x evaluates struct-fold fields sequentially
# with the accumulator mutated in place (verified: the 'b' field saw
# the already-updated 'l'), extending the mm15 repeated-subexpression
# finding to any cross-referencing state. Constants are generated
# from one Python computation and inlined identically.
_HW_A = 0.4
_HW_B = 0.3
_HW_ONE_A = 1.0 - _HW_A
_HW_BA = _HW_B * _HW_A
_HW_ONE_BA = 1.0 - _HW_BA


@register(
    "ts13_holt_linear",
    f"""
    WITH RECURSIVE b AS (
      SELECT event_type, t, v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY t) AS rn
      FROM (SELECT event_type,
                   epoch_ns(ts) - epoch_ns(ts) % {_HOUR_NS} AS t,
                   sum(value) AS v
            FROM events GROUP BY 1, 2)),
    rec AS (
      SELECT event_type, rn, CAST(v AS DOUBLE) AS l,
             CAST(0.0 AS DOUBLE) AS bb
      FROM b WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.rn,
             {_HW_A!r} * s.v + {_HW_ONE_A!r} * r.l
               + {_HW_ONE_A!r} * r.bb,
             {_HW_BA!r} * s.v - {_HW_BA!r} * r.l
               + {_HW_ONE_BA!r} * r.bb
      FROM b s, rec r
      WHERE s.event_type = r.event_type AND s.rn = r.rn + 1),
    last AS (SELECT event_type, max(rn) AS n FROM rec GROUP BY 1)
    SELECT r.event_type, CAST(last.n AS BIGINT) AS n_buckets,
           round(r.l, 6) AS level, round(r.bb, 6) AS trend,
           round(r.l + r.bb, 6) AS forecast_1
    FROM rec r JOIN last ON r.event_type = last.event_type
    WHERE r.rn = last.n
    """,
    doc="Holt linear-trend double exponential smoothing per metric "
        "key (level+trend fold over the bucketed hourly series, "
        "JVM F.aggregate in expanded linear form); final state and "
        "one-step forecast oracle-replayed by a list_reduce struct "
        "fold with the identical expanded constants",
)
def ts13(spark, sf):
    ev = table(spark, sf, "events")
    return TS.holt_linear(ev, "ts", "value", _HOUR_NS,
                          alpha=_HW_A, beta=_HW_B,
                          key_col="event_type")


# ------------------------------------------------------------------
# CUSUM changepoint detection (ts14): Page's two-sided cumulative-sum
# drift test folded over each event_type's hourly series (the
# anomaly class ts08's rolling-MAD z-score does NOT cover: z-scores
# flag single outliers, CUSUM accumulates small sustained shifts).
# Same determinism contract as ts13: bucket sums / mu / sigma rounded
# at 1e-6 on BOTH sides so engines fold identical doubles, alarm
# comparisons included; oracle = per-key recursive CTE (ts07 shape,
# plain recursion — MATERIALIZED mis-iterates inside RECURSIVE).
_CU_K = 0.5          # drift allowance kappa, in sigmas
_CU_H = 4.0          # alarm threshold h, in sigmas


@register(
    "ts14_cusum",
    f"""
    WITH RECURSIVE b AS (
      SELECT event_type, t, v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY t) AS rn
      FROM (SELECT event_type,
                   epoch_ns(ts) - epoch_ns(ts) % {_HOUR_NS} AS t,
                   round(sum(value), 6) AS v
            FROM events GROUP BY 1, 2)),
    st AS (SELECT event_type, round(avg(v), 6) AS mu,
                  coalesce(round(stddev_samp(v), 6), 0.0) AS sigma,
                  count(*) AS n
           FROM b GROUP BY 1),
    rec AS (
      SELECT event_type, 0 AS rn, CAST(0.0 AS DOUBLE) AS sp,
             CAST(0.0 AS DOUBLE) AS sn, CAST(0 AS BIGINT) AS na,
             CAST(0 AS BIGINT) AS fa
      FROM st
      UNION ALL
      SELECT s.event_type, s.rn,
        greatest(0.0, r.sp + (s.v - st.mu - {_CU_K!r}*st.sigma)),
        greatest(0.0, r.sn - (s.v - st.mu + {_CU_K!r}*st.sigma)),
        r.na + CASE WHEN
            greatest(0.0, r.sp + (s.v - st.mu - {_CU_K!r}*st.sigma))
              > {_CU_H!r}*st.sigma
            OR greatest(0.0,
                 r.sn - (s.v - st.mu + {_CU_K!r}*st.sigma))
              > {_CU_H!r}*st.sigma THEN 1 ELSE 0 END,
        CASE WHEN r.fa > 0 THEN r.fa
             WHEN
            greatest(0.0, r.sp + (s.v - st.mu - {_CU_K!r}*st.sigma))
              > {_CU_H!r}*st.sigma
            OR greatest(0.0,
                 r.sn - (s.v - st.mu + {_CU_K!r}*st.sigma))
              > {_CU_H!r}*st.sigma THEN s.rn ELSE 0 END
      FROM b s
      JOIN rec r ON s.event_type = r.event_type
                AND s.rn = r.rn + 1
      JOIN st ON st.event_type = s.event_type)
    SELECT r.event_type, CAST(st.n AS BIGINT) AS n_buckets,
           st.mu, st.sigma, r.na AS n_alarms, r.fa AS first_alarm,
           round(r.sp, 6) AS s_pos, round(r.sn, 6) AS s_neg
    FROM rec r JOIN st USING (event_type)
    WHERE r.rn = st.n
    """,
    doc="two-sided CUSUM changepoint detection (Page 1954) per "
        "metric key over the hourly series: S+/S- drift accumulators "
        "with kappa=0.5 sigma allowance and h=4 sigma alarm "
        "threshold, alarm count + first alarming bucket + final "
        "state — one JVM F.aggregate fold per key, oracle-replayed "
        "by a per-key recursive CTE step-for-step",
)
def ts14(spark, sf):
    ev = table(spark, sf, "events")
    return TS.cusum_changepoints(ev, "ts", "value", _HOUR_NS,
                                 kappa_sigmas=_CU_K,
                                 h_sigmas=_CU_H,
                                 key_col="event_type")
