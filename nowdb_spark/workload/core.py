"""Relational workload — the nowdb operator inventory (SURVEY.md §2)
re-expressed over the driver's TPC-H-ish tables.

Mapping of query → reference operator:
  q01  full scan + filter + projection  (FS_ reader, reader/reader.c:1100)
  q02  point lookup                     (SEARCH_, qplan/plan.c:1610-1618)
  q03  IN-list lookup                   (MRANGE, reader/reader.h:34)
  q04  time-range scan                  (period pruning, reader/reader.c:1089)
  q05  distinct keys                    (KRANGE, qplan/plan.c:1620-1628)
  q06  per-key counting                 (CRANGE, query/cursor.c:387-393)
  q07  count(*) fast path               (COUNTALL, qplan/plan.c:1780-1796)
  q08  grouped aggregation battery      (GROUPING/AGGREGATES, query/cursor.c:726)
  q09  global aggregation, no GROUP BY  (nogrp, query/cursor.c:592-607)
  q10  median/stddev per group          (MANY-class aggs, fun/fun.c:320-347)
  q11  ordered top-k                    (ORDERING, qplan/plan.h:31)
  q12  scalar expression battery        (fun/expr.c evalOp)
  q13  time component extraction        (fun/expr.h:479-494)
  q14  NULL semantics / CASE / coalesce (sql.tex:311-333, nowdbsql.y:981-1020)
  q15  edge→vertex join on origin       (documented join design, sql.tex:2293-2368)
  q16  edge joining two vertex types    (join ... on origin + on destin)
  q17  degree-style graph aggregation
  q18  top-k per group (window)          — extension beyond reference
  q19  semi join (EXISTS)                — extension
  q20  anti join (NOT EXISTS)            — extension
  q21  product aggregate per group      (prod, fun/fun.c:384-385)
  q22  sessionization over events        — time-series extension
  q23  as-of join (latest view ≤ purchase) — time-series extension

Scale notes (100 TB stance): every query is pure DataFrame API —
Catalyst pushes filters/projections into the parquet scan; joins
against small dimensions are explicitly broadcast; fact-fact joins
shuffle on the join key and rely on AQE for skew; no collect-driven
logic anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nowdb_spark import timeutil as TU
from nowdb_spark.functions import aggregates as A
from nowdb_spark.workload import hoist, register, table


# ------------------------------------------------------------------
# q01 — full scan + filter + projection (predicate & column pushdown)
@register(
    "q01_scan_filter",
    """
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45.0 AND l_discount < 0.05
    """,
    doc="FS_ full scan with inline filter; projection pruned to 5 cols",
)
def q01(spark, sf):
    li = table(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45.0) & (F.col("l_discount") < 0.05))
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
                "l_extendedprice")
    )


# ------------------------------------------------------------------
# q02 — point lookup (index search → parquet min/max + dictionary filter)
@register(
    "q02_point_lookup",
    """
    SELECT l_linenumber, l_partkey, l_suppkey, l_quantity
    FROM lineitem WHERE l_orderkey = 1
    """,
    doc="SEARCH_ point lookup on the primary key",
)
def q02(spark, sf):
    li = table(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_orderkey") == 1)
        .select("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    )


# ------------------------------------------------------------------
# q03 — IN-list (MRANGE multi-key lookup)
@register(
    "q03_in_list",
    """
    SELECT p_partkey, p_brand, p_size, p_retailprice
    FROM part WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
    """,
    doc="MRANGE: IN-list membership",
)
def q03(spark, sf):
    p = table(spark, sf, "part")
    return (
        p.filter(F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .select("p_partkey", "p_brand", "p_size", "p_retailprice")
    )


# ------------------------------------------------------------------
# q04 — time-range scan (the reference prunes files by [from,to) period;
# Spark prunes row groups / partitions by the timestamp predicate)
@register(
    "q04_time_range",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    """,
    doc="time-period pruning on the stamp column (i64 ns, nowdb policy)",
)
def q04(spark, sf):
    # events.ts is parquet TIMESTAMP(NANOS) → read as i64 ns (the nowdb
    # stamp representation); range bounds are ns literals, so the
    # comparison pushes down to the parquet scan as a plain Long filter.
    ev = table(spark, sf, "events")
    lo = TU.parse_time_literal("2024-01-10")
    hi = TU.parse_time_literal("2024-01-20")
    return (
        ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .select("event_id", "user_id", "event_type", "value")
    )


# ------------------------------------------------------------------
# q05 — distinct keys (KRANGE keys-only scan)
@register(
    "q05_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="KRANGE: one record per distinct key",
)
def q05(spark, sf):
    return table(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ------------------------------------------------------------------
# q06 — per-key counting (CRANGE)
@register(
    "q06_count_by_key",
    """
    SELECT event_type, count(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="CRANGE: per-key counting reader",
)
def q06(spark, sf):
    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ------------------------------------------------------------------
# q07 — count(*) fast path (COUNTALL from store metadata; Spark answers
# from parquet footer row counts)
@register(
    "q07_countall",
    "SELECT count(*) AS cnt FROM lineitem",
    doc="COUNTALL: metadata-only count",
)
def q07(spark, sf):
    return table(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


# ------------------------------------------------------------------
# q08 — grouped aggregation battery (TPC-H Q1 shape + nowdb spread)
@register(
    "q08_group_agg",
    """
    SELECT
      l_returnflag, l_linestatus,
      count(*) AS cnt,
      round(sum(l_quantity), 3) AS sum_qty,
      round(avg(l_quantity), 6) AS avg_qty,
      round(sum(l_extendedprice), 2) AS sum_base,
      round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
      min(l_extendedprice) AS min_price,
      max(l_extendedprice) AS max_price,
      round(max(l_extendedprice) - min(l_extendedprice), 2) AS spread_price,
      round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="GROUPING + the aggregate register battery incl. nowdb spread()",
)
def q08(spark, sf):
    li = table(spark, sf, "lineitem")

    def _aggs():
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 3).alias("sum_qty"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6)
            .alias("sum_charge"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.round(A.spread(F.col("l_extendedprice")), 2)
            .alias("spread_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        )

    return (
        li.filter(hoist("q08_filter",
                        lambda: F.col("l_shipdate") <= "2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*hoist("q08_aggs", _aggs))
    )


# ------------------------------------------------------------------
# q09 — global aggregation without GROUP BY (nowdb 'nogrp')
@register(
    "q09_global_agg",
    """
    SELECT
      count(*) AS cnt,
      round(sum(value), 4) AS sum_value,
      round(avg(value), 6) AS avg_value,
      min(value) AS min_value,
      max(value) AS max_value,
      round(max(value) - min(value), 4) AS spread_value
    FROM events
    """,
    doc="whole-set aggregates; avg empty→0 compat handled in A.avg0",
)
def q09(spark, sf):
    ev = table(spark, sf, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(A.avg0(F.col("value")), 6).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(A.spread(F.col("value")), 4).alias("spread_value"),
    )


# ------------------------------------------------------------------
# q10 — median + sample stddev per group (MANY-class aggregates; the
# reference buffers all values in memory, Spark's percentile spills)
@register(
    "q10_median_stddev",
    """
    SELECT
      l_returnflag,
      round(median(l_quantity), 6) AS med_qty,
      round(stddev_samp(l_quantity), 6) AS sd_qty,
      round(median(l_extendedprice), 6) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="exact median (mean-of-middles) + sample stddev, nowdb semantics",
)
def q10(spark, sf):
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(*hoist("q10_aggs", lambda: (
        F.round(A.median(F.col("l_quantity")), 6).alias("med_qty"),
        F.round(A.stddev0(F.col("l_quantity")), 6).alias("sd_qty"),
        F.round(A.median(F.col("l_extendedprice")), 6).alias("med_price"),
    )))


# ------------------------------------------------------------------
# q11 — ordered top-k (the reference orders only via an index; Spark
# sorts freely — TakeOrderedAndProject, no full sort materialization)
@register(
    "q11_order_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="ORDER BY + LIMIT → TakeOrderedAndProject (no global sort)",
)
def q11(spark, sf):
    o = table(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ------------------------------------------------------------------
# q12 — scalar expression battery (arithmetic, pow, rounding, log,
# trig, CASE, modulo, int/ → float) — reference fun/expr.c evalFun
@register(
    "q12_expressions",
    """
    SELECT
      p_partkey,
      round(pow((p_retailprice + 5.0) / 2.0, 2), 6) AS f_pow,
      ceil(p_retailprice * 10.0) / 10.0 AS f_ceil,
      floor(p_retailprice * 10.0) / 10.0 AS f_floor,
      round(p_retailprice) AS f_round,
      round(ln(p_retailprice), 9) AS f_log,
      round(sin(p_size) + cos(p_size), 9) AS f_trig,
      abs(p_size - 25) AS f_abs,
      p_size % 7 AS f_mod,
      CAST(p_size AS DOUBLE) / 7 AS f_div,
      CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS f_case
    FROM part
    """,
    doc="scalar op battery with nowdb semantics (int / → float, ^ = pow)",
)
def q12(spark, sf):
    p = table(spark, sf, "part")
    size = F.col("p_size")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(F.pow((price + 5.0) / 2.0, 2), 6).alias("f_pow"),
        (F.ceil(price * 10.0).cast("double") / 10.0).alias("f_ceil"),
        (F.floor(price * 10.0).cast("double") / 10.0).alias("f_floor"),
        F.round(price, 0).alias("f_round"),
        F.round(F.log(price), 9).alias("f_log"),
        F.round(F.sin(size) + F.cos(size), 9).alias("f_trig"),
        F.abs(size - 25).alias("f_abs"),
        (size % 7).alias("f_mod"),
        (size.cast("double") / 7).alias("f_div"),
        F.when(size < 10, "S").when(size < 30, "M").otherwise("L").alias("f_case"),
    )


# ------------------------------------------------------------------
# q13 — time component extraction (year/month/mday/yday/hour/minute/
# second/epoch over the stamp; reference fun/expr.h:479-494)
@register(
    "q13_time_extract",
    """
    SELECT
      event_id,
      CAST(year(ts) AS INT) AS t_year,
      CAST(month(ts) AS INT) AS t_month,
      CAST(dayofmonth(ts) AS INT) AS t_mday,
      CAST(dayofyear(ts) AS INT) AS t_yday,
      CAST(hour(ts) AS INT) AS t_hour,
      CAST(minute(ts) AS INT) AS t_minute,
      CAST(second(ts) AS INT) AS t_second,
      CAST(floor(epoch(ts)) AS BIGINT) AS t_epoch
    FROM events WHERE user_id < 5
    """,
    doc="time extraction battery on the ns stamp (timeutil extractors)",
)
def q13(spark, sf):
    ev = table(spark, sf, "events").filter(F.col("user_id") < 5)
    ns = F.col("ts")  # i64 ns stamp
    return ev.select(
        "event_id",
        TU.year(ns).alias("t_year"),
        TU.month(ns).alias("t_month"),
        TU.mday(ns).alias("t_mday"),
        TU.yday(ns).alias("t_yday"),
        TU.hour(ns).alias("t_hour"),
        TU.minute(ns).alias("t_minute"),
        TU.second(ns).alias("t_second"),
        TU.epoch(ns).alias("t_epoch"),
    )


# ------------------------------------------------------------------
# q14 — NULL semantics + CASE + coalesce (sql.tex:311-333). The data
# has no physical NULLs, so NULLs are manufactured with nullif.
@register(
    "q14_null_semantics",
    """
    SELECT
      event_id,
      coalesce(nullif(event_type, 'error'), 'none') AS et,
      CASE WHEN value > 100 THEN value END AS big_value,
      (CASE WHEN value > 100 THEN value END) IS NULL AS is_small,
      (nullif(event_type, 'error') = 'error') AS never_true
    FROM events WHERE user_id < 20
    """,
    doc="is null / is not null / = NULL is never true / coalesce",
)
def q14(spark, sf):
    ev = table(spark, sf, "events").filter(F.col("user_id") < 20)
    et_null = F.nullif(F.col("event_type"), F.lit("error"))
    big = F.when(F.col("value") > 100, F.col("value"))
    return ev.select(
        "event_id",
        F.coalesce(et_null, F.lit("none")).alias("et"),
        big.alias("big_value"),
        big.isNull().alias("is_small"),
        (et_null == "error").alias("never_true"),
    )


# ------------------------------------------------------------------
# q15 — the documented nowdb join: edge→vertex on origin against the
# vertex PK (sql.tex:2293-2368: `from buys join client on origin`).
# orders is the edge, customer the origin vertex. customer is a
# dimension → broadcast (no shuffle of the fact side).
@register(
    "q15_join_origin",
    """
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc="edge→vertex inner join on origin (broadcast dim)",
)
def q15(spark, sf):
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
    )


# ------------------------------------------------------------------
# q16 — edge joining two vertex types (origin + destin), aggregated:
# revenue per part brand. lineitem⋈orders shuffles on the key (AQE
# handles skew); part is broadcast.
@register(
    "q16_join_two_dims",
    """
    SELECT
      p.p_brand,
      count(*) AS n_items,
      round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY p.p_brand
    """,
    doc="two-vertex edge join + grouped revenue (broadcast dims, AQE)",
)
def q16(spark, sf):
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    p = table(spark, sf, "part")
    return (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(p.select("p_partkey", "p_brand")),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(*hoist("q16_aggs", lambda: (
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice")
                          * (1 - F.col("l_discount"))), 4)
            .alias("revenue"),
        )))
    )


# ------------------------------------------------------------------
# q17 — degree-style graph aggregation: order count + distinct
# customers per nation (out-degree of the customer→order edge rolled
# up the customer→nation hierarchy).
@register(
    "q17_degree",
    """
    SELECT
      n.n_name,
      count(*) AS n_orders,
      count(DISTINCT c.c_custkey) AS n_customers,
      round(sum(o.o_totalprice), 2) AS total_value
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="degree/rollup over the graph hierarchy (broadcast dims)",
)
def q17(spark, sf):
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(*hoist("q17_aggs", lambda: (
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )))
    )


# ------------------------------------------------------------------
# q18 — top-k per group via window (extension; reference has no
# windows). Deterministic tiebreak on the key.
@register(
    "q18_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="window row_number top-3 per priority class",
)
def q18(spark, sf):
    o = table(spark, sf, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


# ------------------------------------------------------------------
# q19 — semi join (EXISTS): customers having at least one URGENT order
@register(
    "q19_semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
    doc="left-semi join (EXISTS)",
)
def q19(spark, sf):
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


# ------------------------------------------------------------------
# q20 — anti join (NOT EXISTS): parts never shipped in bulk. The
# unfiltered "parts never ordered" form matches the oracle with ZERO
# rows on the dense synthetic data — a vacuous gate row; the quantity
# predicate keeps the result non-empty at every sf so the anti-join
# semantics are actually exercised.
@register(
    "q20_anti_join",
    """
    SELECT p_partkey, p_name
    FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey
                        AND l.l_quantity > 45)
    """,
    doc="left-anti join (NOT EXISTS), non-empty at gate scale",
)
def q20(spark, sf):
    p = table(spark, sf, "part")
    li = (table(spark, sf, "lineitem")
          .filter(F.col("l_quantity") > 45).select("l_partkey"))
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
    )


# ------------------------------------------------------------------
# q21 — product aggregate per group (nowdb prod; fun/fun.c:384-385).
# Small groups (lineitems per order), exact sign/zero handling.
@register(
    "q21_prod",
    """
    SELECT l_orderkey,
           round(product(l_quantity), 4) AS prod_qty,
           count(*) AS n
    FROM lineitem WHERE l_orderkey < 200
    GROUP BY l_orderkey
    """,
    doc="prod() aggregate — exact product (MANY-class, small groups)",
)
def q21(spark, sf):
    li = table(spark, sf, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.groupBy("l_orderkey").agg(
        F.round(A.prod_exact(F.col("l_quantity")), 4).alias("prod_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ------------------------------------------------------------------
# q22 — sessionization: count 30-minute-gap sessions per user
# (time-series extension; lag + conditional cumsum, one shuffle on
# user_id which also serves the window sort).
@register(
    "q22_sessionize",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(1 + sum(CASE WHEN gap_ns > 1800000000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id, ts,
             epoch_ns(ts) - epoch_ns(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ns
      FROM events
    ) GROUP BY user_id
    """,
    doc="sessionization via lag + gap>30min cumsum (ns-exact)",
)
def q22(spark, sf):
    ev = table(spark, sf, "events")  # ts is i64 ns

    def _exprs():
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        gap = F.col("ts") - F.lag("ts").over(w)
        return (gap,
                F.count(F.lit(1)).alias("n_events"),
                (1 + F.sum(F.when(F.col("gap_ns") > 1_800_000_000_000, 1)
                           .otherwise(0)))
                .cast("long").alias("n_sessions"))

    gap, n_events, n_sessions = hoist("q22_exprs", _exprs)
    return (
        ev.withColumn("gap_ns", gap)
        .groupBy("user_id")
        .agg(n_events, n_sessions)
    )


# ------------------------------------------------------------------
# q23 — as-of join: for each purchase event, the most recent prior
# 'view' by the same user (time-series extension; windowed last-value
# emulation — scales as one shuffle+sort per user partition, no
# per-row probe).
@register(
    "q23_asof_view_before_purchase",
    """
    SELECT event_id, user_id,
           epoch_us(ts) AS purchase_us,
           epoch_us(last_view_ts) AS last_view_us
    FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_view_ts
      FROM events
    ) WHERE event_type = 'purchase'
    """,
    doc="as-of join via running max over the ordered per-user stream",
)
def q23(spark, sf):
    ev = table(spark, sf, "events")  # ts is i64 ns

    def _exprs():
        w = (
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        last_view = F.max(
            F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        # presentation in µs: DuckDB reads parquet ns timestamps
        # µs-truncated, so the oracle-visible precision edge is µs
        # (TU.ns_to_us is exact).
        return (last_view,
                TU.ns_to_us(F.col("ts")).alias("purchase_us"),
                TU.ns_to_us(F.col("last_view_ns")).alias("last_view_us"))

    last_view, purchase_us, last_view_us = hoist("q23_exprs", _exprs)
    return (
        ev.withColumn("last_view_ns", last_view)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", purchase_us, last_view_us)
    )


# ------------------------------------------------------------------
# q24 — TPC-H Q3 shape: multi-join + aggregation + ordered top-k
# (customer filter broadcast; lineitem⋈orders shuffles on orderkey)
@register(
    "q24_shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'AUTOMOBILE'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-06-30'
    GROUP BY l.l_orderkey, year(o.o_orderdate), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q3 shape: 3-way join, grouped revenue, ordered top-k",
)
def q24(spark, sf):
    c = (table(spark, sf, "customer")
         .filter(F.col("c_mktsegment") == "AUTOMOBILE")
         .select("c_custkey"))
    o = (table(spark, sf, "orders")
         .filter(F.col("o_orderdate") < "1998-01-01")
         .select("o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"))
    li = (table(spark, sf, "lineitem")
          .filter(F.col("l_shipdate") > "1996-06-30")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", F.year("o_orderdate").alias("order_year"),
                 "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "order_year", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


# ------------------------------------------------------------------
# q27 — TPC-H Q7 shape: trade volume between nation pairs by year
@register(
    "q27_volume_shipping",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: cross-nation trade volume by year",
)
def q27(spark, sf):
    li = (table(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1998-01-01")))
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf, "nation").select("n_nationkey", "n_name")
    ns = n.select(F.col("n_nationkey").alias("ns_key"),
                  F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"),
                  F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .join(F.broadcast(nc), c.c_nationkey == F.col("nc_key"))
        .filter(F.col("ns_key") != F.col("nc_key"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("volume"))
    )


# ------------------------------------------------------------------
# q28 — TPC-H Q12 shape: order-priority classes per year
@register(
    "q28_priority_classes",
    """
    SELECT CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_quantity >= 25.0
    GROUP BY 1
    """,
    doc="TPC-H Q12 shape: conditional counts per year",
)
def q28(spark, sf):
    li = (table(spark, sf, "lineitem")
          .filter(F.col("l_quantity") >= 25.0)
          .select("l_orderkey", "l_shipdate"))
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"))
    )


# ------------------------------------------------------------------
# q29 — TPC-H Q14 shape: promo revenue share
@register(
    "q29_promo_revenue",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
           AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    doc="TPC-H Q14 shape: conditional revenue ratio",
)
def q29(spark, sf):
    li = (table(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1997-07-01")))
    p = table(spark, sf, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6)
             .alias("promo_pct"))
    )


# ------------------------------------------------------------------
# q30 — TPC-H Q17 shape: small-quantity orders vs per-part average
# (correlated subquery, decorrelated into a groupBy + join)
@register(
    "q30_small_quantity_avg",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
          FROM lineitem GROUP BY l_partkey) a
      ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
    doc="TPC-H Q17 shape: correlated avg subquery, decorrelated",
)
def q30(spark, sf):
    li = table(spark, sf, "lineitem")
    half_avg = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
                .agg((0.5 * F.avg("l_quantity")).alias("half_avg")))
    # NO broadcast hint (r13): half_avg has one row per l_partkey — it
    # grows WITH the fact table, and a forced broadcast of a
    # fact-derived aggregate ignores the 8 GB / 512M-row broadcast cap
    # at 100 TB (guide §3.1). Left to the planner: below the
    # autoBroadcastJoinThreshold it still broadcasts (same plan at
    # bench scale), above it AQE keys both sides on l_partkey — and
    # the agg side arrives already hash-partitioned by l_partkey from
    # its own groupBy, so the join re-shuffles only the probe side.
    return (
        li.join(half_avg, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ------------------------------------------------------------------
# q31 — mode() made deterministic: most frequent value with explicit
# count-then-value tiebreak (the reference declares mode but never
# implemented it, fun/fun.c:440-444; the builtin's tie behavior is
# engine-specific, so the gate uses the rank formulation)
@register(
    "q31_mode",
    """
    SELECT l_returnflag, mode_qty FROM (
      SELECT l_returnflag, l_quantity AS mode_qty,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY count(*) DESC, l_quantity) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    """,
    doc="mode via deterministic count/value rank",
)
def q31(spark, sf):
    li = table(spark, sf, "lineitem")
    counts = (li.groupBy("l_returnflag", F.col("l_quantity").alias("mode_qty"))
              .agg(F.count(F.lit(1)).alias("c")))
    w = W.partitionBy("l_returnflag").orderBy(F.col("c").desc(),
                                              F.col("mode_qty"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("l_returnflag", "mode_qty"))


# ------------------------------------------------------------------
# q32 — TPC-H Q2 shape: join back to a per-group minimum (cheapest
# supplier per part); the aggregate-then-rejoin decorrelation pattern
@register(
    "q32_min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             round(min(l_extendedprice / l_quantity), 6) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, min(unit_cost) AS best_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey, c.l_suppkey, c.unit_cost
    FROM costs c JOIN best b
      ON b.l_partkey = c.l_partkey AND c.unit_cost = b.best_cost
    """,
    doc="TPC-H Q2 shape: per-group min, join back for the argmin rows",
)
def q32(spark, sf):
    li = table(spark, sf, "lineitem")
    costs = (li.groupBy("l_partkey", "l_suppkey")
             .agg(F.round(F.min(F.col("l_extendedprice")
                                / F.col("l_quantity")), 6)
                  .alias("unit_cost")))
    best = (costs.groupBy(F.col("l_partkey").alias("b_partkey"))
            .agg(F.min("unit_cost").alias("best_cost")))
    return (
        costs.join(best, (costs.l_partkey == F.col("b_partkey"))
                   & (costs.unit_cost == F.col("best_cost")))
        .select("l_partkey", "l_suppkey", "unit_cost")
    )


# ------------------------------------------------------------------
# q33 — set operations (UNION/INTERSECT/EXCEPT are absent from the
# reference grammar — SURVEY §2.1 non-features — present at this
# engine's DataFrame layer)
@register(
    "q33_set_ops",
    """
    SELECT custkey, src FROM (
      SELECT o_custkey AS custkey, 'both' AS src
      FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey, 'both' FROM orders WHERE o_orderstatus = 'F'
    )
    UNION
    SELECT c_custkey AS custkey, 'no_orders' AS src
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = customer.c_custkey)
    """,
    doc="set ops: INTERSECT of two order populations UNION anti-join",
)
def q33(spark, sf):
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    urgent = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("custkey"),
                      F.lit("both").alias("src")))
    finished = (o.filter(F.col("o_orderstatus") == "F")
                .select(F.col("o_custkey").alias("custkey"),
                        F.lit("both").alias("src")))
    inter = urgent.intersect(finished)
    no_orders = (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
                 .select(F.col("c_custkey").alias("custkey"),
                         F.lit("no_orders").alias("src")))
    return inter.union(no_orders).distinct()


# ------------------------------------------------------------------
# q34 — pivot: line status columns per return flag (portable oracle
# via conditional aggregation — what pivot compiles to)
@register(
    "q34_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity
                          ELSE 0.0 END), 3) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity
                          ELSE 0.0 END), 3) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="pivot (wide conditional aggregation) on line status",
)
def q34(spark, sf):
    li = table(spark, sf, "lineitem")
    out = (li.groupBy("l_returnflag")
           .pivot("l_linestatus", ["O", "F"])
           .agg(F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 3)))
    return out.select("l_returnflag",
                      F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_O"),
                      F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_F"))


# ------------------------------------------------------------------
# q35 — rollup: subtotal hierarchy over (returnflag, linestatus)
@register(
    "q35_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt, round(sum(l_quantity), 3) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="rollup subtotals (grand total + per-flag + per-flag-status)",
)
def q35(spark, sf):
    li = table(spark, sf, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.sum("l_quantity"), 3).alias("sum_qty")))


# ------------------------------------------------------------------
# q26 — approximate aggregates: the 100 TB scale path for distinct
# counts and quantiles (HLL / t-digest; mergeable map-side, bounded
# memory — vs the reference's collect-everything MANY-class buffers).
# Raw approx values are engine-specific, so the gate contract is a
# BOUNDS oracle: the Spark side computes approx AND exact together
# and emits booleans asserting the approximation sits inside the
# algorithms' published error (HLL++ default rsd 5% -> 3 sigma = 15%;
# percentile_approx accuracy=1000 -> rank error 0.1%, checked against
# exact percentiles at 0.5 +/- 0.3% rank). The oracle recomputes the
# exact columns and pins the booleans TRUE — an out-of-bounds sketch
# flips a flag and breaks the hash match.
@register(
    "q26_approx_aggs",
    """
    SELECT l_returnflag,
           count(*) AS cnt,
           count(DISTINCT l_orderkey) AS orders_exact,
           TRUE AS approx_orders_ok,
           TRUE AS approx_med_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++) + percentile_approx (quantile "
        "summary) pinned by a bounds oracle: exact columns compared "
        "value-exact, approx columns asserted within published error",
)
def q26(spark, sf):
    li = table(spark, sf, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("l_orderkey").alias("orders_exact"),
        F.approx_count_distinct("l_orderkey").alias("__approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000)
        .alias("__approx_med"),
        F.expr("percentile(l_extendedprice, 0.497)").alias("__lo"),
        F.expr("percentile(l_extendedprice, 0.503)").alias("__hi"),
    )
    rel_err = (F.abs(F.col("__approx_orders").cast("double")
                     / F.col("orders_exact").cast("double") - 1.0))
    return g.select(
        "l_returnflag", "cnt", "orders_exact",
        (rel_err <= F.lit(0.15)).alias("approx_orders_ok"),
        ((F.col("__approx_med") >= F.col("__lo"))
         & (F.col("__approx_med") <= F.col("__hi")))
        .alias("approx_med_ok"))


# ------------------------------------------------------------------
# q25 — TPC-H Q5 shape: full snowflake join through the hierarchy
# (region→nation→customer→orders→lineitem→supplier with same-nation
# constraint); every dimension broadcast, one fact shuffle.
@register(
    "q25_local_supplier_volume",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: snowflake join w/ same-nation constraint",
)
def q25(spark, sf):
    r = (table(spark, sf, "region")
         .filter(F.col("r_name").isin("ASIA", "EUROPE"))
         .select("r_regionkey"))
    n = table(spark, sf, "nation").select("n_nationkey", "n_name",
                                          "n_regionkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey",
                                             "l_extendedprice", "l_discount")
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n.join(F.broadcast(r),
                                 n.n_regionkey == r.r_regionkey)),
              c.c_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (s.s_nationkey == c.c_nationkey))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
