"""Dialect workload — queries that run through the full nowdb SQL
front-end (lexer → parser → binder → DataFrame) against the testdata
tables mounted as contexts, each checked against a DuckDB oracle.

This puts the SQL dialect itself under the correctness gate: the
oracle SQL is standard ANSI; the engine side is the nowdb dialect
(note `^` for pow, int `/` → float, string time literals against the
ns stamp, select-list aliases).
"""

from __future__ import annotations

import tempfile

from nowdb_spark.engine import Engine
from nowdb_spark.workload import register

_ENGINES: dict = {}


def _engine(spark, sf) -> Engine:
    key = (id(spark), sf)
    eng = _ENGINES.get(key)
    if eng is None:
        base = tempfile.mkdtemp(prefix="nowdb_dialect_")
        eng = Engine(spark, base)
        eng.rexecute("create scope mountdb")
        eng.rexecute("use mountdb")
        for t in ("lineitem", "orders", "part", "events", "customer"):
            eng.scope.mount(t, f"{sf}/{t}.parquet",
                            types={"ts": "time"} if t == "events" else None)
        # deterministic functional graph for the WHILE-traversal gate:
        # one edge per customer, c -> (c % 1499) + 1 (a long cycle —
        # every node has out-degree 1, so the nq20 oracle's recursive
        # CTE replays the walk without visited-set bookkeeping)
        eng.rexecute("create type wnode (nid uint pk)")
        eng.rexecute("insert into wnode (nid) "
                     "select c_custkey from customer")
        eng.rexecute("create edge wref (origin wnode origin, "
                     "destin wnode destin)")
        eng.rexecute("insert into wref (origin, destin) "
                     "select c_custkey, c_custkey % 1499 + 1 "
                     "from customer")
        _ENGINES[key] = eng
    return eng


def _dialect(name: str, nowdb_sql: str, oracle: str, doc: str = ""):
    @register(name, oracle, doc=doc)
    def run(spark, sf, _sql=nowdb_sql):
        return _engine(spark, sf).sql(_sql)
    return run


_dialect(
    "nq01_dialect_group_agg",
    """
    select l_returnflag, count(*) as cnt,
           round(sum(l_quantity), 3) as sum_qty,
           round(avg(l_discount), 6) as avg_disc,
           round(spread(l_extendedprice), 4) as spr
    from lineitem group by l_returnflag
    """,
    """
    SELECT l_returnflag, count(*) AS cnt,
           round(sum(l_quantity), 3) AS sum_qty,
           round(avg(l_discount), 6) AS avg_disc,
           round(max(l_extendedprice) - min(l_extendedprice), 4) AS spr
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="dialect: GROUP BY + aggregate battery incl. spread()",
)

_dialect(
    "nq02_dialect_formulas",
    """
    select p_partkey,
           round(((p_retailprice + 5.0) / 2.0) ^ 2, 6) as f_pow,
           p_size % 7 as f_mod, p_size / 4 as f_div,
           round(p_retailprice) as f_round
    from part where p_size > 10
    """,
    """
    SELECT p_partkey,
           round(pow((p_retailprice + 5.0) / 2.0, 2), 6) AS f_pow,
           p_size % 7 AS f_mod,
           CAST(p_size AS DOUBLE) / 4 AS f_div,
           round(p_retailprice) AS f_round
    FROM part WHERE p_size > 10
    """,
    doc="dialect: ^ pow, % rem, int / -> float, 1- and 2-arg round",
)

_dialect(
    "nq03_dialect_case_in",
    """
    select o_orderkey,
           case when o_totalprice < 50000.0 then 'small'
                when o_totalprice < 200000.0 then 'mid'
                else 'big' end as size_cls
    from orders
    where o_orderpriority in ('1-URGENT', '2-HIGH') and o_orderstatus = 'F'
    """,
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000.0 THEN 'small'
                WHEN o_totalprice < 200000.0 THEN 'mid'
                ELSE 'big' END AS size_cls
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
    """,
    doc="dialect: CASE WHEN + IN-list + conjunction",
)

_dialect(
    "nq04_dialect_time_range",
    """
    select event_id, user_id, year(ts) as y, month(ts) as m,
           mday(ts) as d, hour(ts) as h
    from events
    where ts >= '2024-01-05' and ts < '2024-01-07'
    """,
    """
    SELECT event_id, user_id,
           CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
           CAST(dayofmonth(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-07'
    """,
    doc="dialect: ISO time literals against the ns stamp + extractors",
)

_dialect(
    "nq06_dialect_null_coalesce",
    """
    select event_id,
           coalesce(case when value > 150.0 then 'high' end, 'low') as band,
           case when value > 150.0 then value end is null as is_low
    from events where user_id < 30
    """,
    """
    SELECT event_id,
           coalesce(CASE WHEN value > 150.0 THEN 'high' END, 'low') AS band,
           (CASE WHEN value > 150.0 THEN value END) IS NULL AS is_low
    FROM events WHERE user_id < 30
    """,
    doc="dialect: CASE without ELSE -> NULL, IS NULL, coalesce",
)

_dialect(
    "nq07_dialect_many_aggs",
    """
    select event_type,
           round(median(value), 6) as med,
           round(stddev(value), 6) as sd,
           round(min(value) + spread(value), 4) as mx
    from events group by event_type
    """,
    """
    SELECT event_type,
           round(median(value), 6) AS med,
           round(stddev_samp(value), 6) AS sd,
           round(min(value) + (max(value) - min(value)), 4) AS mx
    FROM events GROUP BY event_type
    """,
    doc="dialect: MANY-class aggregates (median/stddev) + agg arithmetic",
)

_dialect(
    "nq08_dialect_window",
    """
    select l_orderkey, l_linenumber,
           row_number() over (partition by l_orderkey
                              order by l_linenumber) as rn,
           sum(l_quantity) over (partition by l_orderkey
                                 order by l_linenumber) as run_qty,
           lag(l_quantity, 1, 0.0) over (partition by l_orderkey
                                         order by l_linenumber) as prev_qty,
           count(*) over (partition by l_orderkey) as cnt_lines
    from lineitem where l_orderkey < 1000
    """,
    """
    SELECT l_orderkey, l_linenumber,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber) AS rn,
           sum(l_quantity) OVER (PARTITION BY l_orderkey
                                 ORDER BY l_linenumber) AS run_qty,
           lag(l_quantity, 1, 0.0) OVER (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber) AS prev_qty,
           CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS cnt_lines
    FROM lineitem WHERE l_orderkey < 1000
    """,
    doc="dialect: OVER extension — row_number/running sum/lag/"
        "partition count (running sum kept exact: integral quantities)",
)

_dialect(
    "nq09_dialect_window_frames",
    """
    select p_brand, p_partkey,
           rank() over (partition by p_brand
                        order by p_size desc, p_partkey) as rk,
           dense_rank() over (partition by p_brand order by p_size desc)
               as drk,
           max(p_retailprice) over (partition by p_brand
               rows between unbounded preceding and unbounded following)
               as mx_price
    from part where p_size >= 40
    """,
    """
    SELECT p_brand, p_partkey,
           CAST(rank() OVER (PARTITION BY p_brand
                             ORDER BY p_size DESC, p_partkey) AS INT)
               AS rk,
           CAST(dense_rank() OVER (PARTITION BY p_brand
                                   ORDER BY p_size DESC) AS INT) AS drk,
           max(p_retailprice) OVER (PARTITION BY p_brand
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS mx_price
    FROM part WHERE p_size >= 40
    """,
    doc="dialect: OVER with DESC ordering, rank/dense_rank, explicit "
        "unbounded ROWS frame",
)

_dialect(
    "nq10_dialect_subqueries",
    """
    select o_orderkey, o_totalprice
    from orders
    where o_custkey in (select c_custkey from customer
                        where c_mktsegment = 'BUILDING')
      and o_totalprice > (select max(o_totalprice) from orders) * 0.5
    """,
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
    """,
    doc="dialect: IN (SELECT) semi-join + uncorrelated scalar subquery "
        "(threshold kept exact via max, not avg, for cross-engine "
        "float stability)",
)

_dialect(
    "nq11_dialect_setops",
    """
    select c_custkey from customer where c_mktsegment = 'BUILDING'
    union select c_custkey from customer where c_acctbal > 8000.0
    except select c_custkey from customer where c_acctbal < 500.0
    """,
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION SELECT c_custkey FROM customer WHERE c_acctbal > 8000.0
    EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal < 500.0
    """,
    doc="dialect: UNION/EXCEPT chain (left-associative in both "
        "engines; INTERSECT kept un-mixed — DuckDB gives it higher "
        "precedence)",
)

_dialect(
    "nq12_dialect_exists",
    """
    select c_custkey, c_mktsegment from customer
    where exists (select 1 from orders
                  where customer.c_custkey = o_custkey
                    and o_totalprice > 200000.0)
      and c_acctbal > 0.0
    """,
    """
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE customer.c_custkey = o_custkey
                    AND o_totalprice > 200000.0)
      AND c_acctbal > 0.0
    """,
    doc="dialect: correlated EXISTS -> semi join on the correlation "
        "equality, residual predicate filters the subquery side",
)

_dialect(
    "nq13_dialect_group_expr",
    """
    select year(ts) as y, mday(ts) as d, count(*) as n,
           round(sum(value), 4) as total
    from events group by year(ts), mday(ts)
    """,
    """
    SELECT CAST(year(ts) AS INT) AS y, CAST(dayofmonth(ts) AS INT) AS d,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY year(ts), dayofmonth(ts)
    """,
    doc="dialect: GROUP BY expressions (time extractions) — extension "
        "over the reference's field-only group lists",
)

_dialect(
    "nq14_dialect_qualify",
    """
    select l_orderkey, l_linenumber, l_quantity,
           row_number() over (partition by l_orderkey
                              order by l_quantity desc, l_linenumber)
               as rn
    from lineitem where l_orderkey < 2000
    qualify rn <= 2
    """,
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_quantity DESC, l_linenumber)
               AS rn
    FROM lineitem WHERE l_orderkey < 2000
    QUALIFY rn <= 2
    """,
    doc="dialect: QUALIFY (post-window filter) — top-2 lines per "
        "order by quantity in one statement",
)

_dialect(
    "nq15_dialect_bucket_rollup",
    """
    select bucket(ts, 21600000000000) as b, count(*) as n,
           round(sum(value), 4) as total
    from events group by bucket(ts, 21600000000000)
    order by count(*) desc, b
    """,
    """
    SELECT epoch_ns(ts) - (epoch_ns(ts) % 21600000000000) AS b,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY 1
    ORDER BY count(*) DESC, b
    """,
    doc="dialect: bucket() time rollup through GROUP BY/ORDER BY "
        "expressions (6h buckets, exact i64 floor)",
)

_dialect(
    "nq16_dialect_general_join",
    """
    select o.o_orderpriority as pri, count(*) as cnt,
           round(sum(l_extendedprice), 2) as rev
    from lineitem join orders as o on l_orderkey = o.o_orderkey
    where o.o_orderstatus = 'F'
    group by o.o_orderpriority
    """,
    """
    SELECT o.o_orderpriority AS pri, count(*) AS cnt,
           round(sum(l_extendedprice), 2) AS rev
    FROM lineitem JOIN orders AS o ON l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    doc="dialect: general equi-JOIN (extension over the reference's "
        "edge-only join) — fact-fact join, strategy left to AQE",
)

_dialect(
    "nq17_dialect_derived_join",
    """
    select big.seg as seg, count(*) as cnt
    from orders join (select c_custkey, c_mktsegment as seg
                      from customer where c_acctbal > 5000.0) as big
         on o_custkey = big.c_custkey
    group by big.seg
    """,
    """
    SELECT big.seg AS seg, count(*) AS cnt
    FROM orders JOIN (SELECT c_custkey, c_mktsegment AS seg
                      FROM customer WHERE c_acctbal > 5000.0) AS big
         ON o_custkey = big.c_custkey
    GROUP BY big.seg
    """,
    doc="dialect: derived-table join target (extension) — the "
        "subquery prunes columns+rows before the join",
)

_dialect(
    "nq05_dialect_order_limit",
    """
    select c_custkey, c_acctbal from customer
    where c_mktsegment = 'BUILDING' and c_acctbal > 0.0
    order by c_acctbal, c_custkey limit 20
    """,
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0.0
    ORDER BY c_acctbal, c_custkey LIMIT 20
    """,
    doc="dialect: ORDER BY (ascending, reference-style) + LIMIT",
)

_dialect(
    "nq18_dialect_sessionize",
    """
    select user_id, count(*) as n_events,
           1 + sum(case when gap_ns > 1800000000000 then 1 else 0 end)
               as n_sessions
    from (
      select user_id, ts,
             ts - lag(ts) over (partition by user_id
                                order by ts, event_id) as gap_ns
      from events
    ) group by user_id
    """,
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(1 + sum(CASE WHEN gap_ns > 1800000000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
    FROM (
      SELECT user_id, ts,
             epoch_ns(ts) - epoch_ns(lag(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ns
      FROM events
    ) GROUP BY user_id
    """,
    doc="dialect: sessionization reachable from the SQL front-end — "
        "lag window in a derived table + gap>30min conditional count "
        "(q22's operator through parser→binder)",
)

_dialect(
    "nq19_dialect_asof",
    """
    select event_id, user_id,
           ts as purchase_ns, last_view_ns
    from (
      select event_id, user_id, ts, event_type,
             max(case when event_type = 'view' then ts end) over (
               partition by user_id order by ts, event_id
               rows between unbounded preceding and 1 preceding
             ) as last_view_ns
      from events
    ) where event_type = 'purchase'
    """,
    """
    SELECT event_id, user_id,
           epoch_ns(ts) AS purchase_ns,
           epoch_ns(last_view_ts) AS last_view_ns
    FROM (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS last_view_ts
      FROM events
    ) WHERE event_type = 'purchase'
    """,
    doc="dialect: as-of join reachable from the SQL front-end — "
        "running max over the ordered per-user stream, framed window "
        "(q23's operator through parser→binder; ns presentation — "
        "both sides derive from the same µs-encoded parquet)",
)


_dialect(
    "nq20_dialect_while",
    """
    select origin, destin, depth from wref
    where origin = 1 while destin != 10 depth 20
    """,
    """
    WITH RECURSIVE edges AS (
      SELECT c_custkey AS o, c_custkey % 1499 + 1 AS d FROM customer
    ),
    walk(o, d, depth) AS (
      SELECT o, d, 0 FROM edges WHERE o = 1
      UNION ALL
      SELECT e.o, e.d, w.depth + 1
      FROM walk w JOIN edges e ON e.o = w.d
      WHERE w.d <> 10 AND w.depth < 20
    )
    SELECT CAST(o AS BIGINT) AS origin, CAST(d AS BIGINT) AS destin,
           CAST(depth AS BIGINT) AS depth
    FROM walk
    """,
    doc="dialect: WHILE traversal (the reference's designed-only "
        "recursive edge-following, sql.tex:2518-2554) — walk the "
        "functional customer graph from node 1 until an edge reaches "
        "10; oracle replays the walk as a recursive CTE",
)

_dialect(
    "nq21_dialect_rollup",
    """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 3) as sum_qty,
           count(*) as n,
           grouping(l_returnflag) as g_rf,
           grouping_id() as gid
    from lineitem
    group by rollup (l_returnflag, l_linestatus)
    """,
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 3) AS sum_qty,
           COUNT(*) AS n,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_returnflag, l_linestatus) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="dialect: GROUP BY ROLLUP with grouping()/grouping_id() "
        "super-aggregate indicators (extension; strict mode rejects "
        "— the reference grammar has flat GROUP BY only)",
)

_dialect(
    "nq22_dialect_grouping_sets",
    """
    select l_returnflag, l_linestatus, count(*) as n,
           round(sum(l_extendedprice), 2) as rev
    from lineitem
    group by grouping sets ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 2) AS rev
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    """,
    doc="dialect: GROUPING SETS incl. the grand-total set — "
        "equivalent to CUBE here, one Expand + one shuffle in Spark",
)

_dialect(
    "nq23_dialect_pivot",
    """
    select l_returnflag, round(F, 3) as f_qty, round(O, 3) as o_qty
    from (select l_returnflag, l_linestatus, l_quantity from lineitem)
    pivot (sum(l_quantity) for l_linestatus in ('F', 'O'))
    """,
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F'
                          THEN l_quantity END), 3) AS f_qty,
           ROUND(SUM(CASE WHEN l_linestatus = 'O'
                          THEN l_quantity END), 3) AS o_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="dialect: FROM ... PIVOT (explicit value list -> single hash "
        "agg, one shuffle, no distinct pre-scan); oracle is the "
        "portable conditional-aggregation rewrite",
)

_dialect(
    "nq24_dialect_unpivot",
    """
    select p_partkey, attr, val
    from (select p_partkey, p_size, p_retailprice from part)
    unpivot (val for attr in (p_size, p_retailprice))
    """,
    """
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
    doc="dialect: FROM ... UNPIVOT (Spark melt — zero shuffle); "
        "oracle is the UNION ALL rewrite",
)

_dialect(
    "nq25_dialect_asof_join",
    """
    select p.event_id, p.user_id, round(v.value, 4) as view_value
    from (select event_id, user_id, ts from events
          where event_type = 'purchase') as p
    asof join (select user_id, ts, value from events
               where event_type = 'view') as v
      on p.user_id = v.user_id and p.ts >= v.ts
    """,
    """
    SELECT p.event_id, p.user_id, ROUND(v.value, 4) AS view_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    doc="dialect: ASOF JOIN syntax bound onto the union-window merge "
        "(one key shuffle, no range explosion) — oracle is DuckDB's "
        "NATIVE ASOF LEFT JOIN, matched rows identified by value",
)

_dialect(
    "nq26_dialect_range_frame",
    """
    select event_id, user_id,
           round(sum(value) over (partition by user_id order by ts
                 range between 3600000000000 preceding and current row),
                 4) as hr_sum
    from events
    """,
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
                 PARTITION BY user_id ORDER BY epoch_ns(ts)
                 RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW),
                 4) AS hr_sum
    FROM events
    """,
    doc="dialect: RANGE (value-offset) window frame over the ns stamp "
        "— trailing-hour moving sum; peers at equal stamps share the "
        "frame per the SQL standard on both engines",
)
