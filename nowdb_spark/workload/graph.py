"""Graph workload — algorithms over the supplier–part graph derived
from lineitem (suppliers co-supplying parts). Node id space: parts
keep their key, suppliers are offset by 1_000_000 (the two key
domains are disjoint, FIXTURES.md seeding note).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nowdb_spark.operators import graph as G
from nowdb_spark.workload import register, table

_SUPP_OFFSET = 1_000_000


def _cosupply_edges(spark, sf):
    """Supplier pairs sharing at least one part (undirected, a<b).

    Formulated as group-parts→generate-pairs rather than a self-join
    on l_partkey: ONE shuffle total — collect_set dedups suppliers in
    its map-side partial aggregate, so no pre-distinct pass is needed
    (a distinct-then-group plan shuffles the (supplier, part) relation
    twice). The a<b pairs are then emitted from block pairs of each
    part's sorted list (operators.graph.pairs_from_groups); the block
    decomposition spreads a hot part's quadratic pair emission across
    tasks (≤ chunk² pairs per task) instead of one mega-task. The
    ~Σ C(k,2) emitted pair rows before the final count are inherent to
    the exact shared-part semantics (measured: every formulation,
    including the self-join, pays the same emission volume).
    """
    sp = table(spark, sf, "lineitem").select("l_suppkey", "l_partkey")
    pairs = G.pairs_from_groups(sp, "l_partkey", "l_suppkey")
    return (pairs
            .select(F.col("a").alias("supp_a"), F.col("b").alias("supp_b"))
            .groupBy("supp_a", "supp_b")
            .agg(F.count(F.lit(1)).alias("shared_parts")))


@register(
    "g01_cosupply_pairs",
    """
    WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
           count(*) AS shared_parts
    FROM sp a JOIN sp b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    GROUP BY 1, 2
    """,
    doc="co-supply edge construction (shared-part supplier pairs)",
)
def g01(spark, sf):
    return _cosupply_edges(spark, sf)


@register(
    "g02_triangles",
    """
    WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
      FROM sp a JOIN sp b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    )
    SELECT count(*) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
    """,
    doc="global triangle count over the co-supply graph",
)
def g02(spark, sf):
    edges = _cosupply_edges(spark, sf).select(
        F.col("supp_a").alias("src"), F.col("supp_b").alias("dst"))
    return G.triangle_count(edges)


@register(
    "g05_khop_reach",
    """
    WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    hop1 AS (SELECT DISTINCT l_partkey AS node FROM sp WHERE l_suppkey = 1),
    hop2 AS (
      SELECT DISTINCT sp.l_suppkey + 1000000 AS node
      FROM sp JOIN hop1 ON sp.l_partkey = hop1.node
      WHERE sp.l_suppkey <> 1
    )
    SELECT node, 1 AS hops FROM hop1
    UNION ALL
    SELECT node, 2 AS hops FROM hop2
    """,
    doc="2-hop reachability from supplier 1 in the bipartite graph "
        "(frontier-expansion k_hop operator)",
)
def g05(spark, sf):
    li = table(spark, sf, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") + _SUPP_OFFSET).alias("src"),
        F.col("l_partkey").alias("dst")).distinct()
    start = li.sparkSession.createDataFrame([(1 + _SUPP_OFFSET,)],
                                            "node long")
    out = G.k_hop(edges, start, k=2)
    return (out.filter(F.col("hops") > 0)
            .select("node", F.col("hops").cast("int").alias("hops")))


@register(
    "g03_components",
    """
    WITH RECURSIVE
    sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
    sadj AS (SELECT DISTINCT a.s AS u, b.s AS v
             FROM sp a JOIN sp b ON a.p = b.p),
    reach(u, r) AS (
      SELECT u, v FROM sadj
      UNION
      SELECT reach.u, sadj.v FROM reach JOIN sadj ON sadj.u = reach.r
    ),
    comp_s AS (SELECT u AS s, min(r) AS cs FROM reach GROUP BY u),
    part_comp AS (SELECT sp.p, min(cs.cs) AS cs FROM sp
                  JOIN comp_s cs ON cs.s = sp.s GROUP BY sp.p),
    comp_min AS (SELECT cs, min(p) AS mp FROM part_comp GROUP BY cs)
    SELECT p AS node, mp AS component
    FROM part_comp JOIN comp_min USING (cs)
    UNION ALL
    SELECT s + 1000000 AS node, mp AS component
    FROM comp_s JOIN comp_min USING (cs)
    """,
    doc="connected components (large-star/small-star contraction) on "
        "the supplier–part bipartite graph. Oracle: reachability "
        "closure over the SUPPLIER projection (sharing a part ⇒ same "
        "component) — |S| is tiny next to |P|, so the recursive CTE "
        "stays small — then parts inherit their suppliers' component; "
        "the bipartite min node id is always a part id because part "
        "keys sit below the supplier offset",
)
def g03(spark, sf):
    li = table(spark, sf, "lineitem")
    edges = (li.select(
        (F.col("l_suppkey") + _SUPP_OFFSET).alias("src"),
        F.col("l_partkey").alias("dst")).distinct())
    return G.connected_components(edges)


def _pagerank_oracle(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled power iteration (DuckDB disallows aggregates in a
    recursive CTE term); base is spelled (1-d)/n to match the engine's
    float evaluation bit-for-bit before the 6dp round."""
    ctes = ["""
    sp AS MATERIALIZED (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    cp AS MATERIALIZED (SELECT a.l_suppkey AS a, b.l_suppkey AS b
           FROM sp a JOIN sp b ON a.l_partkey = b.l_partkey
                              AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2),
    e AS MATERIALIZED (SELECT a AS src, b AS dst FROM cp
          UNION SELECT b AS src, a AS dst FROM cp),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS MATERIALIZED (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
    r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""
    r{i} AS MATERIALIZED (
      SELECT nd.node,
             (1.0 - {damping}) / (SELECT n FROM nn)
               + {damping} * coalesce(s.inc, 0.0) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS node, sum(r{i - 1}.rank / deg.deg) AS inc
        FROM e JOIN r{i - 1} ON r{i - 1}.node = e.src
               JOIN deg ON deg.node = e.src
        GROUP BY e.dst) s ON s.node = nd.node)""")
    return ("WITH" + ",".join(ctes)
            + f"\n    SELECT node, round(rank, 6) AS rank FROM r{iters}")


@register(
    "g04_pagerank",
    _pagerank_oracle(),
    doc="PageRank (10 power iterations) over the co-supply graph; "
        "oracle = the same fixed-iteration recurrence unrolled as "
        "CTE levels (no dangling mass: every co-supply node has "
        "degree >= 1)",
)
def g04(spark, sf):
    edges = _cosupply_edges(spark, sf).select(
        F.col("supp_a").alias("src"), F.col("supp_b").alias("dst"))
    pr = G.pagerank(G.undirect(edges), iters=10)
    return pr.select("node", F.round("rank", 6).alias("rank"))


def _lpa_oracle(rounds: int = 4) -> str:
    """Unrolled synchronous label propagation (mode of neighbor
    labels, min-label tie-break) — non-recursive CTE levels like the
    pagerank oracle, MATERIALIZED so DuckDB doesn't re-inline the
    whole prefix per reference."""
    ctes = ["""
    sp AS MATERIALIZED (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    cp AS MATERIALIZED (SELECT a.l_suppkey AS a, b.l_suppkey AS b
           FROM sp a JOIN sp b ON a.l_partkey = b.l_partkey
                              AND a.l_suppkey < b.l_suppkey
           GROUP BY 1, 2),
    e AS MATERIALIZED (SELECT a AS src, b AS dst FROM cp
          UNION SELECT b AS src, a AS dst FROM cp),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
    l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""
    l{i} AS MATERIALIZED (
      SELECT n.node, coalesce(w.wlabel, p.label) AS label
      FROM nodes n
      JOIN l{i - 1} p USING (node)
      LEFT JOIN (
        SELECT node, label AS wlabel FROM (
          SELECT e.src AS node, p2.label, count(*) AS c,
                 row_number() OVER (PARTITION BY e.src
                   ORDER BY count(*) DESC, p2.label) AS rn
          FROM e JOIN l{i - 1} p2 ON p2.node = e.dst
          GROUP BY e.src, p2.label)
        WHERE rn = 1) w USING (node))""")
    return ("WITH" + ",".join(ctes)
            + f"\n    SELECT node, label AS community FROM l{rounds}")


@register(
    "g06_label_prop",
    _lpa_oracle(),
    doc="community detection by synchronous label propagation over "
        "the co-supply graph (4 rounds, mode-of-neighbor-labels "
        "with min-label tie-break — fully deterministic); oracle = "
        "the same fixed-round recurrence unrolled as CTE levels, "
        "like the pagerank oracle",
)
def g06(spark, sf):
    edges = _cosupply_edges(spark, sf).select(
        F.col("supp_a").alias("src"), F.col("supp_b").alias("dst"))
    return G.label_propagation(G.undirect(edges), rounds=4)


# ------------------------------------------------------------------
# HyperBall (g07): per-node HLL sketch of the 2-hop ball over the
# co-supply graph — the distributed approximate-neighborhood-function
# algorithm (register-max merges along edges, mergeable state, no
# frontier explosion). The oracle materializes the EXACT 2-hop
# reachability set per node (gate-scale closure) and applies the
# identical md5 register arithmetic, integer-scaled harmonic sum and
# linear-counting branch — value-exact down to the estimate.
def _g07_oracle() -> str:
    from nowdb_spark.operators.sketches import (HLL_ALPHA, HLL_M,
                                                HLL_RANK_BITS,
                                                _hll_register_exprs)

    reg_sql, rank_sql = _hll_register_exprs("w", "duckdb")
    top = HLL_RANK_BITS + 1
    m = HLL_M
    num = repr(HLL_ALPHA * HLL_M * HLL_M * float(1 << top))
    return f"""
    WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
    ed AS (
      SELECT DISTINCT a.l_suppkey AS s, b.l_suppkey AS d
      FROM sp a JOIN sp b
        ON a.l_partkey = b.l_partkey
       AND a.l_suppkey <> b.l_suppkey),
    b1 AS (
      SELECT s AS v, d AS w FROM ed
      UNION SELECT s, s FROM ed),
    ball AS (
      SELECT v, w FROM b1
      UNION SELECT b1.v, ed.d AS w FROM b1 JOIN ed ON b1.w = ed.s),
    regs AS (
      SELECT v, {reg_sql} AS register, MAX({rank_sql}) AS max_rank
      FROM ball GROUP BY 1, 2),
    agg AS (
      SELECT v, COUNT(*) AS n_registers_set,
             CAST(COALESCE(SUM(CAST(pow(2, {top} - max_rank)
                                    AS BIGINT)), 0)
                  + ({m} - COUNT(*)) * {1 << top} AS BIGINT)
               AS s_scaled
      FROM regs GROUP BY v)
    SELECT v AS node,
           CAST(n_registers_set AS BIGINT) AS n_registers_set,
           ROUND(CASE WHEN ({num} / CAST(s_scaled AS DOUBLE))
                           <= {2.5 * m}
                       AND ({m} - n_registers_set) > 0
                 THEN {float(m)}
                      * ln({float(m)}
                           / CAST({m} - n_registers_set AS DOUBLE))
                 ELSE {num} / CAST(s_scaled AS DOUBLE) END, 4)
             AS estimate
    FROM agg
    """


@register(
    "g07_hyperball",
    _g07_oracle(),
    doc="HyperBall approximate neighborhood function: per-node HLL "
        "sketch of the 2-hop ball grown by register-max merges along "
        "edges (one join + one keyed max per round, mergeable state, "
        "per-round lineage cut) — reach/effective-diameter "
        "estimation at graph scale; oracle applies the identical "
        "register arithmetic to the exact closure",
)
def g07(spark, sf):
    edges = _cosupply_edges(spark, sf).select(
        F.col("supp_a").alias("src"), F.col("supp_b").alias("dst"))
    return G.hyperball(edges, rounds=2)


# ------------------------------------------------------------------
# k-core decomposition (g08): fixed-round synchronous peeling over
# the customer CO-PURCHASE graph (customers sharing a part — chosen
# over the co-supply graph, which is complete at gate scale, so
# peeling there is a no-op). k is relative: floor(0.3·(n_nodes−1)),
# which at sf0.01 peels the low-degree tail (~5% of nodes) without
# cascading the whole core away. The oracle unrolls the identical
# recurrence as MATERIALIZED CTE levels (the pagerank/LPA pattern;
# non-materialized CTEs re-inline the prefix exponentially).
def _kcore_oracle(rounds: int = 6, frac: float = 0.3) -> str:
    ctes = ["""
    co AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    cp AS MATERIALIZED (
      SELECT a.c AS a, b.c AS b FROM co a JOIN co b
      ON a.p = b.p AND a.c < b.c GROUP BY 1, 2),
    e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM cp
          UNION SELECT b AS src, a AS dst FROM cp),
    kv AS MATERIALIZED (
      SELECT CAST(floor(""" + repr(frac) + """
                  * (count(DISTINCT src) - 1)) AS BIGINT) AS k
      FROM e0)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""
    d{i} AS MATERIALIZED (SELECT src AS node, count(*) AS deg
                          FROM e{i - 1} GROUP BY 1),
    kp{i} AS MATERIALIZED (SELECT node FROM d{i}, kv
                           WHERE deg >= kv.k),
    e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i - 1} e
      JOIN kp{i} a ON a.node = e.src
      JOIN kp{i} b ON b.node = e.dst)""")
    return ("WITH" + ",".join(ctes) + f"""
    SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
    FROM e{rounds} GROUP BY 1""")


@register(
    "g08_kcore",
    _kcore_oracle(),
    doc="k-core decomposition by fixed-round synchronous peeling "
        "(drop nodes with degree < k in the current subgraph, "
        "repeat) over the customer co-purchase graph, k = "
        "floor(0.3·(n−1)) — dense-subgraph mining's workhorse; per "
        "round one degree aggregate + two semi-joins, lineage cut "
        "per round, oracle = the recurrence unrolled as CTE levels",
)
def g08(spark, sf):
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    od = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    co = (od.join(li, od.o_orderkey == li.l_orderkey)
          .select("o_custkey", "l_partkey"))
    pairs = G.pairs_from_groups(co, "l_partkey", "o_custkey")
    edges = (pairs.select(F.col("a").alias("src"),
                          F.col("b").alias("dst"))
             .distinct())
    return G.k_core(G.undirect(edges), k_frac=0.3, rounds=6)
