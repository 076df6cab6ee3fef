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
    on l_partkey: one shuffle to collect each part's (sorted, distinct)
    supplier list, then the a<b pairs are emitted map-side from the
    list. The self-join formulation shuffles the full (supplier, part)
    relation twice and probes |sp|² candidates; this shuffles it once
    and the quadratic work is confined to per-part list size (bound or
    salt hot parts at 100 TB).
    """
    sp = (table(spark, sf, "lineitem")
          .select("l_suppkey", "l_partkey").distinct())
    per_part = sp.groupBy("l_partkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("supps"))
    idx = F.explode(F.sequence(F.lit(0), F.size("supps") - 2)).alias("i")
    pairs = (
        per_part.filter(F.size("supps") >= 2)
        .select("supps", idx)
        .select(
            F.element_at("supps", F.col("i") + 1).alias("supp_a"),
            F.explode(F.slice("supps", F.col("i") + 2,
                              F.size("supps"))).alias("supp_b"),
        )
    )
    return pairs.groupBy("supp_a", "supp_b").agg(
        F.count(F.lit(1)).alias("shared_parts"))


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
    None,  # iterative — verified by union-find differential pytest
    doc="connected components (min-label propagation) on the "
        "supplier–part bipartite graph",
)
def g03(spark, sf):
    li = table(spark, sf, "lineitem")
    edges = (li.select(
        (F.col("l_suppkey") + _SUPP_OFFSET).alias("src"),
        F.col("l_partkey").alias("dst")).distinct())
    return G.connected_components(edges, max_iter=10)


@register(
    "g04_pagerank",
    None,  # iterative — verified by python power-iteration pytest
    doc="PageRank (10 power iterations) over the co-supply graph",
)
def g04(spark, sf):
    edges = _cosupply_edges(spark, sf).select(
        F.col("supp_a").alias("src"), F.col("supp_b").alias("dst"))
    pr = G.pagerank(G.undirect(edges), iters=10)
    return pr.select("node", F.round("rank", 6).alias("rank"))
