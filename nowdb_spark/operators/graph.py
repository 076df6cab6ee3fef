"""Graph operators over edge DataFrames (src, dst).

The reference is "graph-oriented" in its data model (vertex types +
edges with origin/destin roles, model/types.h:90-99) but implements no
graph algorithms — traversal (WHILE) is a designed-only feature
(doc/manual/sql.tex:2518-2554). This module supplies the graph layer
the north star asks for, DataFrame-native (GraphFrames is not in the
container; all algorithms below are join/groupBy compositions that
scale through the shuffle machinery, no driver-side adjacency).

Scale notes:
  degrees / k_hop / triangles — pure joins + aggs; broadcast the
      frontier when it is small, shuffle otherwise (AQE decides).
  connected_components — iterative min-label propagation; lineage cut
      with localCheckpoint every iteration (otherwise plans grow
      exponentially); convergence checked with a cheap agg per round.
  pagerank — power iteration over a degree-annotated edge list; the
      edge list is re-used across iterations (cache), ranks are the
      only moving frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree, degree)."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (out_d.join(in_d, "node", "full_outer")
            .fillna(0, ["out_degree", "in_degree"])
            .withColumn("degree", F.col("out_degree") + F.col("in_degree")))


def undirect(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrize an edge list (both directions, deduped)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.union(rev).distinct()


def k_hop(edges: DataFrame, start_nodes: DataFrame, k: int,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """Nodes reachable within ≤ k hops from start_nodes (column `node`).

    Frontier expansion by join per hop; visited set accumulated by
    union+distinct. k is typically small (the reference's designed
    WHILE traversal is bounded the same way)."""
    und = undirect(edges, src, dst)
    visited = start_nodes.select(F.col("node"), F.lit(0).alias("hops"))
    frontier = visited
    for i in range(1, k + 1):
        nxt = (und.join(frontier.hint("broadcast"),
                        und.src == frontier.node)
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(i)))
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Global triangle count over the undirected simple graph.

    Canonical orientation (a<b) + two joins — the standard distributed
    formulation; with degree-ordered orientation the heavy-hitter
    explosion is bounded."""
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b")))
    canon = (e.select(F.least("a", "b").alias("a"),
                      F.greatest("a", "b").alias("b"))
             .distinct())
    e1 = canon.alias("e1")
    e2 = canon.alias("e2")
    e3 = canon.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(e3, (F.col("e1.a") == F.col("e3.a"))
              & (F.col("e2.b") == F.col("e3.b")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tri


def connected_components(edges: DataFrame, max_iter: int = 20,
                         src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, component) via min-label propagation to fixpoint.

    Each round: label(v) ← min(label(v), min(label(u) for u~v)).
    Rounds needed ≈ graph diameter (use alternating large-star/small-
    star for adversarial diameters). Lineage is cut every round."""
    und = undirect(edges, src, dst).cache()
    labels = (und.select("src").union(und.select("dst"))
              .distinct()
              .select(F.col("src").alias("node"),
                      F.col("src").alias("component")))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (und.join(labels, und.dst == labels.node)
                        .groupBy(und.src.alias("node"))
                        .agg(F.min("component").alias("nmin")))
        new_labels = (labels.join(neighbor_min, "node", "left")
                      .select(F.col("node"),
                              F.least("component", "nmin").alias("component")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.component") != F.col("o.component"))
                   .isEmpty())
        labels = new_labels
        if changed:
            break
    return labels


def pagerank(edges: DataFrame, iters: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, rank) by power iteration (fixed iterations, dangling
    mass redistributed uniformly — the classic formulation)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).cache()
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))).distinct().cache()
    n_nodes = nodes.count()
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contribs = (e.join(ranks, e.src == ranks.node)
                    .join(out_deg, ranks.node == out_deg.node)
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("deg")).alias("c")))
        # dangling nodes contribute their mass uniformly
        dangling = (ranks.join(out_deg, "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .first()[0])
        incoming = contribs.groupBy("node").agg(F.sum("c").alias("inc"))
        ranks = (nodes.join(incoming, "node", "left")
                 .select(F.col("node"),
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("inc"), F.lit(0.0))
                             + F.lit(dangling / n_nodes))).alias("rank")))
        ranks = ranks.localCheckpoint(eager=True)
    return ranks
