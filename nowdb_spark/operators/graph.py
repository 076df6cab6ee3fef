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

import math
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pairs_from_groups(df: DataFrame, key: str, member: str,
                      chunk: int = 4096) -> DataFrame:
    """All a<b member pairs within each key group — hot-key safe, and
    partitioned by `a` on output so a following groupBy on (a, b)
    needs NO exchange.

    Every consumer of this operator aggregates the emitted pairs by
    (a, b) (shared-part counts, shingle intersections). The r5-r13
    shape spread block pairs by (key, bi, bj) and let the final
    aggregate shuffle the quadratic pair rows: copies of the same
    (a, b) pair come from DIFFERENT keys, so they landed on different
    tasks and the partial aggregate barely reduced (8.7M -> 7.7M rows
    at sf0.1) — ~58 MB of pair rows crossed the final exchange
    (guide §2.3/§2.4, r13 VERDICT item 1).

    This shape instead emits one row per (member a, tail-chunk) —
    `a` paired with every later member of its key's sorted set, the
    tail cut into `chunk`-sized slices — and hash-repartitions THOSE
    rows by `a` before exploding pairs. Consequences:
      - the quadratic pair volume crosses the wire once, packed as
        tail arrays (~31.6 MB vs 57.8+3.0 MB at sf0.1 — 1.8x fewer
        shuffle bytes, and 0.6M rows instead of 7.7M);
      - hashpartitioning(a) satisfies ClusteredDistribution(a, b)
        (partitioning expressions are a subset of the grouping keys),
        so the downstream groupBy(a, b) aggregates in place: one whole
        exchange removed (3 -> 2), measured 1.9 -> 1.35 s on g01;
      - hot-key safety: a hot key's quadratic emission is spread over
        its |members| distinct `a` values (each task explodes only its
        own a's tails, <= chunk partners per row), instead of over
        block pairs. The skew unit becomes a hot MEMBER (one `a` in
        very many keys), the same unit the downstream (a, b) aggregate
        already has.
    """
    per = (df.groupBy(key)
           .agg(F.sort_array(F.collect_set(member)).alias("ms"))
           .filter(F.size("ms") >= 2))
    pos, keep_nonlast, tail = _tail_chunk_exprs(chunk)
    rows = (per.select(key, "ms", pos)
            .where(keep_nonlast)
            .select(key, "a", tail))
    return (rows.repartition(F.col("a"))
            .select(key, "a", F.explode("tail").alias("b")))


@lru_cache(maxsize=16)
def _tail_chunk_exprs(chunk: int):
    """Constant (per chunk size) emission expression templates, built
    once per process (a few dozen py4j round-trips per plan build —
    guide §7.3). Member at sorted position i pairs with every later
    member (a<b by the sort); slicing tails into `chunk`-sized pieces
    bounds both the exchange record size and the per-row explode."""
    pos = F.posexplode("ms").alias("i", "a")
    keep_nonlast = F.col("i") + 1 < F.size("ms")
    n_chunks_last = F.floor(
        (F.size("ms") - F.col("i") - 2) / F.lit(chunk)).cast("int")
    tail = F.explode(F.transform(
        F.sequence(F.lit(0), n_chunks_last),
        lambda c: F.slice("ms", F.col("i") + 2 + c * chunk, chunk))
    ).alias("tail")
    return pos, keep_nonlast, tail


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
    """Symmetrize an edge list (both directions, deduped).

    Single-pass: each row explodes into its two orientations — a
    fwd ∪ rev union would execute the (possibly expensive) edges
    subtree twice."""
    both = F.explode(F.array(
        F.struct(F.col(src).alias("src"), F.col(dst).alias("dst")),
        F.struct(F.col(dst).alias("src"), F.col(src).alias("dst"))))
    return (edges.select(both.alias("e"))
            .select("e.src", "e.dst").distinct())


def k_hop(edges: DataFrame, start_nodes: DataFrame, k: int,
          src: str = "src", dst: str = "dst") -> DataFrame:
    """Nodes reachable within ≤ k hops from start_nodes (column `node`).

    Frontier expansion by join per hop; visited set accumulated by
    union+distinct. k is typically small (the reference's designed
    WHILE traversal is bounded the same way)."""
    # materialize once — every hop joins against it; without the cut
    # each hop job would recompute the edges subtree
    und = undirect(edges, src, dst).localCheckpoint(eager=True)
    visited = start_nodes.select(F.col("node"), F.lit(0).alias("hops"))
    frontier = visited
    for i in range(1, k + 1):
        # checkpoint BEFORE the emptiness probe: the probe and the
        # union then both read the materialized frontier instead of
        # recomputing the hop join twice
        nxt = (und.join(frontier.hint("broadcast"),
                        und.src == frontier.node)
               .select(F.col("dst").alias("node"))
               .distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(i))
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        visited = visited.union(nxt)
        frontier = nxt
    return visited


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Global triangle count over the undirected simple graph.

    Degree-ordered orientation + two joins — the standard distributed
    formulation (Suri & Vassilvitskii, "Counting Triangles and the
    Curse of the Last Reducer"). Each undirected edge is oriented from
    its lower-rank endpoint to its higher-rank endpoint under the total
    order (degree, id); out-degree is then bounded by O(√m), so the
    wedge join e1.b == e2.a emits at most Σ in(u)·out(u) = O(m^1.5)
    rows and no single hub key can explode — orienting by raw id
    (the naive a<b) lets a small-id hub own all its edges as `a` and
    emit O(deg²) wedges from one key."""
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .filter(F.col("a") != F.col("b")))
    undirected = (e.select(F.least("a", "b").alias("a"),
                           F.greatest("a", "b").alias("b"))
                  .distinct()
                  # referenced by the degree agg AND both endpoint
                  # joins; cut the lineage so the (possibly expensive)
                  # edge subtree executes once
                  .localCheckpoint(eager=True))
    deg = (undirected
           .select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da, db = deg.alias("da"), deg.alias("db")
    a_first = (F.col("da.deg") < F.col("db.deg")) | (
        (F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b")))
    canon = (undirected
             .join(da, F.col("a") == F.col("da.node"))
             .join(db, F.col("b") == F.col("db.node"))
             .select(F.when(a_first, F.col("a")).otherwise(F.col("b"))
                     .alias("a"),
                     F.when(a_first, F.col("b")).otherwise(F.col("a"))
                     .alias("b"))
             # referenced three times by the triangle query
             .localCheckpoint(eager=True))
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


def _canon_edges(e: DataFrame) -> DataFrame:
    """Undirected canonical form: a < b, no self-loops, deduped."""
    return (e.filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("a"),
                    F.greatest("a", "b").alias("b"))
            .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """large-star(u): connect every neighbor v > u to
    m = min(Γ(u) ∪ {u})  (Kiveris et al., "Connected Components in
    MapReduce and Beyond")."""
    sym = e.select("a", "b").union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mn = sym.groupBy("a").agg(F.min("b").alias("mn"))
    return _canon_edges(
        sym.join(mn, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"),
                F.least("mn", "a").alias("b")))


def _small_star(e: DataFrame) -> DataFrame:
    """small-star(u): orient edges to the larger endpoint; connect all
    smaller neighbors and u itself to m = min of the smaller set."""
    mn = e.groupBy("b").agg(F.min("a").alias("m"))
    withm = e.join(mn, "b")
    nbr = withm.select(F.col("a").alias("a"), F.col("m").alias("b"))
    own = mn.select(F.col("b").alias("a"), F.col("m").alias("b"))
    return _canon_edges(nbr.union(own))


def star_components(edges: DataFrame, max_iter: int = 30,
                    src: str = "src", dst: str = "dst"
                    ) -> tuple[DataFrame, int]:
    """(labels, rounds): alternating large-star/small-star contraction.

    Converges in O(log² n) rounds (O(log n) in practice) regardless of
    graph diameter — the scale-safe path that min-label propagation
    (O(diameter) rounds, one full shuffle each) is not on chain-shaped
    graphs. At fixpoint the edge set is a star per component rooted at
    the component's minimum node id."""
    # materialize the projected edge list once — canon and the node
    # set both derive from it (an expensive upstream, e.g. a near-dup
    # pair generator, must not execute twice)
    raw = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .localCheckpoint(eager=True))
    e = _canon_edges(raw).localCheckpoint(eager=True)
    nodes = (raw.select(F.explode(F.array("a", "b")).alias("node"))
             .distinct())
    sig_prev = None
    rounds = 0
    for _ in range(max_iter):
        # checkpoint between the stars: _small_star references its
        # input three times (groupBy min, join, own-edges) — without
        # the cut the whole large-star subtree executes three times
        e = _large_star(e).localCheckpoint(eager=True)
        e = _small_star(e).localCheckpoint(eager=True)
        rounds += 1
        sig = e.agg(F.count(F.lit(1)),
                    F.coalesce(F.sum(F.xxhash64("a", "b")
                                     .cast("decimal(38,0)")),
                               F.lit(0))).first()
        sig = (sig[0], sig[1])
        if sig == sig_prev:
            break
        sig_prev = sig
    sym = e.select("a", "b").union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    lab = (sym.groupBy(F.col("a").alias("node"))
           .agg(F.min("b").alias("mn"))
           .select("node", F.least("mn", "node").alias("component")))
    labels = (nodes.join(lab, "node", "left")
              .select("node", F.coalesce("component", "node")
                      .alias("component")))
    return labels, rounds


def connected_components(edges: DataFrame, max_iter: int = 30,
                         src: str = "src", dst: str = "dst",
                         algorithm: str = "star") -> DataFrame:
    """(node, component): component = min node id reachable.

    algorithm='star' (default): alternating large-star/small-star —
    O(log n)-ish rounds independent of diameter; the 100 TB path.
    algorithm='label': min-label propagation — one round per diameter
    step; kept as the fast path for known-tiny diameters (near-dup
    clusters are dense blobs, 2-3 rounds)."""
    if algorithm == "star":
        labels, _ = star_components(edges, max_iter, src, dst)
        return labels
    assert algorithm == "label", algorithm
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
    # localCheckpoint, not cache: a cut lineage keeps every
    # iteration's analyzed plan O(1) — with cache() the (possibly
    # huge) edge-derivation subtree is re-analyzed and re-printed
    # into each round's plan even though execution reuses the cache
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
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
        # dangling nodes contribute their mass uniformly — folded into
        # the plan as a broadcast one-row aggregate instead of a
        # driver-side action per iteration (one job per round, not two)
        dangling = (ranks.join(out_deg, "node", "left_anti")
                    .agg((F.coalesce(F.sum("rank"), F.lit(0.0))
                          / n_nodes).alias("dng")))
        incoming = contribs.groupBy("node").agg(F.sum("c").alias("inc"))
        ranks = (nodes.join(incoming, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select(F.col("node"),
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("inc"), F.lit(0.0))
                             + F.col("dng"))).alias("rank")))
        ranks = ranks.localCheckpoint(eager=True)
    return ranks


def label_propagation(edges: DataFrame, rounds: int = 4,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, community) by synchronous label propagation: every
    round each node adopts the most frequent label among its
    neighbors, ties broken by the smallest label — fully
    deterministic, so a fixed-round unrolled SQL oracle replays it
    exactly. Per round: one join + one count aggregate + one
    row_number window (all keyed shuffles), lineage cut per round
    like pagerank. Pass an undirected edge set (see undirect)."""
    e = (edges.select(F.col(src).alias("src"),
                      F.col(dst).alias("dst"))
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node")).distinct()
             .localCheckpoint(eager=True))
    labels = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.desc("c"),
                                           F.asc("label"))
    for _ in range(rounds):
        nb = (e.join(labels, e.dst == labels.node)
              .select(e.src.alias("node"), "label"))
        counts = nb.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c"))
        winner = (counts
                  .withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1)
                  .select("node", F.col("label").alias("wlabel")))
        labels = (labels.join(winner, "node", "left")
                  .select("node",
                          F.coalesce("wlabel", "label")
                          .alias("label")))
        labels = labels.localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def k_core(edges: DataFrame, k: int | None = None,
           k_frac: float | None = None, rounds: int = 6,
           src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, core_deg) after ``rounds`` synchronous k-core peeling
    steps: each round drops every node whose degree in the CURRENT
    subgraph is below k, then removes its edges — the classic
    iterative characterization of the k-core (the maximal subgraph
    with min degree ≥ k; dense-subgraph mining's workhorse). The
    fixed-round synchronous form is fully deterministic, so the SQL
    oracle replays it as unrolled CTE levels like pagerank/LPA.

    ``k`` may be absolute, or relative via k_frac:
    k = floor(k_frac·(n_nodes−1)) — one tiny count to the driver
    (model-scale scalar, the kmeans-centroid precedent). Per round:
    one degree aggregate + two semi-joins (all keyed shuffles, no
    driver data), lineage cut per round. Pass an undirected edge set
    (see undirect). On a converged input extra rounds are no-ops, so
    a generous fixed ``rounds`` trades a few cheap empty passes for
    oracle replayability (a data-dependent stop would make the
    unrolled oracle's depth data-dependent too)."""
    e = (edges.select(F.col(src).alias("src"),
                      F.col(dst).alias("dst"))
         .localCheckpoint(eager=True))
    if k is None:
        if k_frac is None:
            raise ValueError("pass k or k_frac")
        n = e.select("src").distinct().count()
        k = int(math.floor(k_frac * (n - 1)))
    cur = e
    for _ in range(rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = (deg.filter(F.col("deg") >= k)
                .select(F.col("src").alias("node"))
                .localCheckpoint(eager=True))
        cur = (cur
               .join(keep.select(F.col("node").alias("src")),
                     "src", "left_semi")
               .join(keep.select(F.col("node").alias("dst")),
                     "dst", "left_semi")
               .localCheckpoint(eager=True))
    return (cur.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("core_deg")))


def hyperball(edges: DataFrame, rounds: int = 2,
              src: str = "src", dst: str = "dst") -> DataFrame:
    """HyperBall (Boldi & Vigna's distributed approximate
    neighborhood function): per node, an HLL register sketch of the
    ≤``rounds``-hop ball, grown by register-max merges along edges —
    THE way to estimate per-node reach / effective diameter on
    graphs where exact BFS frontiers would explode. Round cost: one
    join + one (node, register) max aggregate; sketches are
    mergeable so every step is an associative shuffle, and per-round
    localCheckpoint cuts the iterative lineage (g03/g04 discipline).
    State per node is HLL_M registers — O(nodes·m), independent of
    ball sizes.

    Reuses the repo's HLL machinery (operators/sketches.py) so the
    register arithmetic (md5 bucket/rank, integer-scaled harmonic
    sum, linear-counting branch) is oracle-replayable value-exact.
    Returns (node, n_registers_set, estimate≈|ball(node, rounds)|)."""
    from nowdb_spark.operators.sketches import (HLL_ALPHA, HLL_M,
                                                HLL_RANK_BITS,
                                                _hll_register_exprs)

    und = undirect(edges, src, dst).localCheckpoint(eager=True)
    nodes = und.select(F.col("src").alias("node")).distinct()
    reg_sql, rank_sql = _hll_register_exprs("node", "spark")
    sk = (nodes.select("node", F.expr(reg_sql).alias("register"),
                       F.expr(rank_sql).alias("max_rank"))
          .localCheckpoint(eager=True))
    for _ in range(rounds):
        via = (und.join(sk.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node"), "register",
                       "max_rank"))
        sk = (sk.unionByName(via)
              .groupBy("node", "register")
              .agg(F.max("max_rank").alias("max_rank"))
              .localCheckpoint(eager=True))
    top = HLL_RANK_BITS + 1
    agg = sk.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_registers_set"),
        F.coalesce(
            F.sum(F.expr(f"CAST(pow(2, {top} - max_rank) AS BIGINT)")),
            F.lit(0)).alias("s_set"))
    scale = float(1 << top)
    agg = agg.withColumn(
        "s_scaled",
        F.col("s_set") + (F.lit(HLL_M) - F.col("n_registers_set"))
        * F.lit(1 << top))
    est_raw = (F.lit(HLL_ALPHA * HLL_M * HLL_M * scale)
               / F.col("s_scaled").cast("double"))
    zeros = F.lit(HLL_M) - F.col("n_registers_set")
    linear = (F.lit(float(HLL_M))
              * F.log(F.lit(float(HLL_M)) / zeros.cast("double")))
    est = F.when((est_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
                 linear).otherwise(est_raw)
    return agg.select("node", "n_registers_set",
                      F.round(est, 4).alias("estimate"))
