"""Graph operator tests: iterative algorithms verified against
python recomputations (union-find, power iteration) on the same
edge lists — the differential pattern for non-SQL-expressible ops."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nowdb_spark.operators import graph as G
from nowdb_spark.workload import QUERIES
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bipartite_edges(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    return (li.select((F.col("l_suppkey") + 1_000_000).alias("src"),
                      F.col("l_partkey").alias("dst")).distinct().cache())


def test_degrees(spark, bipartite_edges):
    got = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in G.degrees(bipartite_edges).collect()}
    edges = [(r["src"], r["dst"]) for r in bipartite_edges.collect()]
    out_d, in_d = {}, {}
    for s, d in edges:
        out_d[s] = out_d.get(s, 0) + 1
        in_d[d] = in_d.get(d, 0) + 1
    for node, (o, i) in got.items():
        assert o == out_d.get(node, 0)
        assert i == in_d.get(node, 0)


def test_connected_components_vs_union_find(spark, bipartite_edges):
    got = {r["node"]: r["component"]
           for r in G.connected_components(bipartite_edges, 10).collect()}
    edges = [(r["src"], r["dst"]) for r in bipartite_edges.collect()]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(s, d)
    want_groups: dict = {}
    for n in parent:
        want_groups.setdefault(find(n), set()).add(n)
    got_groups: dict = {}
    for n, c in got.items():
        got_groups.setdefault(c, set()).add(n)
    assert set(map(frozenset, want_groups.values())) == \
        set(map(frozenset, got_groups.values()))


def test_pagerank_vs_python(spark, bipartite_edges):
    und = G.undirect(bipartite_edges)
    got = {r["node"]: r["rank"] for r in G.pagerank(und, iters=8).collect()}
    edges = [(r["src"], r["dst"]) for r in und.collect()]
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg: dict = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(8):
        inc = {v: 0.0 for v in nodes}
        for s, d in edges:
            inc[d] += rank[s] / deg[s]
        dangling = sum(rank[v] for v in nodes if v not in deg)
        rank = {v: 0.15 / n + 0.85 * (inc[v] + dangling / n) for v in nodes}
    assert len(got) == n
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-9)
    # probability mass is conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_k_hop(spark, bipartite_edges):
    start = spark.createDataFrame([(1_000_001,)], "node long")
    got = {(r["node"], r["hops"])
           for r in G.k_hop(bipartite_edges, start, 2).collect()}
    edges = [(r["src"], r["dst"]) for r in bipartite_edges.collect()]
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    seen = {1_000_001: 0}
    frontier = [1_000_001]
    for hop in (1, 2):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in seen:
                    seen[v] = hop
                    nxt.append(v)
        frontier = nxt
    assert got == set(seen.items())


def test_triangles_small_known(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6)],
        "src long, dst long")
    assert G.triangle_count(edges).first()["n_triangles"] == 2


def test_triangles_hub_no_wedge_blowup(spark):
    """Star hub with the SMALLEST id plus a few rim triangles: raw-id
    orientation (least/greatest) would give hub 0 out-degree n_spokes
    and the wedge join O(deg²) fan-in from that one key; degree
    ordering must orient every spoke→hub, bounding the hub's
    out-degree at 0. Count must come out right too."""
    n_spokes = 200
    hub = [(0, i) for i in range(1, n_spokes + 1)]
    rim = [(1, 2), (3, 4), (5, 6)]            # 3 triangles through hub
    edges = spark.createDataFrame(hub + rim, "src long, dst long")
    assert G.triangle_count(edges).first()["n_triangles"] == 3

    # re-derive the oriented edge list the operator builds and assert
    # the fan-in bound directly: with (degree, id) orientation the hub
    # (max degree) is never a source, so max out-degree is tiny
    e = edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b")).distinct()
    deg = (e.select(F.explode(F.array("a", "b")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    da, db = deg.alias("da"), deg.alias("db")
    a_first = (F.col("da.deg") < F.col("db.deg")) | (
        (F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b")))
    oriented = (e.join(da, F.col("a") == F.col("da.node"))
                .join(db, F.col("b") == F.col("db.node"))
                .select(F.when(a_first, F.col("a")).otherwise(F.col("b"))
                        .alias("a")))
    max_out = oriented.groupBy("a").count().agg(F.max("count")).first()[0]
    assert max_out <= 3          # id-orientation would make this 200


def test_workload_graph_queries_run(spark):
    for name in ("g03_components", "g04_pagerank"):
        df = QUERIES[name].spark(spark, SF_DIR)
        assert df.count() > 0


def test_star_components_chain_olog_rounds(spark):
    """Chain graph 0-1-2-...-255: min-label needs 255 rounds; the
    large-star/small-star contraction must converge in O(log n)."""
    n = 256
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "src long, dst long")
    labels, rounds = G.star_components(edges)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    import math
    assert rounds <= 2 * int(math.log2(n)) + 3, rounds


def test_star_components_multi_component(spark):
    """Two chains + a singleton-free triangle + min-label equivalence."""
    e = ([(i, i + 1) for i in range(0, 9)]          # chain 0..9
         + [(100 + i, 101 + i) for i in range(5)]   # chain 100..105
         + [(200, 201), (201, 202), (202, 200)])    # triangle
    edges = spark.createDataFrame(e, "src long, dst long")
    star = {r["node"]: r["component"]
            for r in G.connected_components(edges).collect()}
    label = {r["node"]: r["component"]
             for r in G.connected_components(
                 edges, max_iter=20, algorithm="label").collect()}
    assert star == label
    assert star[9] == 0 and star[105] == 100 and star[202] == 200


def test_pairs_from_groups_hot_key(spark):
    """A single hot key with 300 members must not be one mega-task:
    with chunk=64 the emission splits into (a, tail-chunk) rows spread
    by hash(a) — no exchange record and no explode row carries more
    than `chunk` partners — while the pair set stays exactly the a<b
    quadratic set."""
    rows = [(1, m) for m in range(300)] + [(2, 5), (2, 7)]
    df = spark.createDataFrame(rows, "k long, m long")
    pairs = G.pairs_from_groups(df, "k", "m", chunk=64)
    got = {(r["k"], r["a"], r["b"]) for r in pairs.collect()}
    want = {(1, a, b) for a in range(300) for b in range(a + 1, 300)}
    want.add((2, 5, 7))
    assert got == want
    # chunk bound: no single emitted row may carry a hot key's whole
    # tail — count rows of the pre-explode frame via its group sizes
    per_a = (pairs.groupBy("k", "a")
             .agg(F.count(F.lit(1)).alias("n")).collect())
    # member 0 of key 1 has 299 partners => ceil(299/64)=5 chunk rows;
    # the chunked emission implies every chunk row held <= 64 partners
    assert max(r["n"] for r in per_a) == 299


def test_pairs_from_groups_output_partitioning_feeds_agg(spark):
    """The emitted pairs are hash-partitioned by `a`, so the canonical
    consumer — groupBy(a, b).count() — must plan WITHOUT an exchange
    between the pair emission and the final aggregate (the r14 g01
    optimization: the quadratic pair rows never cross a shuffle)."""
    rows = [(k, m) for k in range(20) for m in range(k % 7 + 2)]
    df = spark.createDataFrame(rows, "k long, m long")
    agg = (G.pairs_from_groups(df, "k", "m")
           .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # exactly two exchanges: the collect_set groupBy and the
    # repartition-by-a; none between emission and the (a, b) aggregate
    assert plan.count("Exchange") == 2, plan[:3000]


def test_label_propagation_two_cliques(spark):
    from nowdb_spark.operators.graph import (label_propagation,
                                             undirect)

    # two 4-cliques joined by one bridge edge: LPA must give each
    # clique one community, and the min-label tie-break makes the
    # result exactly the clique minima
    edges = []
    for base in (0, 10):
        for a in range(4):
            for b in range(a + 1, 4):
                edges.append((base + a, base + b))
    edges.append((3, 10))                       # bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["community"]
           for r in label_propagation(undirect(df), rounds=4).collect()}
    assert {out[n] for n in (0, 1, 2)} == {0}
    assert {out[n] for n in (11, 12, 13)} == {10}


def test_label_propagation_deterministic(spark):
    from nowdb_spark.operators.graph import (label_propagation,
                                             undirect)

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)],
        "src long, dst long")
    a = sorted(map(tuple, label_propagation(undirect(df), 3).collect()))
    b = sorted(map(tuple, label_propagation(undirect(df), 3).collect()))
    assert a == b
