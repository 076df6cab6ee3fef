"""Property-based differential test for the WHILE traversal clause:
random small graphs, seeds, stop-destinations and depth bounds vs a
Python BFS that mirrors the documented semantics (WHERE seeds depth
0; condition-satisfying edges expand destin→origin over the whole
context; violators terminal; visited-edge dedup; DEPTH bound)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from nowdb_spark.engine import Engine

N_NODES = 9


def python_while(edges, seed, stop, depth):
    """Expected traversal result: {(origin, destin, depth)}."""
    frontier = [(o, d) for (o, d) in edges if o == seed]
    acc = {(o, d): 0 for (o, d) in frontier}
    for lvl in range(1, depth + 1):
        heads = {d for (o, d) in frontier if d != stop}
        nxt = [(o, d) for (o, d) in edges
               if o in heads and (o, d) not in acc]
        if not nxt:
            break
        for e in nxt:
            acc[e] = lvl
        frontier = nxt
    return {(o, d, lvl) for (o, d), lvl in acc.items()}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(spark, tmp_path_factory.mktemp("wh_while"))
    assert e.execute("create scope wprop").ok()
    assert e.execute("use wprop").ok()
    assert e.execute("create type wn (nid uint pk)").ok()
    vals = ", ".join(f"({i})" for i in range(1, N_NODES + 1))
    assert e.execute(f"insert into wn (nid) values {vals}").ok()
    return e


_counter = [0]


@settings(max_examples=12, deadline=None)
@given(
    edges=st.sets(
        st.tuples(st.integers(1, N_NODES), st.integers(1, N_NODES)),
        min_size=1, max_size=20),
    seed=st.integers(1, N_NODES),
    stop=st.integers(1, N_NODES),
    depth=st.integers(1, 6),
)
def test_while_matches_python_bfs(eng, edges, seed, stop, depth):
    _counter[0] += 1
    ctx = f"we{_counter[0]}"
    assert eng.execute(
        f"create edge {ctx} (origin wn origin, destin wn destin)").ok()
    try:
        vals = ", ".join(f"({o}, {d})" for o, d in sorted(edges))
        assert eng.execute(
            f"insert into {ctx} (origin, destin) values {vals}").ok()
        r = eng.execute(
            f"select origin, destin, depth from {ctx} "
            f"where origin = {seed} while destin != {stop} "
            f"depth {depth}")
        assert r.ok(), r.details()
        got = set(r.fetch(10_000))
        assert got == python_while(sorted(edges), seed, stop, depth)
    finally:
        eng.execute(f"drop edge {ctx} if exists")
