"""Random-formula differential testing (the reference's
test/pysmoke/formulas.py pattern, generalized): generate seeded-random
expression trees, render them BOTH as nowdb dialect SQL and as DuckDB
SQL, run both engines over `part`, and compare per-row.

Covers the scalar surface combinatorially: + - * / % ^, abs/ceil/
floor/round, trig, log, CASE, int/float mixing with the nowdb
int-division-is-float rule.
"""

from __future__ import annotations

import math
import random
import tempfile

import pytest

from nowdb_spark.engine import Engine
from tests.conftest import SF_DIR

N_FORMULAS = 24
MAX_DEPTH = 3


class Node:
    """Expression tree rendering to both dialects."""

    def __init__(self, kind, children=(), value=None):
        self.kind = kind
        self.children = children
        self.value = value

    def nowdb(self) -> str:
        c = [x.nowdb() for x in self.children]
        k = self.kind
        if k == "col":
            return self.value
        if k == "lit":
            return repr(self.value)
        if k in ("+", "-", "*"):
            return f"({c[0]} {k} {c[1]})"
        if k == "/":
            return f"({c[0]} / (abs({c[1]}) + 1.5))"
        if k == "%":
            return f"(toint({c[0]}) % (toint(abs({c[1]})) + 3))"
        if k == "^":
            return f"((abs({c[0]}) + 0.5) ^ 2)"
        if k in ("abs", "ceil", "floor", "sin", "cos"):
            return f"{k}({c[0]})"
        if k == "round":
            return f"round({c[0]})"
        if k == "log":
            return f"log(abs({c[0]}) + 1.0)"
        if k == "case":
            return (f"(case when {c[0]} > {c[1]} then {c[0]} "
                    f"else {c[1]} end)")
        raise AssertionError(k)

    def duckdb(self) -> str:
        c = [x.duckdb() for x in self.children]
        k = self.kind
        if k == "col":
            return self.value
        if k == "lit":
            return repr(self.value)
        if k in ("+", "-", "*"):
            return f"({c[0]} {k} {c[1]})"
        if k == "/":
            # nowdb division is always float division
            return f"(CAST({c[0]} AS DOUBLE) / (abs({c[1]}) + 1.5))"
        if k == "%":
            # nowdb toint (C cast) truncates toward zero; DuckDB's
            # CAST(double AS BIGINT) rounds — trunc first
            return (f"(CAST(trunc({c[0]}) AS BIGINT) % "
                    f"(CAST(trunc(abs({c[1]})) AS BIGINT) + 3))")
        if k == "^":
            return f"pow(abs({c[0]}) + 0.5, 2)"
        if k in ("abs", "ceil", "floor", "sin", "cos"):
            if k in ("ceil", "floor"):
                # nowdb ceil/floor keep float
                return f"CAST({k}({c[0]}) AS DOUBLE)"
            return f"{k}({c[0]})"
        if k == "round":
            return f"round({c[0]})"
        if k == "log":
            return f"ln(abs({c[0]}) + 1.0)"
        if k == "case":
            return (f"(CASE WHEN {c[0]} > {c[1]} THEN {c[0]} "
                    f"ELSE {c[1]} END)")
        raise AssertionError(k)


def gen(rng: random.Random, depth: int) -> Node:
    if depth >= MAX_DEPTH or rng.random() < 0.25:
        r = rng.random()
        if r < 0.4:
            return Node("col", value=rng.choice(
                ["p_size", "p_retailprice"]))
        if r < 0.7:
            return Node("lit", value=rng.randint(1, 9))
        return Node("lit", value=round(rng.uniform(0.5, 9.5), 2))
    k = rng.choice(["+", "-", "*", "/", "%", "^",
                    "abs", "ceil", "floor", "round", "log",
                    "sin", "cos", "case"])
    arity = 2 if k in ("+", "-", "*", "/", "%", "^", "case") else 1
    return Node(k, [gen(rng, depth + 1) for _ in range(arity)])


@pytest.fixture(scope="module")
def dialect_engine(spark):
    eng = Engine(spark, tempfile.mkdtemp(prefix="prop_"))
    eng.rexecute("create scope propdb")
    eng.rexecute("use propdb")
    eng.scope.mount("part", f"{SF_DIR}/part.parquet")
    return eng


@pytest.mark.parametrize("seed", range(N_FORMULAS))
def test_random_formula(dialect_engine, oracle, seed):
    rng = random.Random(1000 + seed)
    tree = gen(rng, 0)
    nowdb_sql = (f"select p_partkey, {tree.nowdb()} as f "
                 f"from part order by p_partkey")
    duck_sql = (f"SELECT p_partkey, {tree.duckdb()} AS f "
                f"FROM part ORDER BY p_partkey")
    got = [(r.row()[0], r.row()[1])
           for r in dialect_engine.rexecute(nowdb_sql)]
    want = oracle.execute(duck_sql).fetchall()
    assert len(got) == len(want)
    for (gk, gv), (wk, wv) in zip(got, want):
        assert gk == wk
        if gv is None or wv is None:
            assert gv == wv, f"formula {tree.nowdb()}: {gv} != {wv}"
        elif isinstance(wv, float):
            assert gv == pytest.approx(wv, rel=1e-9, abs=1e-9), \
                f"formula {tree.nowdb()}: {gv} != {wv}"
        else:
            assert gv == wv, f"formula {tree.nowdb()}: {gv} != {wv}"
    assert not math.isnan(sum(v for _, v in got if isinstance(v, float)
                              and not math.isnan(v)))


# --- random window specs (OVER extension) ---------------------------
#
# Same differential idea over the window surface: random function ×
# frame × value column, partitioned by l_orderkey and ordered by the
# (within-partition unique) l_linenumber so every result is
# deterministic on both engines.

N_WINDOWS = 16
_WIN_FUNCS = ["row_number", "rank", "dense_rank", "sum", "avg",
              "min", "max", "count", "lag", "lead"]
_FRAMES = [None, "rows between unbounded preceding and current row",
           "rows between 2 preceding and current row",
           "rows between current row and 2 following",
           "rows between 1 preceding and 1 following",
           "rows between unbounded preceding and unbounded following"]


def _gen_window(rng: random.Random) -> tuple[str, str]:
    fn = rng.choice(_WIN_FUNCS)
    val = rng.choice(["l_quantity", "l_extendedprice", "l_discount"])
    frame = rng.choice(_FRAMES)
    over = "partition by l_orderkey order by l_linenumber"
    if fn in ("row_number", "rank", "dense_rank"):
        expr = f"{fn}() over ({over})"
        return expr, expr
    if fn in ("lag", "lead"):
        off = rng.randint(1, 2)
        expr = f"{fn}({val}, {off}, 0.0) over ({over})"
        return expr, expr
    if fn == "count":
        spec = f"({over}{' ' + frame if frame else ''})"
        return (f"count(*) over {spec}",
                f"CAST(count(*) OVER {spec} AS BIGINT)")
    spec = f"({over}{' ' + frame if frame else ''})"
    expr = f"{fn}({val}) over {spec}"
    return expr, expr


@pytest.fixture(scope="module")
def window_engine(spark):
    eng = Engine(spark, tempfile.mkdtemp(prefix="propw_"))
    eng.rexecute("create scope propwdb")
    eng.rexecute("use propwdb")
    eng.scope.mount("lineitem", f"{SF_DIR}/lineitem.parquet")
    return eng


@pytest.mark.parametrize("seed", range(N_WINDOWS))
def test_random_window(window_engine, oracle, seed):
    rng = random.Random(7000 + seed)
    nb, dk = _gen_window(rng)
    nowdb_sql = (f"select l_orderkey, l_linenumber, {nb} as w "
                 f"from lineitem where l_orderkey < 500 "
                 f"order by l_orderkey, l_linenumber")
    duck_sql = (f"SELECT l_orderkey, l_linenumber, {dk} AS w "
                f"FROM lineitem WHERE l_orderkey < 500 "
                f"ORDER BY l_orderkey, l_linenumber")
    got = [tuple(r.row()) for r in window_engine.rexecute(nowdb_sql)]
    want = oracle.execute(duck_sql).fetchall()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:2] == w[:2]
        gv, wv = g[2], w[2]
        if isinstance(wv, float):
            assert gv == pytest.approx(wv, rel=1e-9, abs=1e-12), \
                f"window {nb}: {gv} != {wv}"
        else:
            assert gv == wv, f"window {nb}: {gv} != {wv}"
