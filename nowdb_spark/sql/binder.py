"""Binder: nowdb SQL AST → PySpark plan.

Expressions bind to `pyspark.sql.Column` trees via the scalar /
aggregate tables (functions/); SELECT statements bind to a DataFrame
pipeline  read → join → filter → groupBy/agg → orderBy → select —
the Spark image of the reference's linear plan
[READER, FILTER, GROUPING, ORDERING, PROJECTION]
(qplan/plan.h:25-32).

Semantics carried over:
  - `/` on ints → float division; `^` → pow; `%` → remainder
  - string literals compared to time-typed columns are coerced with
    the reference's ISO formats (types/time.h:36-37)
  - aggregates may wrap expressions and appear inside expressions
    (sum(w)/count(*)) — bound by splitting into pre-aggregated
    sub-aggregates (doc/manual/sql.tex:1189-1208)
  - GROUP BY restriction (select list = group keys + aggregates,
    sql.tex:2659-2697) is *lifted*; strict=True re-imposes it
  - ORDER BY defaults ascending (grammar nowdbsql.y:834-837 has no
    direction); ASC|DESC accepted as an extension
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nowdb_spark import timeutil as TU
from nowdb_spark.functions.aggregates import AGGREGATES
from nowdb_spark.functions.scalar import SCALAR_OPS
from nowdb_spark.sql import ast as A


class BindError(ValueError):
    pass


_CMP_OPS = {"=", "!=", "<", ">", "<=", ">="}
_BOOL_OPS = {"and", "or", "not"}


def _round2(col: Column, scale_node) -> Column:
    """2-arg round(x, n) — dialect extension over the reference's
    unary round (needed to express oracle-stable float output)."""
    if not (isinstance(scale_node, A.Const) and scale_node.type == "int"):
        raise BindError("round(x, n): n must be an integer literal")
    return F.round(col, scale_node.value)


def _apply_cmp(op: str, left: Column, right: Column) -> Column:
    if op == "=":
        return left == right
    if op == "!=":
        return left != right
    if op == "<":
        return left < right
    if op == ">":
        return left > right
    if op == "<=":
        return left <= right
    return left >= right


# window-capable functions (extension; `.over()` must be applied to
# the bare function column, so composed AGGREGATES builders — median,
# prod, mode — are deliberately not window-callable)
_WINDOW_RANKING = {"row_number": F.row_number, "rank": F.rank,
                   "dense_rank": F.dense_rank}
_WINDOW_AGGS = {"sum": F.sum, "avg": F.avg, "count": F.count,
                "min": F.min, "max": F.max, "stddev": F.stddev_samp,
                "first_value": F.first, "last_value": F.last}


class ExprBinder:
    """Binds expression AST nodes against a column namespace.

    col_types maps visible column name → nowdb type name (for time
    literal coercion); resolve() maps (qualifier, name) → Column.
    """

    def __init__(self, col_types: dict[str, str],
                 resolver=None):
        self.col_types = col_types
        self.resolver = resolver or (lambda q, n: F.col(n))
        # pre-bound scalar-subquery columns, keyed by id(ast node)
        # (populated by SelectBinder after attaching the 1-row frames)
        self.subq: dict[int, Column] = {}

    # --- helpers ---------------------------------------------------
    def _expr_time_type(self, node) -> bool:
        """Is this expression time-typed (for literal coercion)?"""
        if isinstance(node, A.Field):
            return self.col_types.get(node.name) in ("date", "time")
        return False

    def _coerce_pair(self, le, re, lc: Column, rc: Column):
        """Coerce a string literal against a time-typed operand."""
        if self._expr_time_type(le) and isinstance(re, A.Const) \
                and re.type == "string":
            rc = F.lit(TU.parse_time_literal(re.value))
        if self._expr_time_type(re) and isinstance(le, A.Const) \
                and le.type == "string":
            lc = F.lit(TU.parse_time_literal(le.value))
        return lc, rc

    # --- main ------------------------------------------------------
    def bind(self, node) -> Column:
        if isinstance(node, A.Const):
            return F.lit(node.value)
        if isinstance(node, A.Field):
            return self.resolver(node.qualifier, node.name)
        if isinstance(node, A.IsNull):
            c = self.bind(node.expr)
            return c.isNotNull() if node.negated else c.isNull()
        if isinstance(node, A.InExpr):
            if node.select is not None:
                raise BindError(
                    "IN (SELECT ...) is only supported as a top-level "
                    "WHERE conjunct")
            c = self.bind(node.expr)
            vals = []
            for v in node.values:
                if self._expr_time_type(node.expr) and isinstance(v, A.Const) \
                        and v.type == "string":
                    vals.append(TU.parse_time_literal(v.value))
                elif isinstance(v, A.Const):
                    vals.append(v.value)
                else:
                    raise BindError("IN list must contain constants")
            return ~c.isin(vals) if node.negated else c.isin(vals)
        if isinstance(node, A.CaseExpr):
            out = None
            for cond, then in node.whens:
                c, t = self.bind(cond), self.bind(then)
                out = F.when(c, t) if out is None else out.when(c, t)
            if node.else_ is not None:
                out = out.otherwise(self.bind(node.else_))
            return out
        if isinstance(node, A.Op):
            return self._bind_op(node)
        if isinstance(node, A.WindowExpr):
            return self._bind_window(node)
        if isinstance(node, A.ExistsExpr):
            raise BindError(
                "EXISTS is only supported as a top-level WHERE conjunct")
        if isinstance(node, A.ScalarSubquery):
            try:
                return self.subq[id(node)]
            except KeyError:
                raise BindError(
                    "scalar subquery not supported in this position")
        if isinstance(node, A.Agg):
            raise BindError("aggregate not allowed here")
        raise BindError(f"cannot bind {node!r}")

    def _bind_window(self, node: A.WindowExpr) -> Column:
        w = Window.partitionBy(
            *[self.resolver(f.qualifier, f.name) for f in node.partition_by])
        if node.order_by:
            def ocol(f):
                if isinstance(f, A.OrderItem):
                    c = self.bind(f.expr)
                else:
                    c = self.resolver(f.qualifier, f.name)
                return c.desc() if f.desc else c.asc()
            w = w.orderBy(*[ocol(f) for f in node.order_by])
        if node.frame is not None:
            lo, hi = node.frame
            lo = Window.unboundedPreceding if lo is None else lo
            hi = Window.unboundedFollowing if hi is None else hi
            if getattr(node, "frame_mode", "rows") == "range":
                # value-offset frame over ONE numeric order key — the
                # time-window frame for ns stamps (`RANGE BETWEEN
                # 3600000000000 PRECEDING AND CURRENT ROW` = trailing
                # hour); Spark enforces the single-numeric-key rule
                if len(node.order_by) != 1:
                    raise BindError(
                        "RANGE frames need exactly one ORDER BY key")
                w = w.rangeBetween(lo, hi)
            else:
                w = w.rowsBetween(lo, hi)
        name = node.name
        if name in _WINDOW_RANKING:
            if not node.order_by:
                raise BindError(f"{name}() OVER requires ORDER BY")
            if node.args:
                raise BindError(f"{name}() takes no arguments")
            return _WINDOW_RANKING[name]().over(w)
        if name in ("lag", "lead"):
            if not node.order_by:
                raise BindError(f"{name}() OVER requires ORDER BY")
            if not 1 <= len(node.args) <= 3:
                raise BindError(f"{name}(col[, n[, default]])")
            col = self.bind(node.args[0])
            n = 1
            if len(node.args) >= 2:
                if not (isinstance(node.args[1], A.Const)
                        and node.args[1].type == "int"):
                    raise BindError(f"{name}: offset must be an int literal")
                n = node.args[1].value
            dflt = None
            if len(node.args) == 3:
                if not isinstance(node.args[2], A.Const):
                    raise BindError(f"{name}: default must be a literal")
                dflt = node.args[2].value
            fn = F.lag if name == "lag" else F.lead
            return fn(col, n, dflt).over(w)
        if name in _WINDOW_AGGS:
            if name == "count" and not node.args:
                return F.count(F.lit(1)).over(w)
            if len(node.args) != 1:
                raise BindError(f"{name}(col) OVER takes one argument")
            return _WINDOW_AGGS[name](self.bind(node.args[0])).over(w)
        raise BindError(f"{name!r} is not window-callable")

    def _bind_op(self, node: A.Op) -> Column:
        name = node.name
        if name in _BOOL_OPS:
            args = [self.bind(a) for a in node.args]
            if name == "and":
                return args[0] & args[1]
            if name == "or":
                return args[0] | args[1]
            return ~args[0]
        if name in _CMP_OPS:
            le, re = node.args
            lc, rc = self.bind(le), self.bind(re)
            lc, rc = self._coerce_pair(le, re, lc, rc)
            return _apply_cmp(name, lc, rc)
        if name == "between":
            v_n, lo_n, hi_n = node.args
            v = self.bind(v_n)
            lo, hi = self.bind(lo_n), self.bind(hi_n)
            _, lo = self._coerce_pair(v_n, lo_n, v, lo)
            v2, hi = self._coerce_pair(v_n, hi_n, v, hi)
            return (v2 >= lo) & (v2 <= hi)
        if name == "like":
            pat = node.args[1]
            if not (isinstance(pat, A.Const) and pat.type == "string"):
                raise BindError("LIKE pattern must be a string literal")
            return self.bind(node.args[0]).like(pat.value)
        if name == "round" and len(node.args) == 2:
            return _round2(self.bind(node.args[0]), node.args[1])
        if name in SCALAR_OPS:
            arity, fn = SCALAR_OPS[name]
            args = [self.bind(a) for a in node.args]
            if arity >= 0 and len(args) != arity:
                raise BindError(f"{name} expects {arity} args")
            return fn(*args)
        raise BindError(f"unknown function {name!r}")


def _expr_name(node, idx: int) -> str:
    """Derived projection column name (stable, short)."""
    if isinstance(node, A.Field):
        return node.name
    if isinstance(node, A.Agg):
        inner = _expr_name(node.arg, idx) if node.arg else "*"
        return f"{node.name}_{inner}" if node.arg else node.name
    if isinstance(node, A.Op):
        return f"{node.name}_{idx}"
    if isinstance(node, A.WindowExpr):
        return f"{node.name}_{idx}"
    return f"col_{idx}"


def _collect_aggs(node, out: list) -> None:
    if isinstance(node, A.Agg):
        out.append(node)
        return
    if isinstance(node, A.Op):
        for a in node.args:
            _collect_aggs(a, out)
    elif isinstance(node, A.CaseExpr):
        for c, t in node.whens:
            _collect_aggs(c, out)
            _collect_aggs(t, out)
        if node.else_ is not None:
            _collect_aggs(node.else_, out)
    elif isinstance(node, (A.InExpr, A.IsNull)):
        _collect_aggs(node.expr, out)


def _expr_eq(a, b) -> bool:
    """Structural AST equality (for matching select items to GROUP BY
    expressions)."""
    if type(a) is not type(b):
        return False
    if isinstance(a, A.Const):
        return a.value == b.value and a.type == b.type
    if isinstance(a, A.Field):
        return a.name == b.name and a.qualifier == b.qualifier
    if isinstance(a, A.Op):
        return (a.name == b.name and len(a.args) == len(b.args)
                and all(_expr_eq(x, y) for x, y in zip(a.args, b.args)))
    if isinstance(a, A.Agg):
        return (a.name == b.name and a.distinct == b.distinct
                and (a.arg is None) == (b.arg is None)
                and (a.arg is None or _expr_eq(a.arg, b.arg)))
    if isinstance(a, A.CaseExpr):
        return (len(a.whens) == len(b.whens)
                and all(_expr_eq(c1, c2) and _expr_eq(t1, t2)
                        for (c1, t1), (c2, t2) in zip(a.whens, b.whens))
                and (a.else_ is None) == (b.else_ is None)
                and (a.else_ is None or _expr_eq(a.else_, b.else_)))
    if isinstance(a, A.IsNull):
        return a.negated == b.negated and _expr_eq(a.expr, b.expr)
    if isinstance(a, A.InExpr):
        return (a.negated == b.negated and a.select is None
                and b.select is None
                and len(a.values) == len(b.values)
                and _expr_eq(a.expr, b.expr)
                and all(_expr_eq(x, y)
                        for x, y in zip(a.values, b.values)))
    return False


def _split_conjuncts(node) -> list:
    if isinstance(node, A.Op) and node.name == "and":
        return _split_conjuncts(node.args[0]) + _split_conjuncts(node.args[1])
    return [node]


def _scalar_subs(node, out: list, into_aggs: bool = True) -> None:
    """Collect ScalarSubquery nodes; into_aggs=False stops at Agg
    boundaries (those are attached pre-aggregation instead)."""
    if node is None:
        return
    if isinstance(node, A.ScalarSubquery):
        out.append(node)
        return
    if isinstance(node, A.Op):
        for a in node.args:
            _scalar_subs(a, out, into_aggs)
    elif isinstance(node, A.Agg):
        if into_aggs and node.arg is not None:
            _scalar_subs(node.arg, out, into_aggs)
    elif isinstance(node, A.CaseExpr):
        for c, t in node.whens:
            _scalar_subs(c, out, into_aggs)
            _scalar_subs(t, out, into_aggs)
        _scalar_subs(node.else_, out, into_aggs)
    elif isinstance(node, (A.InExpr, A.IsNull)):
        _scalar_subs(node.expr, out, into_aggs)
    elif isinstance(node, A.WindowExpr):
        for a in node.args:
            _scalar_subs(a, out, into_aggs)


def _refs_qualifier(node, q: str) -> bool:
    if isinstance(node, A.Field):
        return node.qualifier == q
    if isinstance(node, A.Op):
        return any(_refs_qualifier(a, q) for a in node.args)
    if isinstance(node, A.CaseExpr):
        return (any(_refs_qualifier(c, q) or _refs_qualifier(t, q)
                    for c, t in node.whens)
                or (node.else_ is not None
                    and _refs_qualifier(node.else_, q)))
    if isinstance(node, (A.InExpr, A.IsNull)):
        return _refs_qualifier(node.expr, q)
    if isinstance(node, A.Agg):
        return node.arg is not None and _refs_qualifier(node.arg, q)
    return False


def _corr_pair(c, outer_names):
    """`outer.col = <sub expr>` (either side) → (Field(col), sub_expr);
    None when the conjunct is not a correlation equality.
    outer_names: the outer FROM target's name and/or alias."""
    if not (isinstance(c, A.Op) and c.name == "=" and len(c.args) == 2):
        return None
    a, b = c.args

    def is_outer(x):
        return isinstance(x, A.Field) and x.qualifier in outer_names

    def refs_outer(x):
        return any(_refs_qualifier(x, q) for q in outer_names)

    if is_outer(a) and not refs_outer(b):
        return A.Field(a.name), b
    if is_outer(b) and not refs_outer(a):
        return A.Field(b.name), a
    return None


def _has_subquery(node) -> bool:
    if node is None:
        return False
    if isinstance(node, A.ScalarSubquery):
        return True
    if isinstance(node, A.InExpr):
        return node.select is not None or _has_subquery(node.expr)
    if isinstance(node, A.ExistsExpr):
        return True
    if isinstance(node, A.Op):
        return any(_has_subquery(a) for a in node.args)
    if isinstance(node, A.Agg):
        return node.arg is not None and _has_subquery(node.arg)
    if isinstance(node, A.CaseExpr):
        return (any(_has_subquery(c) or _has_subquery(t)
                    for c, t in node.whens)
                or _has_subquery(node.else_))
    if isinstance(node, A.IsNull):
        return _has_subquery(node.expr)
    if isinstance(node, A.WindowExpr):
        return any(_has_subquery(a) for a in node.args)
    return False


def _has_op(node, *names: str) -> bool:
    """Does the expression tree contain an Op with one of `names`?"""
    if node is None:
        return False
    if isinstance(node, A.Op):
        return (node.name in names
                or any(_has_op(a, *names) for a in node.args))
    if isinstance(node, A.InExpr):
        return _has_op(node.expr, *names)
    if isinstance(node, A.Agg):
        return node.arg is not None and _has_op(node.arg, *names)
    if isinstance(node, A.CaseExpr):
        return (any(_has_op(c, *names) or _has_op(t, *names)
                    for c, t in node.whens)
                or _has_op(node.else_, *names))
    if isinstance(node, A.IsNull):
        return _has_op(node.expr, *names)
    if isinstance(node, A.WindowExpr):
        return any(_has_op(a, *names) for a in node.args)
    return False


class SelectBinder:
    """Binds a Select AST to a DataFrame, given a context resolver."""

    def __init__(self, spark: SparkSession, load_context, col_types,
                 strict: bool = False):
        """
        load_context(name) -> (DataFrame, {col: nowdb_type}, TypeDef|None)
        """
        self.spark = spark
        self.load_context = load_context
        self.strict = strict
        self._sub_n = 0          # attached scalar-subquery column counter
        self._base_cols: list = []

    def bind(self, sel) -> DataFrame:
        if isinstance(sel, A.SetOp):
            return self._bind_setop(sel)
        # select-only (no FROM) → single row (nowdbsql.y:365-367)
        if sel.target is None:
            eb = ExprBinder({})
            cols = []
            for i, item in enumerate(sel.items):
                c = eb.bind(item.expr)
                cols.append(c.alias(item.alias or _expr_name(item.expr, i)))
            return self.spark.range(1).select(*cols)

        derived = sel.target is not None and not isinstance(sel.target, str)
        if self.strict and (derived or sel.target_alias is not None
                            or any(isinstance(j, A.GeneralJoin)
                                   for j in sel.joins)):
            raise BindError(
                "strict mode: general joins, derived tables and FROM "
                "aliases are extensions the reference grammar does not "
                "accept (SURVEY §2.1)")
        if derived:
            df, col_types, tdef = self._bind_sub_select(sel.target), {}, None
        else:
            df, col_types, tdef = self.load_context(sel.target)

        if sel.pivot is not None or sel.unpivot is not None:
            if self.strict:
                raise BindError(
                    "strict mode: PIVOT/UNPIVOT are extensions the "
                    "reference grammar does not accept (SURVEY §2.1)")
            df = self._apply_pivot(df, sel)
            # pivot/unpivot rewrite the column set — stale per-column
            # type annotations must not leak (same policy as derived
            # tables)
            col_types, tdef = {}, None

        # qualifier → physical column prefix (None = base columns are
        # unprefixed); the base context resolves by its own name or its
        # FROM alias
        qualmap: dict[str, Optional[str]] = {}
        if isinstance(sel.target, str):
            qualmap[sel.target] = None
        if sel.target_alias is not None:
            qualmap[sel.target_alias] = None

        for j in sel.joins:
            if isinstance(j, A.GeneralJoin):
                df, col_types = self._bind_general_join(
                    df, col_types, qualmap, j)
                continue
            # documented join design (sql.tex:2293-2368): edge joins a
            # vertex on origin/destin against the vertex PK, always
            # inner, and a vertex table is a dimension — broadcast
            vdf, vtypes, vdef = self.load_context(j.vertex)
            if vdef is None or vdef.pk is None:
                raise BindError(f"join target {j.vertex!r} has no PK")
            # at most two sub-joins per edge; alias vertex columns so
            # `alias.field` / `vertex.field` resolve unambiguously
            prefix = j.alias or j.vertex
            renamed = vdf.select(
                *[F.col(c).alias(f"{prefix}__{c}") for c in vdf.columns])
            pk = f"{prefix}__{vdef.pk}"
            df = df.join(F.broadcast(renamed),
                         df[j.on] == renamed[pk], "inner")
            for c, t in vtypes.items():
                col_types.setdefault(f"{prefix}__{c}", t)
            qualmap[prefix] = prefix
            qualmap.setdefault(j.vertex, prefix)

        def resolver(q: Optional[str], n: str) -> Column:
            if q is not None:
                if q not in qualmap:
                    raise BindError(f"unknown alias {q!r}")
                p = qualmap[q]
                return F.col(n if p is None else f"{p}__{n}")
            return F.col(n)

        eb = ExprBinder(col_types, resolver)

        if self.strict and (
                _has_subquery(sel.where) or _has_subquery(sel.having)
                or any(_has_subquery(it.expr) for it in sel.items)):
            raise BindError(
                "strict mode: subqueries are an extension the reference "
                "grammar does not accept (SURVEY §2.1)")
        if self.strict and any(
                _has_op(e, "like", "between")
                for e in [sel.where, sel.having, sel.qualify,
                          *[it.expr for it in sel.items]]):
            raise BindError(
                "strict mode: LIKE/BETWEEN are extensions — the "
                "reference grammar stubs them out (nowdbsql.y:846)")

        self._base_cols = list(df.columns)
        pre_where = df                 # traversal universe (WHILE)
        if sel.where is not None:
            subs: list = []
            _scalar_subs(sel.where, subs)
            df = self._attach_scalars(df, subs, eb)
            plain: list = []
            outer_names = {x for x in (
                sel.target if isinstance(sel.target, str) else None,
                sel.target_alias) if x}
            for conj in _split_conjuncts(sel.where):
                if isinstance(conj, A.InExpr) and conj.select is not None:
                    df = self._bind_in_subquery(df, conj, eb)
                elif isinstance(conj, A.ExistsExpr):
                    df = self._bind_exists(df, conj.select, eb,
                                           outer_names, negated=False)
                elif (isinstance(conj, A.Op) and conj.name == "not"
                      and isinstance(conj.args[0], A.ExistsExpr)):
                    df = self._bind_exists(df, conj.args[0].select, eb,
                                           outer_names, negated=True)
                else:
                    plain.append(conj)
            for conj in plain:
                df = df.filter(eb.bind(conj))

        if sel.while_cond is not None:
            if self.strict:
                raise BindError(
                    "strict mode: WHILE traversal is designed but not "
                    "in the shipped reference grammar "
                    "(sql.tex:2518-2554)")
            df = self._bind_while(df, pre_where, sel, eb, tdef,
                                  col_types)
            self._base_cols = list(df.columns)

        has_aggs = any(self._item_aggs(it.expr) for it in sel.items)

        if self.strict and (sel.distinct or sel.having is not None):
            raise BindError(
                "strict mode: DISTINCT/HAVING are extensions the "
                "reference grammar does not accept (SURVEY §2.1)")
        if self.strict and any(isinstance(it.expr, A.WindowExpr)
                               for it in sel.items):
            raise BindError(
                "strict mode: window functions (OVER) are an extension "
                "the reference grammar does not accept (SURVEY §2.1)")

        if sel.group_by or has_aggs:
            df = self._bind_aggregation(df, sel, eb)
        else:
            subs = []
            for item in sel.items:
                _scalar_subs(item.expr, subs)
            df = self._attach_scalars(df, subs, eb)
            cols = []
            for i, item in enumerate(sel.items):
                if isinstance(item.expr, A.Field) and item.expr.name == "*":
                    # expand * to the base columns so attached helper
                    # columns (__sub_k) never leak into the output
                    cols.extend(F.col(c) for c in self._base_cols)
                    continue
                cols.append(eb.bind(item.expr)
                            .alias(item.alias or _expr_name(item.expr, i)))
            df = df.select(*cols)

        if sel.qualify is not None:
            if self.strict:
                raise BindError(
                    "strict mode: QUALIFY is an extension the reference "
                    "grammar does not accept (SURVEY §2.1)")
            # post-projection filter (DuckDB/Snowflake semantics):
            # binds against the OUTPUT columns, so window ranks filter
            # by their select-list alias — or inline window exprs over
            # projected columns
            df = df.filter(ExprBinder({}).bind(sel.qualify))

        if sel.distinct:
            df = df.distinct()

        if sel.order_by:
            if self.strict and any(isinstance(f, A.OrderItem)
                                   for f in sel.order_by):
                raise BindError(
                    "strict mode: ORDER BY accepts field names only "
                    "(expression keys are an extension, SURVEY §2.1)")
            # ascending only (nowdbsql.y:834-837); reference requires a
            # matching index — Spark sorts freely (SURVEY §2.5)
            df = df.orderBy(*[_order_col(f, sel, df) for f in sel.order_by])
        if sel.limit is not None:
            df = df.limit(sel.limit)
        return df

    def _bind_while(self, seeds: DataFrame, universe: DataFrame, sel,
                    eb, tdef, col_types: dict) -> DataFrame:
        """WHILE traversal — the reference's designed-only recursive
        edge-following (doc/manual/sql.tex:2518-2554, \\ignore'd).

        Semantics (fixed here, since the design left them open):
        WHERE seeds the start edges (depth 0); each reached edge that
        satisfies the WHILE condition is expanded by following its
        destin to the origins of the WHOLE edge context; an edge that
        violates the condition is included but terminal (exactly the
        manual's "follow until an edge with destination X is
        reached"). DEPTH bounds the iteration (default 10 — the
        design's own caveat that "the number of iterations must be
        bounded"); visited-edge dedup makes cycles safe. A `depth`
        column is exposed to the projection.

        Scale shape: frontier-bounded BFS — per round one broadcast
        semi-join of the context against the frontier's destin set
        and one anti-join against the visited accumulator, lineage
        cut with localCheckpoint per round (same pattern as
        connected_components, operators/graph.py).
        """
        if tdef is None or getattr(tdef, "kind", None) != "edge":
            raise BindError("WHILE requires an edge context "
                            "(sql.tex:2518-2554)")
        roles = {p.role: p.name for p in tdef.props if p.role}
        if "origin" not in roles or "destin" not in roles:
            raise BindError("WHILE requires origin/destin roles")
        ocol, dcol = roles["origin"], roles["destin"]
        cond = eb.bind(sel.while_cond)
        base_cols = list(universe.columns)

        frontier = seeds.withColumn("depth", F.lit(0).cast("long"))
        acc = frontier.localCheckpoint(eager=False)
        for d in range(1, max(1, sel.while_depth) + 1):
            heads = (frontier.filter(cond)
                     .select(F.col(dcol).alias("__w_src")).distinct())
            nxt = universe.join(
                F.broadcast(heads),
                F.col(ocol) == F.col("__w_src"), "leftsemi")
            nxt = nxt.join(acc.select(ocol, dcol),
                           on=[ocol, dcol], how="leftanti")
            nxt = (nxt.select(*base_cols)
                   .withColumn("depth", F.lit(d).cast("long"))
                   .localCheckpoint(eager=True))
            if not nxt.take(1):
                break
            acc = acc.unionByName(nxt).localCheckpoint(eager=False)
            frontier = nxt
        col_types.setdefault("depth", "uint")
        return acc

    def _bind_setop(self, node: A.SetOp) -> DataFrame:
        """UNION/INTERSECT/EXCEPT [ALL] — extension. Operands align by
        position (SQL standard); the output carries the left arm's
        column names. Distinct variants use Spark's set operators
        (shuffle on all columns); ALL variants stay shuffle-free for
        union and use (int|exc)ceptAll otherwise."""
        if self.strict:
            raise BindError(
                "strict mode: set operations are an extension the "
                "reference grammar does not accept (SURVEY §2.1)")
        left = self.bind(node.left)
        right = self.bind(node.right)
        if len(left.columns) != len(right.columns):
            raise BindError(
                f"set operands differ in column count "
                f"({len(left.columns)} vs {len(right.columns)})")
        right = right.toDF(*left.columns)
        if node.op == "union":
            out = left.union(right).distinct()
        elif node.op == "union_all":
            out = left.union(right)
        elif node.op == "intersect":
            out = left.intersect(right)
        elif node.op == "intersect_all":
            out = left.intersectAll(right)
        elif node.op == "except":
            out = left.subtract(right)
        else:
            out = left.exceptAll(right)
        if node.order_by:
            def ocol(f):
                c = (ExprBinder({}).bind(f.expr)
                     if isinstance(f, A.OrderItem) else F.col(f.name))
                return c.desc() if f.desc else c.asc()
            out = out.orderBy(*[ocol(f) for f in node.order_by])
        if node.limit is not None:
            out = out.limit(node.limit)
        return out

    # --- general joins (extension) ---------------------------------
    def _bind_general_join(self, df: DataFrame, col_types: dict,
                           qualmap: dict, j: A.GeneralJoin):
        """Bind `[kind] JOIN <ctx | (SELECT ...)> ON <cond>`.

        The right side's columns are prefix-renamed (`alias__col`) so
        both sides resolve unambiguously; unqualified ON references
        resolve left-first, then right. The physical strategy is left
        to Catalyst/AQE — broadcast below the size threshold, shuffle
        hash otherwise — never forced, unlike the documented edge join
        whose vertex side is a dimension by construction."""
        prefix = j.alias or (j.target if isinstance(j.target, str)
                             else None)
        if prefix is None:
            raise BindError("a derived join target needs AS <alias>")
        if prefix in qualmap:
            raise BindError(f"duplicate join alias {prefix!r}")
        if isinstance(j.target, str):
            rdf, rtypes, _ = self.load_context(j.target)
        else:
            rdf, rtypes = self._bind_sub_select(j.target), {}
        if j.kind == "asof":
            return self._bind_asof_join(df, col_types, qualmap, j,
                                        rdf, rtypes, prefix)
        lcols, rcols = set(df.columns), set(rdf.columns)
        renamed = rdf.select(
            *[F.col(c).alias(f"{prefix}__{c}") for c in rdf.columns])

        merged = dict(col_types)
        for c, t in rtypes.items():
            merged.setdefault(f"{prefix}__{c}", t)

        def on_res(q: Optional[str], n: str) -> Column:
            if q is not None:
                if q == prefix or (isinstance(j.target, str)
                                   and q == j.target):
                    return F.col(f"{prefix}__{n}")
                if q in qualmap:
                    p = qualmap[q]
                    return F.col(n if p is None else f"{p}__{n}")
                raise BindError(f"unknown alias {q!r} in JOIN ON")
            if n in lcols:
                return F.col(n)
            if n in rcols:
                return F.col(f"{prefix}__{n}")
            raise BindError(f"unknown column {n!r} in JOIN ON")

        cond = ExprBinder(merged, on_res).bind(j.on)
        _HOW = {"inner": "inner", "left": "left", "right": "right",
                "full": "full", "semi": "left_semi",
                "anti": "left_anti"}
        out = df.join(renamed, cond, _HOW[j.kind])
        if j.kind in ("semi", "anti"):
            # right columns do not survive a semi/anti join
            return out, col_types
        qualmap[prefix] = prefix
        if isinstance(j.target, str):
            qualmap.setdefault(j.target, prefix)
        return out, merged

    def _bind_asof_join(self, df: DataFrame, col_types: dict,
                        qualmap: dict, j: A.GeneralJoin,
                        rdf: DataFrame, rtypes: dict, prefix: str):
        """ASOF JOIN <ref> ON l.k = r.k [AND ...] AND l.ts >= r.ts —
        per left row, the right row with the greatest right-ts at or
        before the left-ts (>=; <= gives the forward variant).
        Left-join semantics: unmatched left rows keep NULL right
        columns.  Bound onto operators.timeseries.asof_join, the
        union-window merge: one key shuffle, no range explosion."""
        from nowdb_spark.operators.timeseries import asof_join

        lcols, rcols = set(df.columns), set(rdf.columns)

        def resolve(f) -> tuple[str, str]:
            """(side, PHYSICAL column name) — left names route through
            qualmap (an earlier join may have prefixed them)."""
            if not isinstance(f, A.Field):
                raise BindError("ASOF JOIN ON accepts plain column "
                                "references only")
            if f.qualifier is not None:
                if f.qualifier == prefix or f.qualifier == j.target:
                    return "r", f.name
                if f.qualifier in qualmap:
                    p = qualmap[f.qualifier]
                    return "l", (f.name if p is None
                                 else f"{p}__{f.name}")
                raise BindError(f"unknown alias {f.qualifier!r} in "
                                "ASOF JOIN ON")
            if f.name in lcols:
                return "l", f.name
            if f.name in rcols:
                return "r", f.name
            raise BindError(f"unknown column {f.name!r} in ASOF JOIN ON")

        keys: list[tuple[str, str]] = []      # (left name, right name)
        ineq = None                           # (lts, rts, direction)
        for conj in _split_conjuncts(j.on):
            if not (isinstance(conj, A.Op) and len(conj.args) == 2):
                raise BindError("ASOF JOIN ON must be a conjunction of "
                                "equalities plus one ts inequality")
            a, b = conj.args
            if conj.name == "=":
                pair = dict([resolve(a), resolve(b)])
                if set(pair) != {"l", "r"}:
                    raise BindError("ASOF JOIN equality must pair one "
                                    "column from each side")
                keys.append((pair["l"], pair["r"]))
            elif conj.name in (">=", "<="):
                if ineq is not None:
                    raise BindError("ASOF JOIN takes exactly one ts "
                                    "inequality")
                (sa, na), (sb, nb) = resolve(a), resolve(b)
                # normalize to left-op-right
                if sa == "l" and sb == "r":
                    op = conj.name
                    lts, rts = na, nb
                elif sa == "r" and sb == "l":
                    op = {">=": "<=", "<=": ">="}[conj.name]
                    lts, rts = nb, na
                else:
                    raise BindError("ASOF JOIN inequality must compare "
                                    "the two sides' stamps")
                ineq = (lts, rts, "backward" if op == ">=" else "forward")
            else:
                raise BindError(f"ASOF JOIN ON does not accept "
                                f"{conj.name!r}")
        if ineq is None:
            raise BindError("ASOF JOIN needs a ts inequality "
                            "(l.ts >= r.ts or l.ts <= r.ts)")
        lts, rts, direction = ineq

        payload = [c for c in rdf.columns
                   if c not in {rk for _, rk in keys} | {rts}]
        r2 = rdf.select(
            *[F.col(rk).alias(lk) for lk, rk in keys],
            F.col(rts).alias(f"{prefix}__{rts}"),
            *[F.col(c).alias(f"{prefix}__{c}") for c in payload])
        out = asof_join(df, r2, [lk for lk, _ in keys],
                        left_ts=lts, right_ts=f"{prefix}__{rts}",
                        direction=direction)
        # right-side key columns re-expose under the alias (NULL when
        # unmatched, like a true left join)
        matched = F.col(f"{prefix}__{rts}").isNotNull()
        for lk, rk in keys:
            out = out.withColumn(f"{prefix}__{rk}",
                                 F.when(matched, F.col(lk)))
        merged = dict(col_types)
        for c, t in rtypes.items():
            merged.setdefault(f"{prefix}__{c}", t)
        qualmap[prefix] = prefix
        if isinstance(j.target, str):
            qualmap.setdefault(j.target, prefix)
        return out, merged

    # --- subqueries (extension) ------------------------------------
    def _bind_sub_select(self, sub: A.Select) -> DataFrame:
        """Bind an uncorrelated subquery with a fresh binder (its
        fields resolve only against its own FROM context)."""
        return SelectBinder(self.spark, self.load_context, None,
                            strict=False).bind(sub)

    def _attach_scalars(self, df: DataFrame, nodes: list,
                        eb: ExprBinder) -> DataFrame:
        """Attach each scalar subquery as a broadcast 1-row crossJoin
        column __sub_k and register it in the expression binder."""
        for node in nodes:
            if id(node) in eb.subq:
                continue
            sub = node.select
            aggs: list = []
            for it in sub.items:
                _collect_aggs(it.expr, aggs)
            single_row = (sub.target is None
                          or sub.limit == 1
                          or (bool(aggs) and not sub.group_by))
            if not single_row:
                raise BindError(
                    "scalar subquery must be statically single-row: a "
                    "global aggregate, a no-FROM select, or LIMIT 1")
            sdf = self._bind_sub_select(sub)
            if len(sdf.columns) != 1:
                raise BindError("scalar subquery must return one column")
            name = f"__sub_{self._sub_n}"
            self._sub_n += 1
            df = df.crossJoin(
                F.broadcast(sdf.select(F.col(sdf.columns[0]).alias(name))))
            eb.subq[id(node)] = F.col(name)
        return df

    def _bind_in_subquery(self, df: DataFrame, node: A.InExpr,
                          eb: ExprBinder) -> DataFrame:
        """x [NOT] IN (SELECT k FROM ...) → left-semi / left-anti join.
        The right side is NOT force-broadcast: a large key set must
        shuffle, a small one gets auto-broadcast by size estimate/AQE.
        NOT IN uses anti-join semantics (a NULL in the subquery result
        does not poison the match, unlike ANSI NOT IN)."""
        sdf = self._bind_sub_select(node.select)
        if len(sdf.columns) != 1:
            raise BindError("IN subquery must return one column")
        name = f"__in_{self._sub_n}"
        self._sub_n += 1
        sub = sdf.select(F.col(sdf.columns[0]).alias(name))
        cond = eb.bind(node.expr) == sub[name]
        return df.join(sub, cond, "left_anti" if node.negated
                       else "left_semi")

    def _bind_exists(self, df: DataFrame, sub: A.Select, eb: ExprBinder,
                     outer_names: set, negated: bool) -> DataFrame:
        """[NOT] EXISTS with equality correlation → semi/anti join.

        The subquery's WHERE is split into correlation conjuncts
        (`<outer_target>.<col> = <sub expr>`) — which become the join
        keys — and residual conjuncts, which filter the subquery
        before the join. The join side projects only the correlation
        expressions, so at scale this shuffles the minimal key set
        (or broadcasts when small — Catalyst/AQE decide)."""
        if sub.group_by or sub.joins or sub.target is None:
            raise BindError(
                "correlated EXISTS supports a plain single-table "
                "subquery")
        corr: list = []
        inner: list = []
        conjs = _split_conjuncts(sub.where) if sub.where is not None \
            else []
        for c in conjs:
            pair = _corr_pair(c, outer_names)
            if pair is not None:
                corr.append(pair)
            else:
                inner.append(c)
        if not corr:
            names = "|".join(sorted(outer_names)) or "<outer>"
            raise BindError(
                "EXISTS subquery must be correlated via "
                f"{names}.<col> = <subquery expr> equality "
                "(uncorrelated existence tests: use IN or a scalar "
                "count subquery)")
        where = None
        for c in inner:
            where = c if where is None else A.Op("and", [where, c])
        items = [A.SelectItem(ie, alias=f"__ek_{i}")
                 for i, (_, ie) in enumerate(corr)]
        sub2 = A.Select(items, sub.target, [], where, [], None, [],
                        None, False)
        sdf = self._bind_sub_select(sub2)
        cond = None
        for i, (outer_field, _) in enumerate(corr):
            c = eb.bind(outer_field) == sdf[f"__ek_{i}"]
            cond = c if cond is None else cond & c
        return df.join(sdf, cond,
                       "left_anti" if negated else "left_semi")

    @staticmethod
    def _item_aggs(expr) -> list:
        out: list = []
        _collect_aggs(expr, out)
        return out

    @staticmethod
    def _apply_pivot(df: DataFrame, sel: A.Select) -> DataFrame:
        """PIVOT/UNPIVOT over the FROM relation (standard semantics:
        part of the FROM clause, applied before WHERE/GROUP/SELECT).

        PIVOT groups by every column that is neither the pivoted key
        nor the aggregated value (ANSI behavior — project the relation
        first, `FROM (SELECT ...) PIVOT ...`, to control the keys);
        Spark's GroupedData.pivot with an EXPLICIT value list keeps
        the plan a single hash aggregation (no distinct-values
        pre-scan) and one shuffle.  UNPIVOT is Spark's melt: ids stay,
        listed columns become (var, value) rows — no shuffle at all.
        """
        if sel.pivot is not None:
            agg_name, value_field, pivot_field, consts = sel.pivot
            builder = AGGREGATES[agg_name]
            keys = [c for c in df.columns
                    if c.lower() not in (value_field.lower(),
                                         pivot_field.lower())]
            return (df.groupBy(*[F.col(c) for c in keys])
                      .pivot(pivot_field, consts)
                      .agg(builder(F.col(value_field))))
        value_col, var_col, fields = sel.unpivot
        ids = [c for c in df.columns
               if c.lower() not in {f.lower() for f in fields}]
        return df.unpivot([F.col(c) for c in ids],
                          [F.col(c) for c in fields],
                          var_col, value_col)

    def _bind_aggregation(self, df: DataFrame, sel: A.Select,
                          eb: ExprBinder) -> DataFrame:
        if self.strict:
            self._validate_strict(sel)

        # GROUP BY expressions (extension): each key gets a stable
        # output name — the field name, a matching select item's
        # alias, or a positional __g_k fallback
        group_names: list[str] = []
        for k, g in enumerate(sel.group_by):
            if isinstance(g, A.Field):
                group_names.append(g.name)
                continue
            alias = next((it.alias for it in sel.items
                          if it.alias and _expr_eq(it.expr, g)), None)
            group_names.append(alias or f"__g_{k}")
        raw_group_cols = [eb.bind(g) for g in sel.group_by]
        group_cols = [c.alias(nm)
                      for c, nm in zip(raw_group_cols, group_names)]

        # collect every Agg node across items (and HAVING, which may
        # filter on aggregates absent from the select list); bind each
        # one once
        agg_nodes: list[A.Agg] = []
        for item in sel.items:
            _collect_aggs(item.expr, agg_nodes)
        if sel.having is not None:
            _collect_aggs(sel.having, agg_nodes)
        # scalar subqueries inside aggregate arguments need their
        # columns attached BEFORE aggregation
        pre_subs: list = []
        for node in agg_nodes:
            _scalar_subs(node.arg, pre_subs)
        df = self._attach_scalars(df, pre_subs, eb)

        agg_cols: dict[int, Column] = {}
        agg_names: dict[int, str] = {}
        for k, node in enumerate(agg_nodes):
            if node.name in ("grouping", "grouping_id"):
                # super-aggregate indicators (only meaningful with
                # ROLLUP/CUBE/GROUPING SETS): computed inside .agg()
                # like any aggregate
                if sel.group_mode is None:
                    raise BindError(f"{node.name}() requires ROLLUP/"
                                    "CUBE/GROUPING SETS")
                if node.name == "grouping":
                    # must reference the EXACT Column object passed to
                    # rollup/cube (alias wrappers shift exprIds and
                    # Spark raises GROUPING_COLUMN_MISMATCH)
                    idx = next((i for i, g in enumerate(sel.group_by)
                                if _expr_eq(g, node.arg)), None)
                    if idx is None:
                        raise BindError(
                            "grouping() argument must be a grouping key")
                    c = F.grouping(raw_group_cols[idx])
                else:
                    c = F.grouping_id()
                nm = f"__agg_{k}"
                agg_cols[id(node)] = c.cast("long")
                agg_names[id(node)] = nm
                continue
            builder = AGGREGATES[node.name]
            inner = eb.bind(node.arg) if node.arg is not None else None
            if node.distinct:
                # count/sum(DISTINCT x) — extension; exact (expands to
                # a distinct-shuffle; use approx_count_distinct for
                # the sketch-merge scale path)
                if node.name == "count":
                    c = F.count_distinct(inner)
                elif node.name == "sum":
                    c = F.sum_distinct(inner)
                else:
                    raise BindError(
                        "DISTINCT is supported for count/sum only")
            else:
                c = builder(inner) if node.arg is not None else builder()
            nm = f"__agg_{k}"
            agg_cols[id(node)] = c
            agg_names[id(node)] = nm

        if not agg_nodes:
            if sel.group_mode:
                raise BindError("ROLLUP/CUBE/GROUPING SETS require at "
                                "least one aggregate in the select list")
            # GROUP BY without aggregates = keys-only distinct scan
            # (the reference's KRANGE reader, qplan/plan.c:1620-1628)
            agged = df.select(*group_cols).distinct()
        else:
            if sel.group_mode == "rollup":
                gdf = df.rollup(*raw_group_cols)
            elif sel.group_mode == "cube":
                gdf = df.cube(*raw_group_cols)
            elif sel.group_mode == "sets":
                # map each explicit set to its bound key columns (the
                # union list group_by/raw cols is position-aligned)
                sets_cols = [[raw_group_cols[next(
                    i for i, g in enumerate(sel.group_by)
                    if _expr_eq(g, e))] for e in s]
                    for s in sel.grouping_sets]
                gdf = df.groupingSets(sets_cols, *raw_group_cols)
            elif sel.group_by:
                gdf = df.groupBy(*group_cols)
            else:
                gdf = df.groupBy()
            agged = gdf.agg(*[agg_cols[id(n)].alias(agg_names[id(n)])
                              for n in agg_nodes])
            if sel.group_mode:
                # keys were passed UNALIASED (grouping() must see the
                # identical Column); the agg output is grouping keys
                # in order then agg columns — rename positionally
                agged = agged.toDF(*group_names,
                                   *[agg_names[id(n)] for n in agg_nodes])

        # scalar subqueries outside aggregates (select items / HAVING)
        # are constant per query — attach them to the aggregated frame
        post_subs: list = []
        for item in sel.items:
            _scalar_subs(item.expr, post_subs, into_aggs=False)
        _scalar_subs(sel.having, post_subs, into_aggs=False)
        agged = self._attach_scalars(agged, post_subs, eb)

        # rebind the select items on top of the aggregated frame:
        # Agg nodes become references to the pre-computed __agg_k cols
        def rebind(node, i) -> Column:
            # a select item (or subtree) that IS a group key refers to
            # the pre-computed key column
            for g, nm in zip(sel.group_by, group_names):
                if _expr_eq(node, g):
                    return F.col(nm)
            if isinstance(node, A.Agg):
                return F.col(agg_names[id(node)])
            if isinstance(node, A.ScalarSubquery):
                return eb.subq[id(node)]
            if isinstance(node, A.Field):
                return F.col(node.name)
            if isinstance(node, A.Const):
                return F.lit(node.value)
            if isinstance(node, A.Op):
                if node.name == "round" and len(node.args) == 2:
                    return _round2(rebind(node.args[0], i), node.args[1])
                arity, fn = SCALAR_OPS[node.name] if node.name in SCALAR_OPS \
                    else (None, None)
                if node.name in _CMP_OPS:
                    return _apply_cmp(node.name, rebind(node.args[0], i),
                                      rebind(node.args[1], i))
                if node.name in _BOOL_OPS:
                    args = [rebind(a, i) for a in node.args]
                    return (args[0] & args[1] if node.name == "and"
                            else args[0] | args[1] if node.name == "or"
                            else ~args[0])
                if fn is None:
                    raise BindError(f"unknown function {node.name!r}")
                return fn(*[rebind(a, i) for a in node.args])
            if isinstance(node, A.CaseExpr):
                out = None
                for c, t in node.whens:
                    cc, tc = rebind(c, i), rebind(t, i)
                    out = F.when(cc, tc) if out is None else out.when(cc, tc)
                return out.otherwise(rebind(node.else_, i)) \
                    if node.else_ is not None else out
            if isinstance(node, A.IsNull):
                c = rebind(node.expr, i)
                return c.isNotNull() if node.negated else c.isNull()
            if isinstance(node, A.InExpr):
                return rebind(node.expr, i).isin(
                    [v.value for v in node.values])
            raise BindError(f"cannot rebind {node!r}")

        if sel.having is not None:
            # post-aggregation filter over group keys / bound aggs
            agged = agged.filter(rebind(sel.having, 0))

        cols = []
        for i, item in enumerate(sel.items):
            cols.append(rebind(item.expr, i)
                        .alias(item.alias or _expr_name(item.expr, i)))
        return agged.select(*cols)

    @staticmethod
    def _validate_strict(sel: A.Select) -> None:
        """Reference rule: select list must be the group keys in order,
        then only aggregates (doc/manual/sql.tex:2659-2697)."""
        if sel.group_mode is not None:
            raise BindError(
                "strict mode: ROLLUP/CUBE/GROUPING SETS are an "
                "extension (the reference grammar has flat GROUP BY "
                "only, sql/nowdbsql.y)")
        if any(not isinstance(g, A.Field) for g in sel.group_by):
            raise BindError(
                "strict mode: GROUP BY accepts field names only "
                "(expression keys are an extension, SURVEY §2.1)")
        keys = [g.name for g in sel.group_by]
        for i, item in enumerate(sel.items):
            if i < len(keys):
                if not (isinstance(item.expr, A.Field)
                        and item.expr.name == keys[i]):
                    raise BindError(
                        "strict mode: select list must start with the "
                        "group keys in order (sql.tex:2659-2697)")
            else:
                aggs: list = []
                _collect_aggs(item.expr, aggs)
                if not aggs:
                    raise BindError(
                        "strict mode: non-aggregate column after group "
                        "keys (sql.tex:2659-2697)")


def _order_col(f, sel: A.Select, df: DataFrame) -> Column:
    """Bare field → output column. OrderItem expression (extension):
    structurally matching select item → its output column (covers
    `ORDER BY count(*) DESC`); otherwise the expression binds over the
    projected frame's columns."""
    if isinstance(f, A.Field):
        return F.col(f.name).desc() if f.desc else F.col(f.name).asc()
    for i, it in enumerate(sel.items):
        if _expr_eq(it.expr, f.expr):
            c = F.col(it.alias or _expr_name(it.expr, i))
            return c.desc() if f.desc else c.asc()
    c = ExprBinder({}).bind(f.expr)
    return c.desc() if f.desc else c.asc()
