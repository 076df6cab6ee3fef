"""AST nodes for the nowdb SQL dialect (reference: sql/ast.h node
kinds; here plain dataclasses, one per statement class of
nowdbsql.y:215-223 — DDL, DLL, DML, DQL, misc)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


# --- expressions ---------------------------------------------------

@dataclass
class Const:
    value: object          # python int/float/str/bool/None
    type: str              # 'int' | 'float' | 'string' | 'bool' | 'null'


@dataclass
class Field:
    name: str
    qualifier: Optional[str] = None   # alias in joins: a.field
    desc: bool = False                # ORDER BY direction (extension)


@dataclass
class Op:
    """Scalar operator or function call."""
    name: str
    args: list


@dataclass
class Agg:
    """Aggregate call (fun/fun.c names)."""
    name: str
    arg: Optional[object]  # None for count(*)
    distinct: bool = False  # count/sum(DISTINCT x) — extension


@dataclass
class CaseExpr:
    whens: list            # [(cond_expr, then_expr), ...]
    else_: Optional[object]


@dataclass
class InExpr:
    expr: object
    values: list           # list of Const
    select: Optional[object] = None   # IN (SELECT ...) — extension
    negated: bool = False             # NOT IN — extension


@dataclass
class ExistsExpr:
    """[NOT] EXISTS (SELECT ... WHERE outer.col = subcol ...) —
    extension. Must be correlated through one or more equality
    conjuncts whose outer side is qualified with the outer FROM
    context's name; bound as a semi/anti join (NOT via Op('not'))."""
    select: object


@dataclass
class ScalarSubquery:
    """(SELECT ...) in expression position — extension. Must be
    uncorrelated and statically single-row (a global aggregate, a
    no-FROM select, or LIMIT 1); bound as a broadcast crossJoin."""
    select: object


@dataclass
class IsNull:
    expr: object
    negated: bool


@dataclass
class WindowExpr:
    """fn(args) OVER ([PARTITION BY ...] [ORDER BY ...] [ROWS ...]) —
    extension (the reference grammar has no window functions; bound to
    pyspark.sql.Window)."""
    name: str                       # window/aggregate function name
    args: list                      # bound per-function
    partition_by: list              # [Field]
    order_by: list                  # [Field] (desc honored)
    # frame: (start, end) where each bound is an int offset
    # (negative = preceding), or None for UNBOUNDED in that direction;
    # the whole attribute is None when no frame clause was given
    frame: Optional[tuple] = None
    # 'rows' (physical offsets) or 'range' (value offsets over ONE
    # numeric order key — the time-window frame for ns stamps)
    frame_mode: str = "rows"


# --- projections / select ------------------------------------------

@dataclass
class SelectItem:
    expr: object
    alias: Optional[str] = None


@dataclass
class OrderItem:
    """ORDER BY <expression> [ASC|DESC] — extension (bare fields stay
    plain Field nodes; expression keys get this wrapper)."""
    expr: object
    desc: bool = False


@dataclass
class JoinClause:
    """Documented nowdb join (sql.tex:2293-2368): join <vertex> on
    origin|destin [as alias] — always inner against the vertex PK."""
    vertex: str
    on: str                # 'origin' | 'destin'
    alias: Optional[str] = None


@dataclass
class GeneralJoin:
    """[INNER|LEFT|RIGHT|FULL|SEMI|ANTI] JOIN <context | (SELECT ...)>
    [AS alias] ON <condition> — extension. The reference's only join
    form is the edge→vertex origin/destin join (JoinClause above);
    this is the unrestricted equi/theta join over any two frames."""
    target: object         # str (context name) | Select | SetOp (derived)
    kind: str              # inner|left|right|full|semi|anti
    on: object             # boolean expression AST
    alias: Optional[str] = None


@dataclass
class SetOp:
    """select UNION [ALL] | INTERSECT [ALL] | EXCEPT [ALL] select —
    extension (left-associative chain; trailing ORDER BY/LIMIT apply
    to the whole result). Operands align by position."""
    op: str                # union|union_all|intersect|intersect_all|...
    left: object           # Select | SetOp
    right: object          # Select
    order_by: list = field(default_factory=list)
    limit: Optional[int] = None


@dataclass
class Select:
    items: list                      # [SelectItem]
    # context name; None = no FROM; a Select/SetOp node = derived
    # table `FROM (SELECT ...)` (extension)
    target: Optional[object] = None
    joins: list = field(default_factory=list)
    where: Optional[object] = None
    group_by: list = field(default_factory=list)   # [Field]
    having: Optional[object] = None                # extension
    order_by: list = field(default_factory=list)   # [Field]
    limit: Optional[int] = None                    # extension
    distinct: bool = False                         # extension
    target_alias: Optional[str] = None             # FROM t AS a (ext.)
    qualify: Optional[object] = None               # extension (post-
    # projection filter over output columns, e.g. window ranks)
    # WHILE <cond> [DEPTH <n>] — the reference's designed-only
    # traversal clause (sql.tex:2518-2554): WHERE seeds the start
    # edges, traversal follows destin→origin links through the whole
    # edge context, expanding every reached edge that satisfies the
    # condition (violating edges are terminal but included), bounded
    # by DEPTH, cycle-safe
    while_cond: Optional[object] = None
    while_depth: int = 10
    # multi-dimensional grouping (extension): 'rollup' | 'cube' |
    # 'sets'; for 'sets', grouping_sets holds the explicit set lists
    # and group_by the union of their keys in first-appearance order
    group_mode: Optional[str] = None
    grouping_sets: list = field(default_factory=list)
    # relational pivot (extension):
    #   pivot   = (agg_name, value_field, pivot_field, [consts])
    #   unpivot = (value_col, var_col, [field names])
    # applied to the FROM relation before WHERE/GROUP/SELECT
    pivot: Optional[tuple] = None
    unpivot: Optional[tuple] = None


# --- DDL -----------------------------------------------------------

@dataclass
class PropDef:
    name: str
    type: str              # text|date|time|float|int|uint|bool
    pk: bool = False
    inc: bool = False
    stamp: bool = False
    role: Optional[str] = None  # 'origin' | 'destin' for edges


@dataclass
class CreateScope:
    name: str
    if_not_exists: bool = False


@dataclass
class DropScope:
    name: str
    if_exists: bool = False


@dataclass
class UseScope:
    name: str


@dataclass
class CreateType:
    name: str
    props: list            # [PropDef]
    storage: Optional[str] = None
    if_not_exists: bool = False


@dataclass
class CreateTypeAs:
    """CREATE TYPE name AS select — CTAS extension (the reference
    creates empty typed contexts only): props inferred from the bound
    select's schema, rows materialized into the new context."""
    name: str
    select: object
    if_not_exists: bool = False


@dataclass
class CreateEdge:
    name: str
    props: list            # [PropDef] incl. origin/destin/stamp roles
    storage: Optional[str] = None
    if_not_exists: bool = False


@dataclass
class CreateView:
    """CREATE VIEW name AS select — extension (the reference has no
    views); the select TEXT is persisted in the catalog and re-bound
    on every read, so views compose and survive engine restarts."""
    name: str
    text: str              # raw select SQL (persisted)
    select: object         # parsed Select (validated at CREATE time)
    if_not_exists: bool = False


@dataclass
class CreateIndex:
    name: str
    target: str
    fields: list
    if_not_exists: bool = False


@dataclass
class CreateStorage:
    name: str
    options: dict
    if_not_exists: bool = False


@dataclass
class CreateProcedure:
    module: str
    name: str
    language: str
    args: list             # [(name, type)]
    if_not_exists: bool = False


@dataclass
class CreateLock:
    name: str
    if_not_exists: bool = False


@dataclass
class DropObject:
    kind: str              # 'type' | 'edge' | 'index' | 'storage' | ...
    name: str
    if_exists: bool = False


@dataclass
class Show:
    what: str              # 'types' | 'edges' | 'procs' | ...


@dataclass
class Desc:
    name: str


# --- DML / DLL -----------------------------------------------------

@dataclass
class Insert:
    target: str
    fields: Optional[list]   # None = positional
    values: list             # [expr]; empty when select is set
    select: Optional[object] = None   # INSERT ... SELECT (extension)
    more: Optional[list] = None       # extra VALUES tuples (extension:
    # multi-row insert — the reference grammar takes one tuple)


@dataclass
class Update:
    target: str
    assignments: list      # [(field, expr)]
    where: Optional[object] = None


@dataclass
class Delete:
    target: str
    where: Optional[object] = None


@dataclass
class Merge:
    """MERGE INTO target USING source ON key — extension (the
    reference has no upsert; Delta-style join rewrite on parquet)."""
    target: str
    source: str
    key: str
    matched_action: Optional[str] = None   # 'update' | 'delete' | None
    assignments: list = None               # [(field, expr)] for update
    insert_unmatched: bool = False


@dataclass
class Load:
    path: str
    target: str
    header: Optional[str] = None    # 'use' | 'ignore' | None
    as_type: Optional[str] = None   # AS <type> / AS EDGE <name>
    as_kind: Optional[str] = None   # 'type' | 'edge'
    errors: Optional[str] = None


@dataclass
class CopyStmt:
    """COPY <context> TO 'path' | COPY (SELECT ...) TO 'path' —
    export sink extension (the reference has no export statement);
    format from the path extension: parquet | csv | json."""
    source: object         # str context name | Select node
    path: str


# --- misc ----------------------------------------------------------

@dataclass
class Explain:
    select: object         # Select node


@dataclass
class ExecProc:
    name: str              # module.name or name
    args: list             # [Const]


@dataclass
class LockStmt:
    name: str
    mode: Optional[str] = None      # 'reading' | 'writing'
    timeout_ms: Optional[int] = None


@dataclass
class UnlockStmt:
    name: str


@dataclass
class FetchStmt:
    cursor_id: str
    n: Optional[int] = None


@dataclass
class CloseStmt:
    cursor_id: str
