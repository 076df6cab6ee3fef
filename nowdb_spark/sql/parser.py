"""Recursive-descent parser for the nowdb SQL dialect.

Statement surface per reference grammar sql/nowdbsql.y:215-223;
expression precedence per nowdbsql.y:843-855:
    OR < AND < NOT < IS < EQ/NE < GT/LE/LT/GE < IN < +/- < * / % < ^
"""

from __future__ import annotations

from nowdb_spark.functions.aggregates import AGGREGATES
from nowdb_spark.sql import ast as A
from nowdb_spark.sql.lexer import Token, tokenize


class ParseError(ValueError):
    pass


_TYPE_KWS = {"text", "date", "time", "float", "int", "uint", "bool",
             "longtext", "timestamp"}

# sizing prefixes (reference storage.c:261-302 file-size presets)
_SIZING_KWS = {"tiny", "small", "medium", "big", "large", "huge"}

# keywords that may double as identifiers (column/object names)
_IDENTISH_KWS = _TYPE_KWS | _SIZING_KWS | {
    "origin", "destin", "stamp", "key", "values",
    "language", "errors", "header", "storage",
    "vertex", "type", "edge", "index", "depth",
    # grouping(x)/grouping_id() remain callable, and all four stay
    # legal as plain column names
    "rollup", "cube", "grouping", "sets", "pivot", "unpivot", "asof",
    "range"}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks: list[Token] = tokenize(text)
        self.i = 0

    # --- token helpers --------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.value in kws

    def at_sym(self, *syms: str) -> bool:
        t = self.peek()
        return t.kind == "SYM" and t.value in syms

    def eat_kw(self, *kws: str) -> str:
        if not self.at_kw(*kws):
            raise ParseError(f"expected {'/'.join(kws).upper()}, "
                             f"got {self.peek()}")
        return self.next().value

    def eat_sym(self, sym: str) -> None:
        if not self.at_sym(sym):
            raise ParseError(f"expected {sym!r}, got {self.peek()}")
        self.next()

    def try_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def ident(self) -> str:
        t = self.peek()
        if t.kind == "IDENT" or (t.kind == "KW" and t.value in _IDENTISH_KWS):
            self.next()
            return t.value
        raise ParseError(f"expected identifier, got {t}")

    def const_value(self):
        """One literal: string/int/float/true/false (PIVOT IN lists)."""
        t = self.next()
        if t.kind == "STRING":
            return t.value
        if t.kind == "INT":
            return int(t.value)
        if t.kind == "FLOAT":
            return float(t.value)
        if t.kind == "KW" and t.value in ("true", "false"):
            return t.value == "true"
        raise ParseError(f"expected literal, got {t}")

    # --- entry -----------------------------------------------------
    def parse(self):
        stmt = self.statement()
        # trailing IF NOT EXISTS binds to the whole create clause in
        # the reference grammar (nowdbsql.y:232: `ddl ::= create_clause
        # IF NOT EXISTS`) — the head-position form is kept as well
        if self.at_kw("if") and hasattr(stmt, "if_not_exists"):
            self.next()
            self.eat_kw("not")
            self.eat_kw("exists")
            stmt.if_not_exists = True
        if self.at_sym(";"):
            self.next()
        if self.peek().kind != "EOF":
            raise ParseError(f"trailing input at {self.peek()}")
        return stmt

    def statement(self):
        t = self.peek()
        if t.kind != "KW":
            raise ParseError(f"expected statement, got {t}")
        if t.value == "create":
            return self.create_stmt()
        if t.value == "drop":
            return self.drop_stmt()
        if t.value == "use":
            self.next()
            return A.UseScope(self.ident())
        if t.value == "show":
            self.next()
            return A.Show(self.next().value.lower())
        if t.value in ("desc", "describe"):
            self.next()
            return A.Desc(self.ident())
        if t.value == "select":
            return self.select_stmt()
        if t.value == "explain":
            self.next()
            return A.Explain(self.select_stmt())
        if t.value == "insert":
            return self.insert_stmt()
        if t.value == "load":
            return self.load_stmt()
        if t.value == "update":
            return self.update_stmt()
        if t.value == "delete":
            return self.delete_stmt()
        if t.value == "merge":
            return self.merge_stmt()
        if t.value == "copy":
            return self.copy_stmt()
        if t.value in ("exec", "execute"):
            return self.exec_stmt()
        if t.value == "fetch":
            self.next()
            cid = self.next().value
            n = None
            if self.try_kw("limit"):
                n = int(self.next().value)
            return A.FetchStmt(str(cid), n)
        if t.value == "close":
            self.next()
            return A.CloseStmt(str(self.next().value))
        if t.value == "lock":
            return self.lock_stmt()
        if t.value == "unlock":
            self.next()
            return A.UnlockStmt(self.ident())
        raise ParseError(f"unsupported statement {t.value!r}")

    # --- DDL -------------------------------------------------------
    def if_not_exists(self) -> bool:
        if self.at_kw("if"):
            self.next()
            self.eat_kw("not")
            self.eat_kw("exists")
            return True
        return False

    def create_stmt(self):
        self.eat_kw("create")
        kw = self.next()
        if kw.kind != "KW":
            raise ParseError(f"expected object kind, got {kw}")
        kind = kw.value
        sizing = None
        if kind in _SIZING_KWS:
            # CREATE <sizing> STORAGE|INDEX (nowdbsql.y:409-430,668-696)
            sizing = kind
            kw = self.next()
            if kw.kind != "KW" or kw.value not in ("storage", "index"):
                raise ParseError(
                    f"sizing {sizing.upper()} applies to STORAGE or "
                    f"INDEX, got {kw}")
            kind = kw.value
        if kind in ("scope", "schema", "database"):
            ine = self.if_not_exists()
            return A.CreateScope(self.ident(), ine)
        if kind == "storage":
            ine = self.if_not_exists()
            name = self.ident()
            opts = {} if sizing is None else {"size": sizing}
            if self.try_kw("set"):
                while True:
                    k = self.ident()
                    self.eat_sym("=")
                    v = self.next().value
                    opts[k.lower()] = v
                    if not self.at_sym(","):
                        break
                    self.next()
            return A.CreateStorage(name, opts, ine)
        if kind == "type":
            ine = self.if_not_exists()
            name = self.ident()
            if self.try_kw("as"):
                # CTAS extension: schema inferred from the select
                return A.CreateTypeAs(name, self.select_stmt(), ine)
            props = self.prop_defs(edge=False)
            storage = self.storage_clause()
            return A.CreateType(name, props, storage, ine)
        if kind == "edge":
            ine = self.if_not_exists()
            name = self.ident()
            props = self.prop_defs(edge=True)
            storage = self.storage_clause()
            return A.CreateEdge(name, props, storage, ine)
        if kind == "index":
            ine = self.if_not_exists()
            name = self.ident()
            self.eat_kw("on")
            target = self.ident()
            self.eat_sym("(")
            fields = [self.ident()]
            while self.at_sym(","):
                self.next()
                fields.append(self.ident())
            self.eat_sym(")")
            return A.CreateIndex(name, target, fields, ine)
        if kind in ("procedure", "proc"):
            ine = self.if_not_exists()
            mod = self.ident()
            name = None
            if self.at_sym("."):
                self.next()
                name = self.ident()
            else:
                mod, name = None, mod
            args = []
            if self.at_sym("("):
                self.next()
                while not self.at_sym(")"):
                    pname = self.ident()
                    ptype = self.next().value
                    args.append((pname, ptype))
                    if self.at_sym(","):
                        self.next()
                self.eat_sym(")")
            self.eat_kw("language")
            lang = self.ident().lower()
            return A.CreateProcedure(mod, name, lang, args, ine)
        if kind == "lock":
            ine = self.if_not_exists()
            return A.CreateLock(self.ident(), ine)
        if kind == "view":
            ine = self.if_not_exists()
            name = self.ident()
            self.eat_kw("as")
            start = self.peek().pos
            sel = self.select_stmt()
            t = self.peek()
            end = t.pos if t.kind != "EOF" else len(self.text)
            body = self.text[start:end].strip().rstrip(";").strip()
            return A.CreateView(name, body, sel, ine)
        raise ParseError(f"cannot CREATE {kind!r}")

    def storage_clause(self):
        if self.at_kw("storage"):
            self.next()
            self.eat_sym("=")
            return self.ident()
        return None

    def prop_defs(self, edge: bool) -> list:
        self.eat_sym("(")
        props = []
        while True:
            pname = self.ident()
            ptype = None
            role = None
            pk = inc = stamp = False
            # type may be omitted for role-typed edge endpoints
            if self.at_kw(*_TYPE_KWS):
                ptype = self.next().value
            elif self.peek().kind == "IDENT":
                ptype = self.next().value   # vertex-type reference (edge)
            if ptype == "timestamp":        # `field timestamp` shorthand
                ptype, stamp = "time", True
            while True:
                if self.at_kw("pk"):
                    self.next()
                    pk = True
                elif self.at_kw("primary"):
                    self.next()
                    self.eat_kw("key")
                    pk = True
                elif self.at_kw("inc", "increment"):
                    self.next()
                    inc = True
                elif self.at_kw("timestamp", "stamp"):
                    self.next()
                    stamp = True
                elif edge and self.at_kw("origin"):
                    self.next()
                    role = "origin"
                elif edge and self.at_kw("destin", "destination"):
                    self.next()
                    role = "destin"
                else:
                    break
            props.append(A.PropDef(pname, ptype or "text", pk, inc, stamp, role))
            if self.at_sym(","):
                self.next()
                continue
            break
        self.eat_sym(")")
        return props

    def drop_stmt(self):
        self.eat_kw("drop")
        kw = self.next()
        kind = kw.value if kw.kind == "KW" else kw.value.lower()
        if kind in ("scope", "schema", "database"):
            name = self.ident()
            ie = self.if_exists()
            return A.DropScope(name, ie)
        name = self.ident()
        ie = self.if_exists()
        return A.DropObject(kind, name, ie)

    def if_exists(self) -> bool:
        if self.at_kw("if"):
            self.next()
            self.eat_kw("exists")
            return True
        return False

    # --- DML / DLL -------------------------------------------------
    def insert_stmt(self):
        self.eat_kw("insert")
        self.eat_kw("into")
        target = self.ident()
        fields = None
        if self.at_sym("("):
            self.next()
            fields = [self.ident()]
            while self.at_sym(","):
                self.next()
                fields.append(self.ident())
            self.eat_sym(")")
        if self.at_kw("select"):
            # INSERT INTO t [(fields)] SELECT ... (extension; the
            # reference only has VALUES)
            return A.Insert(target, fields, [], self.select_stmt())
        # VALUES is optional after a field list: `insert into t (a, b)
        # (1, 2)` (nowdbsql.y:303-305)
        if not (fields is not None and self.at_sym("(")):
            self.eat_kw("values")

        def tuple_():
            self.eat_sym("(")
            row = [self.expr()]
            while self.at_sym(","):
                self.next()
                row.append(self.expr())
            self.eat_sym(")")
            return row

        values = tuple_()
        more = []
        while self.at_sym(","):       # multi-row VALUES (extension)
            self.next()
            more.append(tuple_())
        return A.Insert(target, fields, values, more=more or None)

    def update_stmt(self):
        # the reference designs UPDATE but stubs it
        # (doc/manual/sql.tex:1987-2035); implemented here
        self.eat_kw("update")
        target = self.ident()
        self.eat_kw("set")
        assignments = []
        while True:
            f = self.ident()
            self.eat_sym("=")
            assignments.append((f, self.expr()))
            if not self.at_sym(","):
                break
            self.next()
        where = self.expr() if self.try_kw("where") else None
        return A.Update(target, assignments, where)

    def delete_stmt(self):
        self.eat_kw("delete")
        self.eat_kw("from")
        target = self.ident()
        where = self.expr() if self.try_kw("where") else None
        return A.Delete(target, where)

    def merge_stmt(self):
        # extension: MERGE INTO t USING s ON key
        #   [WHEN MATCHED THEN UPDATE SET f = expr, ... | DELETE]
        #   [WHEN NOT MATCHED THEN INSERT]
        # assignment expressions resolve against the SOURCE row
        self.eat_kw("merge")
        self.eat_kw("into")
        target = self.ident()
        self.eat_kw("using")
        source = self.ident()
        self.eat_kw("on")
        key = self.ident()
        matched_action = None
        assignments: list = []
        insert_unmatched = False
        saw_clause = False
        while self.at_kw("when"):
            saw_clause = True
            self.next()
            if self.try_kw("not"):
                self.eat_kw("matched")
                self.eat_kw("then")
                self.eat_kw("insert")
                insert_unmatched = True
                continue
            self.eat_kw("matched")
            self.eat_kw("then")
            if self.try_kw("delete"):
                matched_action = "delete"
                continue
            self.eat_kw("update")
            self.eat_kw("set")
            matched_action = "update"
            while True:
                f = self.ident()
                self.eat_sym("=")
                assignments.append((f, self.expr()))
                if not self.at_sym(","):
                    break
                self.next()
        if not saw_clause:
            raise ParseError("MERGE needs at least one WHEN clause")
        return A.Merge(target, source, key, matched_action,
                       assignments, insert_unmatched)

    def copy_stmt(self):
        """COPY <context> TO 'path' | COPY (SELECT ...) TO 'path' —
        export extension; format from the path extension."""
        self.eat_kw("copy")
        if self.at_sym("("):
            self.next()
            source = self.select_stmt()
            self.eat_sym(")")
        else:
            source = self.ident()
        self.eat_kw("to")
        t = self.next()
        if t.kind != "STRING":
            raise ParseError(f"expected path string, got {t}")
        return A.CopyStmt(source, t.value)

    def load_stmt(self):
        self.eat_kw("load")
        t = self.next()
        if t.kind != "STRING":
            raise ParseError("LOAD expects a quoted file path")
        path = t.value
        self.eat_kw("into")
        target = self.ident()
        header = None
        as_type = as_kind = errors = None
        while True:
            if self.at_kw("ignore"):
                self.next()
                self.eat_kw("header")
                header = "ignore"
            elif self.at_kw("use"):
                self.next()
                self.eat_kw("header")
                header = "use"
            elif self.at_kw("as"):
                self.next()
                if self.at_kw("edge"):
                    self.next()
                    as_kind = "edge"
                    as_type = self.ident()
                else:
                    as_kind = "type"
                    as_type = self.ident()
            elif self.at_kw("set"):
                self.next()
                k = self.ident().lower()
                self.eat_sym("=")
                v = self.next()
                if k == "errors":
                    errors = v.value
            else:
                break
        return A.Load(path, target, header, as_type, as_kind, errors)

    def exec_stmt(self):
        self.next()  # exec/execute
        name = self.ident()
        if self.at_sym("."):
            self.next()
            name = f"{name}.{self.ident()}"
        args = []
        if self.at_sym("("):
            self.next()
            while not self.at_sym(")"):
                args.append(self.expr())
                if self.at_sym(","):
                    self.next()
            self.eat_sym(")")
        return A.ExecProc(name, args)

    def lock_stmt(self):
        self.eat_kw("lock")
        name = self.ident()
        mode = None
        timeout = None
        if self.try_kw("for"):
            mode = self.eat_kw("reading", "writing")
        if self.try_kw("set"):
            self.eat_kw("timeout")
            self.eat_sym("=")
            timeout = int(self.next().value)
        return A.LockStmt(name, mode, timeout)

    # --- DQL -------------------------------------------------------
    def select_stmt(self):
        """One select, or a set-operation chain (extension): trailing
        ORDER BY/LIMIT bind to the whole chain, SQL-standard style."""
        sel = self.select_core()
        if not self.at_kw("union", "intersect", "except"):
            self._order_limit_into(sel)
            return sel
        node = sel
        while self.at_kw("union", "intersect", "except"):
            op = self.next().value
            if self.try_kw("all"):
                op += "_all"
            node = A.SetOp(op, node, self.select_core())
        self._order_limit_into(node)
        return node

    def _order_limit_into(self, node) -> None:
        if self.at_kw("order"):
            self.next()
            self.eat_kw("by")
            node.order_by = [self.order_ref()]
            while self.at_sym(","):
                self.next()
                node.order_by.append(self.order_ref())
        if self.try_kw("limit"):
            node.limit = int(self.next().value)

    def select_core(self):
        self.eat_kw("select")
        distinct = bool(self.try_kw("distinct"))
        items = [self.select_item()]
        while self.at_sym(","):
            self.next()
            items.append(self.select_item())
        target = None
        joins: list = []
        where = None
        group_by: list = []
        order_by: list = []
        limit = None
        target_alias = None
        pivot = unpivot = None
        if self.try_kw("from"):
            target, target_alias = self.table_ref()
            if self.try_kw("pivot"):
                # PIVOT ( agg(value_col) FOR key_col IN (c1, c2, ...) )
                self.eat_sym("(")
                agg_name = self.ident().lower()
                if agg_name not in AGGREGATES:
                    raise ParseError(f"PIVOT aggregate {agg_name!r} "
                                     "unknown")
                self.eat_sym("(")
                value_field = self.ident()
                self.eat_sym(")")
                self.eat_kw("for")
                pivot_field = self.ident()
                self.eat_kw("in")
                self.eat_sym("(")
                consts = [self.const_value()]
                while self.at_sym(","):
                    self.next()
                    consts.append(self.const_value())
                self.eat_sym(")")
                self.eat_sym(")")
                pivot = (agg_name, value_field, pivot_field, consts)
            elif self.try_kw("unpivot"):
                # UNPIVOT ( value_col FOR var_col IN (f1, f2, ...) )
                self.eat_sym("(")
                value_col = self.ident()
                self.eat_kw("for")
                var_col = self.ident()
                self.eat_kw("in")
                self.eat_sym("(")
                fields = [self.ident()]
                while self.at_sym(","):
                    self.next()
                    fields.append(self.ident())
                self.eat_sym(")")
                self.eat_sym(")")
                unpivot = (value_col, var_col, fields)
            while self.at_kw("join", "inner", "left", "right", "full",
                             "semi", "anti", "asof"):
                joins.append(self.join_clause())
        if self.try_kw("where"):
            where = self.expr()
        while_cond = None
        while_depth = 10
        if self.try_kw("while"):
            while_cond = self.expr()
            if self.try_kw("depth"):
                while_depth = int(self.next().value)
        having = None
        group_mode = None
        grouping_sets: list = []
        if self.at_kw("group"):
            self.next()
            self.eat_kw("by")
            if (self.at_kw("rollup", "cube")
                    and self.peek(1).kind == "SYM"
                    and self.peek(1).value == "("):
                group_mode = self.next().value
                self.eat_sym("(")
                group_by = [self.expr()]
                while self.at_sym(","):
                    self.next()
                    group_by.append(self.expr())
                self.eat_sym(")")
            elif (self.at_kw("grouping")
                    and self.peek(1).kind == "KW"
                    and self.peek(1).value == "sets"):
                self.next()
                self.next()
                group_mode = "sets"
                self.eat_sym("(")
                while True:
                    self.eat_sym("(")
                    s: list = []
                    if not self.at_sym(")"):
                        s = [self.expr()]
                        while self.at_sym(","):
                            self.next()
                            s.append(self.expr())
                    self.eat_sym(")")
                    grouping_sets.append(s)
                    if self.at_sym(","):
                        self.next()
                        continue
                    break
                self.eat_sym(")")
                # union of set keys, first-appearance order (dataclass
                # equality deduplicates structurally identical exprs)
                for s in grouping_sets:
                    for e in s:
                        if e not in group_by:
                            group_by.append(e)
            else:
                # expressions allowed (extension; the reference
                # grammar only accepts field lists — strict mode
                # re-imposes that)
                group_by = [self.expr()]
                while self.at_sym(","):
                    self.next()
                    group_by.append(self.expr())
            if self.try_kw("having"):
                having = self.expr()
        qualify = None
        if self.try_kw("qualify"):
            qualify = self.expr()
        # ORDER BY / LIMIT are attached by select_stmt (they bind to
        # the whole chain when set operations follow)
        return A.Select(items, target, joins, where, group_by,
                        having, order_by, limit, distinct,
                        target_alias=target_alias, qualify=qualify,
                        while_cond=while_cond, while_depth=while_depth,
                        group_mode=group_mode,
                        grouping_sets=grouping_sets,
                        pivot=pivot, unpivot=unpivot)

    def table_ref(self):
        """Context name or `(SELECT ...)` derived table (extension),
        each with an optional `AS alias`."""
        if self.at_sym("("):
            self.next()
            target = self.select_stmt()
            self.eat_sym(")")
        else:
            target = self.ident()
        alias = self.ident() if self.try_kw("as") else None
        return target, alias

    def join_clause(self):
        """Either the reference's documented edge join
        (`JOIN <vertex> ON origin|destin [AS a]`, sql.tex:2293-2368)
        or the general form (extension):
        `[INNER|LEFT|RIGHT|FULL|SEMI|ANTI] JOIN <table_ref> ON <cond>`.
        `ON origin` stays an edge join unless an operator follows
        (e.g. `ON origin = s.id`, a general condition over the edge's
        origin column)."""
        kind = None
        if not self.at_kw("join"):
            kw = self.next().value
            if kw in ("left", "right", "full"):
                self.try_kw("outer")
            kind = kw
        self.eat_kw("join")
        if kind == "asof":
            # ASOF JOIN <ref> [AS a] ON eq-keys AND ts-inequality
            jtarget, jalias = self.table_ref()
            self.eat_kw("on")
            return A.GeneralJoin(jtarget, "asof", self.expr(), jalias)
        jtarget, jalias = self.table_ref()
        self.eat_kw("on")
        _ops = {"=", "<", ">", "<=", ">=", "!=", "<>", "+", "-", "*",
                "/", "%", "^", ".", "("}
        edge_on = (kind is None and isinstance(jtarget, str)
                   and self.at_kw("origin", "destin", "destination")
                   and not (self.peek(1).kind == "SYM"
                            and self.peek(1).value in _ops))
        if edge_on:
            on = self.next().value
            if on == "destination":
                on = "destin"
            if jalias is None and self.try_kw("as"):
                jalias = self.ident()
            return A.JoinClause(jtarget, on, jalias)
        return A.GeneralJoin(jtarget, kind or "inner", self.expr(),
                             jalias)

    def select_item(self):
        if self.at_sym("*"):
            self.next()
            return A.SelectItem(A.Field("*"), None)
        e = self.expr()
        alias = None
        if self.try_kw("as"):
            alias = self.ident()
        return A.SelectItem(e, alias)

    def order_ref(self):
        # ORDER BY item with optional ASC|DESC (the reference sorts
        # ascending only, nowdbsql.y:834-837 — DESC and expression
        # keys are extensions)
        e = self.expr()
        desc = False
        if self.try_kw("desc"):
            desc = True
        else:
            self.try_kw("asc")
        if isinstance(e, A.Field):
            e.desc = desc
            return e
        return A.OrderItem(e, desc)

    def field_ref(self):
        name = self.ident()
        if self.at_sym("."):
            self.next()
            return A.Field(self.ident(), qualifier=name)
        return A.Field(name)

    # --- expressions (precedence per nowdbsql.y:843-855) -----------
    def expr(self):
        return self.or_expr()

    def or_expr(self):
        left = self.and_expr()
        while self.at_kw("or"):
            self.next()
            left = A.Op("or", [left, self.and_expr()])
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.at_kw("and"):
            self.next()
            left = A.Op("and", [left, self.not_expr()])
        return left

    def not_expr(self):
        if self.at_kw("not"):
            self.next()
            return A.Op("not", [self.not_expr()])
        return self.is_expr()

    def is_expr(self):
        left = self.cmp_expr()
        if self.at_kw("is"):
            self.next()
            negated = self.try_kw("not")
            self.eat_kw("null")
            return A.IsNull(left, negated)
        return left

    def cmp_expr(self):
        left = self.rel_expr()
        while self.at_sym("=", "!=", "<>"):
            op = self.next().value
            left = A.Op("=" if op == "=" else "!=", [left, self.rel_expr()])
        return left

    def rel_expr(self):
        left = self.in_expr()
        while self.at_sym("<", ">", "<=", ">="):
            op = self.next().value
            left = A.Op(op, [left, self.in_expr()])
        return left

    def in_expr(self):
        left = self.add_expr()
        negated = False
        if (self.at_kw("not") and self.peek(1).kind == "KW"
                and self.peek(1).value in ("in", "between", "like")):
            self.next()
            negated = True
        if self.at_kw("between"):
            # value BETWEEN lo AND hi (extension; the reference stubs
            # it out, nowdbsql.y:846). Bounds parse at add_expr level
            # so the separating AND is not consumed as a conjunction.
            self.next()
            lo = self.add_expr()
            self.eat_kw("and")
            hi = self.add_expr()
            e = A.Op("between", [left, lo, hi])
            return A.Op("not", [e]) if negated else e
        if self.at_kw("like"):
            self.next()
            e = A.Op("like", [left, self.add_expr()])
            return A.Op("not", [e]) if negated else e
        if self.at_kw("in"):
            self.next()
            self.eat_sym("(")
            if self.at_kw("select"):
                # IN (SELECT ...) — extension; bound as semi/anti join
                sub = self.select_stmt()
                self.eat_sym(")")
                return A.InExpr(left, [], select=sub, negated=negated)
            vals = [self.expr()]
            while self.at_sym(","):
                self.next()
                vals.append(self.expr())
            self.eat_sym(")")
            return A.InExpr(left, vals, negated=negated)
        if negated:
            raise ParseError("expected IN after NOT")
        return left

    def add_expr(self):
        left = self.mul_expr()
        while self.at_sym("+", "-"):
            op = self.next().value
            left = A.Op(op, [left, self.mul_expr()])
        return left

    def mul_expr(self):
        left = self.pow_expr()
        while self.at_sym("*", "/", "%"):
            op = self.next().value
            left = A.Op(op, [left, self.pow_expr()])
        return left

    def pow_expr(self):
        left = self.unary_expr()
        if self.at_sym("^"):
            self.next()
            return A.Op("^", [left, self.pow_expr()])  # right-assoc
        return left

    def unary_expr(self):
        if self.at_sym("-"):
            self.next()
            t = self.peek()
            if t.kind == "INT":       # fold negative literals
                self.next()
                return A.Const(-int(t.value), "int")
            if t.kind == "FLOAT":
                self.next()
                return A.Const(-float(t.value), "float")
            return A.Op("*", [A.Const(-1, "int"), self.unary_expr()])
        if self.at_sym("+"):
            self.next()
            return self.unary_expr()
        return self.primary()

    def primary(self):
        t = self.peek()
        if t.kind == "INT":
            self.next()
            return A.Const(int(t.value), "int")
        if t.kind == "FLOAT":
            self.next()
            return A.Const(float(t.value), "float")
        if t.kind == "STRING":
            self.next()
            return A.Const(t.value, "string")
        if t.kind == "KW" and t.value in ("true", "false"):
            self.next()
            return A.Const(t.value == "true", "bool")
        if t.kind == "KW" and t.value == "null":
            self.next()
            return A.Const(None, "null")
        if t.kind == "KW" and t.value == "case":
            return self.case_expr()
        if t.kind == "KW" and t.value == "exists":
            self.next()
            self.eat_sym("(")
            sub = self.select_stmt()
            self.eat_sym(")")
            return A.ExistsExpr(sub)
        if self.at_sym("("):
            self.next()
            if self.at_kw("select"):
                # (SELECT ...) — uncorrelated scalar subquery (extension)
                sub = self.select_stmt()
                self.eat_sym(")")
                return A.ScalarSubquery(sub)
            e = self.expr()
            self.eat_sym(")")
            return e
        # function call or field reference
        if t.kind == "IDENT" or (t.kind == "KW" and t.value in _IDENTISH_KWS):
            name = self.ident()
            if self.at_sym("("):
                self.next()
                # count(*) and friends
                if self.at_sym("*"):
                    self.next()
                    self.eat_sym(")")
                    if self.at_kw("over"):
                        return self.window_spec(name.lower(), [])
                    return A.Agg(name.lower(), None)
                if self.try_kw("distinct"):
                    # count/sum(DISTINCT x) — extension
                    arg = self.expr()
                    self.eat_sym(")")
                    lname = name.lower()
                    if lname not in AGGREGATES:
                        raise ParseError(
                            f"DISTINCT argument only in aggregates, "
                            f"not {lname!r}")
                    return A.Agg(lname, arg, distinct=True)
                args = []
                if not self.at_sym(")"):
                    args = [self.expr()]
                    while self.at_sym(","):
                        self.next()
                        args.append(self.expr())
                self.eat_sym(")")
                lname = name.lower()
                if self.at_kw("over"):
                    return self.window_spec(lname, args)
                if lname == "grouping" and len(args) != 1:
                    # multi-column GROUPING(a, b) would silently keep
                    # only `a` (A.Agg stores one arg) — reject it; the
                    # bit vector over all keys is grouping_id()
                    raise ParseError(
                        "grouping() takes exactly one key; use "
                        "grouping_id() for the multi-key bit vector")
                if lname in AGGREGATES or lname in ("grouping",
                                                    "grouping_id"):
                    return A.Agg(lname, args[0] if args else None)
                return A.Op(lname, args)
            if self.at_sym("."):
                self.next()
                return A.Field(self.ident(), qualifier=name)
            return A.Field(name)
        raise ParseError(f"unexpected token {t} in expression")

    def window_spec(self, fname: str, args: list):
        """OVER ([PARTITION BY f,...] [ORDER BY f [desc],...]
        [ROWS BETWEEN b AND b]) — extension; see ast.WindowExpr."""
        self.eat_kw("over")
        self.eat_sym("(")
        part: list = []
        order: list = []
        frame = None
        if self.try_kw("partition"):
            self.eat_kw("by")
            part = [self.field_ref()]
            while self.at_sym(","):
                self.next()
                part.append(self.field_ref())
        if self.at_kw("order"):
            self.next()
            self.eat_kw("by")
            order = [self.order_ref()]
            while self.at_sym(","):
                self.next()
                order.append(self.order_ref())
        frame_mode = "rows"
        if self.at_kw("rows", "range"):
            frame_mode = self.next().value
            self.eat_kw("between")
            frame = (self._frame_bound(start=True),
                     self._frame_bound(start=False))
        self.eat_sym(")")
        return A.WindowExpr(fname, args, part, order, frame,
                            frame_mode=frame_mode)

    def _frame_bound(self, start: bool):
        """UNBOUNDED PRECEDING|FOLLOWING / CURRENT ROW / n PRECEDING /
        n FOLLOWING; the AND separator is eaten before the end bound."""
        if not start:
            self.eat_kw("and")
        if self.try_kw("unbounded"):
            self.eat_kw("preceding" if start else "following")
            return None
        if self.try_kw("current"):
            # ROW is not a keyword; accept the identifier
            if self.ident().lower() != "row":
                raise ParseError("expected ROW after CURRENT")
            return 0
        n = int(self.next().value)
        kw = self.eat_kw("preceding", "following")
        return -n if kw == "preceding" else n

    def case_expr(self):
        self.eat_kw("case")
        # simple CASE (extension): CASE <operand> WHEN v THEN r ...
        # desugars to searched CASE with equality conditions
        operand = None
        if not self.at_kw("when"):
            operand = self.expr()
        whens = []
        while self.at_kw("when"):
            self.next()
            cond = self.expr()
            if operand is not None:
                cond = A.Op("=", [operand, cond])
            self.eat_kw("then")
            whens.append((cond, self.expr()))
        else_ = None
        if self.try_kw("else"):
            else_ = self.expr()
        self.eat_kw("end")
        return A.CaseExpr(whens, else_)


def parse(text: str):
    """Parse one nowdb SQL statement → AST node."""
    return Parser(text).parse()


def parse_script(text: str) -> list:
    """Parse a ';'-separated script → list of AST nodes."""
    stmts = []
    for chunk in _split_statements(text):
        if chunk.strip():
            stmts.append(parse(chunk))
    return stmts


def _split_statements(text: str) -> list[str]:
    """Split on ';' outside string literals and comments.

    String tracking honors both escape conventions the lexer accepts
    (backslash escapes incl. ``\\'`` per nowdbsql.l:182-190, and ``''``
    doubling); a ';' inside ``--`` or ``/* */`` comments does not
    split. Chunks that hold no tokens at all (comment-only trailers
    like create2.sql's end-of-file block) are dropped.
    """
    out, buf = [], []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":                       # string literal
            buf.append(c)
            i += 1
            while i < n:
                if text[i] == "\\" and i + 1 < n:
                    buf.append(text[i:i + 2])
                    i += 2
                    continue
                buf.append(text[i])
                if text[i] == "'":
                    if text[i:i + 2] == "''":
                        buf.append("'")
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            continue
        if c == "-" and text[i:i + 2] == "--":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            buf.append("\n")
            continue
        if c == "/" and text[i:i + 2] == "/*":
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            buf.append(" ")
            continue
        if c == ";":
            out.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(c)
        i += 1
    out.append("".join(buf))
    return [s for s in out if s.strip()]
