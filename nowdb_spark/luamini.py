"""luamini — a small tree-walking Lua interpreter in pure Python.

Why this exists: the engine's ``CREATE PROCEDURE ... LANGUAGE lua``
surface (reference: ifc/luaproc.c, doc/manual/luaemb.tex:134-600)
needs an embedded Lua to actually RUN stored procedures. The usual
embedding (lupa) is a C extension that is not installable in every
deployment, so the engine falls back to this interpreter: a faithful
subset of Lua 5.3 sufficient for nowdb stored procedures — functions,
closures, tables, control flow, multiple returns, the string/table/
math core — with transparent interop to the Python host (the `nowdb`
API table's members are plain Python callables; results returned by
them are Python objects whose methods/attributes are reachable with
normal Lua syntax: ``r.field(0)``, ``cur:rows()``).

Supported: local/global assignment (incl. multi-target and table
fields), function definitions (global, local, methods ``a.b.c`` /
``a:m``), anonymous functions, closures, if/elseif/else, while,
repeat/until, numeric and generic for, break, return, do-blocks,
vararg ``...``; expressions: arithmetic (integer/float split per Lua
5.3: ``/`` and ``^`` are float, ``//`` floor), comparison, logical
and/or with operand semantics, concat ``..``, length ``#``, table
constructors (array part, ``k = v``, ``[e] = v``), string-method
sugar (``s:format(...)``); stdlib subset: print, type, tostring,
tonumber, pairs, ipairs, select, error, assert, pcall, string.format/
sub/len/rep/upper/lower/byte/char/find(plain)/gsub(plain), table.
insert/remove/concat/unpack, math.floor/ceil/abs/min/max/sqrt/huge/
maxinteger/mininteger/pi, os.time/clock.

Deliberately out of scope (procedures don't use them): metatables,
coroutines, goto, string patterns (find/gsub take plain strings),
io/require/load.
"""

from __future__ import annotations

import math
import time as _time


class LuaError(Exception):
    """error() raised in Lua code, or a runtime fault."""

    def __init__(self, value):
        self.value = value
        super().__init__(str(value))


# ------------------------------------------------------------------
# Lexer
# ------------------------------------------------------------------

_KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for",
    "function", "goto", "if", "in", "local", "nil", "not", "or",
    "repeat", "return", "then", "true", "until", "while",
}

_SYMBOLS = [
    "...", "..", ".", "==", "~=", "<=", ">=", "<", ">", "=",
    "(", ")", "{", "}", "[", "]", ";", ":", ",", "+", "-", "*",
    "//", "/", "%", "^", "#",
]

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b",
            "f": "\f", "v": "\v", "\\": "\\", '"': '"', "'": "'",
            "\n": "\n"}


def _tokenize(src: str):
    toks = []          # (kind, value, line) — kind: name kw num str sym
    i, n, line = 0, len(src), 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("--", i):
            if src.startswith("--[[", i):
                j = src.find("]]", i + 4)
                if j < 0:
                    raise LuaError(f"line {line}: unfinished long comment")
                line += src.count("\n", i, j)
                i = j + 2
            else:
                j = src.find("\n", i)
                i = n if j < 0 else j
            continue
        if src.startswith("[[", i):
            j = src.find("]]", i + 2)
            if j < 0:
                raise LuaError(f"line {line}: unfinished long string")
            s = src[i + 2:j]
            if s.startswith("\n"):
                s = s[1:]
            line += src.count("\n", i, j)
            toks.append(("str", s, line))
            i = j + 2
            continue
        if c in "'\"":
            j, buf = i + 1, []
            while j < n and src[j] != c:
                if src[j] == "\\" and j + 1 < n:
                    nxt = src[j + 1]
                    if nxt.isdigit():
                        k = j + 1
                        while k < n and k < j + 4 and src[k].isdigit():
                            k += 1
                        buf.append(chr(int(src[j + 1:k])))
                        j = k
                        continue
                    buf.append(_ESCAPES.get(nxt, nxt))
                    j += 2
                    continue
                if src[j] == "\n":
                    raise LuaError(f"line {line}: unfinished string")
                buf.append(src[j])
                j += 1
            if j >= n:
                raise LuaError(f"line {line}: unfinished string")
            toks.append(("str", "".join(buf), line))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if src.startswith("0x", i) or src.startswith("0X", i):
                j = i + 2
                while j < n and src[j] in "0123456789abcdefABCDEF":
                    j += 1
                toks.append(("num", int(src[i:j], 16), line))
                i = j
                continue
            isfloat = False
            while j < n and (src[j].isdigit() or src[j] in ".eE" or
                             (src[j] in "+-" and src[j - 1] in "eE")):
                if src[j] in ".eE":
                    isfloat = True
                j += 1
            text = src[i:j]
            toks.append(("num", float(text) if isfloat else int(text), line))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            w = src[i:j]
            toks.append(("kw" if w in _KEYWORDS else "name", w, line))
            i = j
            continue
        for sym in _SYMBOLS:
            if src.startswith(sym, i):
                toks.append(("sym", sym, line))
                i += len(sym)
                break
        else:
            raise LuaError(f"line {line}: unexpected character {c!r}")
    toks.append(("eof", None, line))
    return toks


# ------------------------------------------------------------------
# Parser — tuple AST: (tag, ...)
# ------------------------------------------------------------------

class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.p = 0

    # --- token plumbing -------------------------------------------
    def peek(self):
        return self.toks[self.p]

    def next(self):
        t = self.toks[self.p]
        self.p += 1
        return t

    def check(self, kind, val=None):
        k, v, _ = self.peek()
        return k == kind and (val is None or v == val)

    def accept(self, kind, val=None):
        if self.check(kind, val):
            return self.next()
        return None

    def expect(self, kind, val=None):
        if not self.check(kind, val):
            k, v, line = self.peek()
            raise LuaError(
                f"line {line}: expected {val or kind}, got {v!r}")
        return self.next()

    # --- blocks/statements ----------------------------------------
    _BLOCK_ENDS = {"end", "else", "elseif", "until"}

    def block(self):
        stmts = []
        while True:
            k, v, _ = self.peek()
            if k == "eof" or (k == "kw" and v in self._BLOCK_ENDS):
                return ("block", stmts)
            if k == "kw" and v == "return":
                self.next()
                exprs = []
                k2, v2, _ = self.peek()
                if not (k2 == "eof" or (k2 == "kw" and v2 in self._BLOCK_ENDS)
                        or (k2 == "sym" and v2 == ";")):
                    exprs = self.exprlist()
                self.accept("sym", ";")
                stmts.append(("return", exprs))
                return ("block", stmts)
            s = self.statement()
            if s is not None:
                stmts.append(s)

    def statement(self):
        if self.accept("sym", ";"):
            return None
        if self.accept("kw", "break"):
            return ("break",)
        if self.accept("kw", "do"):
            b = self.block()
            self.expect("kw", "end")
            return b
        if self.accept("kw", "while"):
            cond = self.expr()
            self.expect("kw", "do")
            body = self.block()
            self.expect("kw", "end")
            return ("while", cond, body)
        if self.accept("kw", "repeat"):
            body = self.block()
            self.expect("kw", "until")
            cond = self.expr()
            return ("repeat", body, cond)
        if self.accept("kw", "if"):
            return self._if()
        if self.accept("kw", "for"):
            return self._for()
        if self.accept("kw", "function"):
            return self._function_stmt()
        if self.accept("kw", "local"):
            if self.accept("kw", "function"):
                name = self.expect("name")[1]
                fn = self._funcbody()
                return ("localfunc", name, fn)
            names = [self.expect("name")[1]]
            while self.accept("sym", ","):
                names.append(self.expect("name")[1])
            exprs = self.exprlist() if self.accept("sym", "=") else []
            return ("local", names, exprs)
        return self._exprstmt()

    def _if(self):
        cond = self.expr()
        self.expect("kw", "then")
        then = self.block()
        if self.accept("kw", "elseif"):
            return ("if", cond, then, ("block", [self._if()]))
        if self.accept("kw", "else"):
            els = self.block()
            self.expect("kw", "end")
            return ("if", cond, then, els)
        self.expect("kw", "end")
        return ("if", cond, then, None)

    def _for(self):
        name = self.expect("name")[1]
        if self.accept("sym", "="):
            start = self.expr()
            self.expect("sym", ",")
            stop = self.expr()
            step = self.expr() if self.accept("sym", ",") else ("num", 1)
            self.expect("kw", "do")
            body = self.block()
            self.expect("kw", "end")
            return ("fornum", name, start, stop, step, body)
        names = [name]
        while self.accept("sym", ","):
            names.append(self.expect("name")[1])
        self.expect("kw", "in")
        exprs = self.exprlist()
        self.expect("kw", "do")
        body = self.block()
        self.expect("kw", "end")
        return ("forin", names, exprs, body)

    def _function_stmt(self):
        # function a.b.c(...) / function a:m(...)
        target = ("name", self.expect("name")[1])
        is_method = False
        while True:
            if self.accept("sym", "."):
                target = ("index", target, ("str", self.expect("name")[1]))
            elif self.accept("sym", ":"):
                target = ("index", target, ("str", self.expect("name")[1]))
                is_method = True
                break
            else:
                break
        fn = self._funcbody(is_method)
        return ("assign", [target], [fn])

    def _funcbody(self, is_method=False):
        self.expect("sym", "(")
        params, vararg = (["self"] if is_method else []), False
        if not self.check("sym", ")"):
            while True:
                if self.accept("sym", "..."):
                    vararg = True
                    break
                params.append(self.expect("name")[1])
                if not self.accept("sym", ","):
                    break
        self.expect("sym", ")")
        body = self.block()
        self.expect("kw", "end")
        return ("function", params, vararg, body)

    def _exprstmt(self):
        e = self.suffixedexp()
        if self.check("sym", "=") or self.check("sym", ","):
            targets = [e]
            while self.accept("sym", ","):
                targets.append(self.suffixedexp())
            self.expect("sym", "=")
            exprs = self.exprlist()
            for t in targets:
                if t[0] not in ("name", "index"):
                    raise LuaError("cannot assign to this expression")
            return ("assign", targets, exprs)
        if e[0] not in ("call", "method"):
            raise LuaError(f"syntax error near {self.peek()[1]!r}")
        return ("exprstat", e)

    # --- expressions ----------------------------------------------
    def exprlist(self):
        out = [self.expr()]
        while self.accept("sym", ","):
            out.append(self.expr())
        return out

    _BINPRI = {
        "or": (1, 1), "and": (2, 2),
        "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
        "~=": (3, 3), "==": (3, 3),
        "..": (9, 8),            # right assoc
        "+": (10, 10), "-": (10, 10),
        "*": (11, 11), "/": (11, 11), "//": (11, 11), "%": (11, 11),
        "^": (14, 13),           # right assoc
    }
    _UNARY_PRI = 12

    def expr(self, limit=0):
        k, v, _ = self.peek()
        if (k == "sym" and v in ("-", "#")) or (k == "kw" and v == "not"):
            self.next()
            operand = self.expr(self._UNARY_PRI)
            left = ("unop", v, operand)
        else:
            left = self.simpleexp()
        while True:
            k, v, _ = self.peek()
            op = v if (k == "sym" or (k == "kw" and v in ("and", "or"))) \
                else None
            pri = self._BINPRI.get(op)
            if pri is None or pri[0] <= limit:
                return left
            self.next()
            right = self.expr(pri[1])
            left = ("binop", op, left, right)

    def simpleexp(self):
        k, v, _ = self.peek()
        if k == "num":
            self.next()
            return ("num", v)
        if k == "str":
            self.next()
            return ("str", v)
        if k == "kw" and v in ("nil", "true", "false"):
            self.next()
            return (v,)
        if k == "sym" and v == "...":
            self.next()
            return ("vararg",)
        if k == "kw" and v == "function":
            self.next()
            return self._funcbody()
        if k == "sym" and v == "{":
            return self._table()
        return self.suffixedexp()

    def _table(self):
        self.expect("sym", "{")
        items = []     # ("item", e) | ("pair", k, v)
        while not self.check("sym", "}"):
            if self.check("sym", "["):
                self.next()
                key = self.expr()
                self.expect("sym", "]")
                self.expect("sym", "=")
                items.append(("pair", key, self.expr()))
            elif (self.check("name") and
                  self.toks[self.p + 1][:2] == ("sym", "=")):
                key = ("str", self.next()[1])
                self.next()
                items.append(("pair", key, self.expr()))
            else:
                items.append(("item", self.expr()))
            if not (self.accept("sym", ",") or self.accept("sym", ";")):
                break
        self.expect("sym", "}")
        return ("table", items)

    def suffixedexp(self):
        k, v, _ = self.peek()
        if k == "sym" and v == "(":
            self.next()
            e = self.expr()
            self.expect("sym", ")")
            e = ("paren", e)
        elif k == "name":
            self.next()
            e = ("name", v)
        else:
            raise LuaError(f"unexpected token {v!r}")
        while True:
            if self.accept("sym", "."):
                e = ("index", e, ("str", self.expect("name")[1]))
            elif self.accept("sym", "["):
                idx = self.expr()
                self.expect("sym", "]")
                e = ("index", e, idx)
            elif self.accept("sym", ":"):
                m = self.expect("name")[1]
                e = ("method", e, m, self._callargs())
            elif self.check("sym", "(") or self.check("str") \
                    or self.check("sym", "{"):
                e = ("call", e, self._callargs())
            else:
                return e

    def _callargs(self):
        if self.check("str"):
            return [("str", self.next()[1])]
        if self.check("sym", "{"):
            return [self._table()]
        self.expect("sym", "(")
        args = [] if self.check("sym", ")") else self.exprlist()
        self.expect("sym", ")")
        return args


# ------------------------------------------------------------------
# Runtime values
# ------------------------------------------------------------------

class LuaTable:
    """Lua table: one hash storing all keys; integer keys 1..n form
    the array part for #, ipairs, insert/remove/concat."""

    __slots__ = ("hash",)

    def __init__(self, items=None):
        self.hash = dict(items or {})

    def get(self, key):
        if isinstance(key, float) and key.is_integer():
            key = int(key)
        return self.hash.get(key)

    def set(self, key, value):
        if key is None:
            raise LuaError("table index is nil")
        if isinstance(key, float) and key.is_integer():
            key = int(key)
        if value is None:
            self.hash.pop(key, None)
        else:
            self.hash[key] = value

    def length(self):
        n = 0
        while (n + 1) in self.hash:
            n += 1
        return n

    def __repr__(self):
        return f"LuaTable({self.hash!r})"


class _LuaFunction:
    __slots__ = ("params", "vararg", "body", "env", "interp")

    def __init__(self, params, vararg, body, env, interp):
        self.params, self.vararg = params, vararg
        self.body, self.env, self.interp = body, env, interp

    def __call__(self, *args):
        # called FROM PYTHON (host callbacks): adapt and run
        return self.interp.call(self, list(args))


class _Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e
            e = e.parent
        return None


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, values):
        self.values = values


# ------------------------------------------------------------------
# Interpreter
# ------------------------------------------------------------------

def _tostr(v):
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v != v or v in (math.inf, -math.inf):
            return {math.inf: "inf", -math.inf: "-inf"}.get(v, "nan")
        if v.is_integer():
            return f"{v:.1f}"
        return repr(v)
    return str(v)


def _tonum(v, base=None):
    if base is not None:
        try:
            return int(str(v).strip(), int(base))
        except ValueError:
            return None
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return v
    if isinstance(v, str):
        s = v.strip()
        try:
            return int(s, 16) if s.lower().startswith("0x") else int(s)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return None
    return None


def _fmt(spec, *args):
    """string.format — %d %i %u %f %g %e %x %X %o %s %q %c %%."""
    out, ai, i, n = [], 0, 0, len(spec)
    while i < n:
        c = spec[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        j = i + 1
        while j < n and spec[j] in "-+ #0123456789.":
            j += 1
        if j >= n:
            raise LuaError("invalid format string")
        conv, flags = spec[j], spec[i + 1:j]
        if conv == "%":
            out.append("%")
            i = j + 1
            continue
        arg = args[ai] if ai < len(args) else None
        ai += 1
        if conv in "di u":
            out.append(("%" + flags + "d") % int(_tonum(arg)))
        elif conv in "fFgGeE":
            out.append(("%" + flags + conv) % float(_tonum(arg)))
        elif conv in "xXo":
            out.append(("%" + flags + conv) % int(_tonum(arg)))
        elif conv == "c":
            out.append(chr(int(_tonum(arg))))
        elif conv == "q":
            out.append('"' + str(arg).replace("\\", "\\\\")
                       .replace('"', '\\"').replace("\n", "\\n") + '"')
        elif conv == "s":
            out.append(("%" + flags + "s") % _tostr(arg))
        else:
            raise LuaError(f"invalid format option %{conv}")
        i = j + 1
    return "".join(out)


def _truthy(v):
    return v is not None and v is not False


class Interpreter:
    def __init__(self, globals_extra=None, max_steps=50_000_000):
        self.genv = _Env()
        self.genv.vars.update(self._stdlib())
        if globals_extra:
            for k, v in globals_extra.items():
                self.genv.vars[k] = self._wrap(v)
        self.steps = 0
        self.max_steps = max_steps
        self.output = []          # print() lines (also echoed via hook)
        self.print_hook = None

    # --- host interop ---------------------------------------------
    def _wrap(self, v):
        if isinstance(v, dict):
            return LuaTable({k: self._wrap(x) for k, x in v.items()})
        if isinstance(v, (list, tuple)):
            return LuaTable({i + 1: self._wrap(x)
                             for i, x in enumerate(v)})
        return v

    # --- public API -----------------------------------------------
    def run(self, src: str, chunk_vararg=()):
        ast = _Parser(_tokenize(src)).block()
        env = _Env(self.genv)
        env.vars["..."] = list(chunk_vararg)
        try:
            self.exec_block(ast, env)
        except _Return as r:
            return r.values
        return []

    def global_(self, name):
        return self.genv.vars.get(name)

    def call(self, fn, args):
        if isinstance(fn, _LuaFunction):
            env = _Env(fn.env)
            for i, p in enumerate(fn.params):
                env.vars[p] = args[i] if i < len(args) else None
            env.vars["..."] = list(args[len(fn.params):]) \
                if fn.vararg else []
            try:
                fn.interp.exec_block(fn.body, env)
            except _Return as r:
                return r.values
            return []
        if callable(fn):
            out = fn(*args)
            if isinstance(out, tuple):
                return list(out)
            return [] if out is None else [out]
        raise LuaError(f"attempt to call a {self._typename(fn)} value")

    # --- execution ------------------------------------------------
    def _tick(self):
        self.steps += 1
        if self.steps > self.max_steps:
            raise LuaError("instruction budget exceeded")

    def exec_block(self, block, env):
        for st in block[1]:
            self.exec_stmt(st, env)

    def exec_stmt(self, st, env):
        self._tick()
        tag = st[0]
        if tag == "exprstat":
            self.eval(st[1], env)
        elif tag == "local":
            vals = self._adjust(st[2], env, len(st[1]))
            for name, v in zip(st[1], vals):
                env.vars[name] = v
        elif tag == "assign":
            vals = self._adjust(st[2], env, len(st[1]))
            for target, v in zip(st[1], vals):
                self._setvar(target, v, env)
        elif tag == "localfunc":
            env.vars[st[1]] = None
            env.vars[st[1]] = self.eval(st[2], env)
        elif tag == "if":
            if _truthy(self.eval(st[1], env)):
                self.exec_block(st[2], _Env(env))
            elif st[3] is not None:
                self.exec_block(st[3], _Env(env))
        elif tag == "while":
            while _truthy(self.eval(st[1], env)):
                self._tick()
                try:
                    self.exec_block(st[2], _Env(env))
                except _Break:
                    break
        elif tag == "repeat":
            while True:
                self._tick()
                inner = _Env(env)
                try:
                    self.exec_block(st[1], inner)
                except _Break:
                    break
                if _truthy(self.eval(st[2], inner)):
                    break
        elif tag == "fornum":
            start = _tonum(self.eval(st[2], env))
            stop = _tonum(self.eval(st[3], env))
            step = _tonum(self.eval(st[4], env))
            if step == 0:
                raise LuaError("'for' step is zero")
            i = start
            while (step > 0 and i <= stop) or (step < 0 and i >= stop):
                self._tick()
                inner = _Env(env)
                inner.vars[st[1]] = i
                try:
                    self.exec_block(st[5], inner)
                except _Break:
                    break
                i += step
        elif tag == "forin":
            self._forin(st, env)
        elif tag == "block":
            self.exec_block(st, _Env(env))
        elif tag == "break":
            raise _Break()
        elif tag == "return":
            vals = self._evalmulti(st[1], env)
            raise _Return(vals)
        else:
            raise LuaError(f"unknown statement {tag}")

    def _forin(self, st, env):
        names, exprs, body = st[1], st[2], st[3]
        vals = self._evalmulti(exprs, env)
        f = vals[0] if vals else None
        # Python-iterable interop: `for x in cur.rows() do` where
        # rows() returned a generator/iterator/list
        if f is not None and not isinstance(f, _LuaFunction) \
                and not callable(f) and hasattr(f, "__iter__"):
            for item in f:
                self._tick()
                inner = _Env(env)
                vals_i = list(item) if isinstance(item, tuple) else [item]
                for i, nm in enumerate(names):
                    inner.vars[nm] = vals_i[i] if i < len(vals_i) else None
                try:
                    self.exec_block(body, inner)
                except _Break:
                    return
            return
        state = vals[1] if len(vals) > 1 else None
        control = vals[2] if len(vals) > 2 else None
        while True:
            self._tick()
            rets = self.call(f, [state, control])
            if not rets or rets[0] is None:
                return
            control = rets[0]
            inner = _Env(env)
            for i, nm in enumerate(names):
                inner.vars[nm] = rets[i] if i < len(rets) else None
            try:
                self.exec_block(body, inner)
            except _Break:
                return

    def _setvar(self, target, value, env):
        if target[0] == "name":
            e = env.lookup(target[1])
            (e or self.genv).vars[target[1]] = value
        else:                              # ("index", obj, key)
            obj = self.eval(target[1], env)
            key = self.eval(target[2], env)
            if isinstance(obj, LuaTable):
                obj.set(key, value)
            elif obj is None:
                raise LuaError("attempt to index a nil value")
            else:
                setattr(obj, str(key), value)

    # --- evaluation -----------------------------------------------
    def _evalmulti(self, exprs, env):
        """Evaluate an expression list, expanding the LAST expression's
        multiple values (Lua adjustment rule)."""
        vals = []
        for i, e in enumerate(exprs):
            if i == len(exprs) - 1:
                vals.extend(self._eval_multival(e, env))
            else:
                vals.append(self.eval(e, env))
        return vals

    def _adjust(self, exprs, env, n):
        vals = self._evalmulti(exprs, env)
        vals += [None] * (n - len(vals))
        return vals[:n]

    def _eval_multival(self, e, env):
        if e[0] in ("call", "method"):
            return self._call_expr(e, env)
        if e[0] == "vararg":
            ev = env.lookup("...")
            return list(ev.vars["..."]) if ev else []
        return [self.eval(e, env)]

    def eval(self, e, env):
        self._tick()
        tag = e[0]
        if tag == "num" or tag == "str":
            return e[1]
        if tag == "nil":
            return None
        if tag == "true":
            return True
        if tag == "false":
            return False
        if tag == "name":
            scope = env.lookup(e[1])
            return scope.vars[e[1]] if scope else None
        if tag == "paren":
            return self.eval(e[1], env)
        if tag == "vararg":
            vs = self._eval_multival(e, env)
            return vs[0] if vs else None
        if tag == "function":
            return _LuaFunction(e[1], e[2], e[3], env, self)
        if tag == "index":
            return self._index(self.eval(e[1], env),
                               self.eval(e[2], env))
        if tag in ("call", "method"):
            vals = self._call_expr(e, env)
            return vals[0] if vals else None
        if tag == "table":
            t = LuaTable()
            arr = 1
            for i, item in enumerate(e[1]):
                if item[0] == "pair":
                    t.set(self.eval(item[1], env),
                          self.eval(item[2], env))
                elif i == len(e[1]) - 1:
                    for v in self._eval_multival(item[1], env):
                        t.set(arr, v)
                        arr += 1
                else:
                    t.set(arr, self.eval(item[1], env))
                    arr += 1
            return t
        if tag == "binop":
            return self._binop(e[1], e[2], e[3], env)
        if tag == "unop":
            return self._unop(e[1], self.eval(e[2], env))
        raise LuaError(f"unknown expression {tag}")

    def _index(self, obj, key):
        if isinstance(obj, LuaTable):
            return obj.get(key)
        if isinstance(obj, str):
            lib = self.genv.vars["string"]
            return lib.get(key)
        if obj is None:
            raise LuaError(f"attempt to index a nil value ({key!r})")
        # Python host object: attribute access
        if isinstance(key, str) and hasattr(obj, key):
            return getattr(obj, key)
        try:
            return obj[key]
        except Exception:
            return None

    def _call_expr(self, e, env):
        if e[0] == "method":
            obj = self.eval(e[1], env)
            args = self._evalmulti(e[3], env)
            if isinstance(obj, LuaTable):
                fn = obj.get(e[2])
                if fn is None:
                    raise LuaError(f"method {e[2]!r} not found")
                return self.call(fn, [obj] + args)
            if isinstance(obj, str):
                fn = self.genv.vars["string"].get(e[2])
                if fn is None:
                    raise LuaError(f"unknown string method {e[2]!r}")
                return self.call(fn, [obj] + args)
            if obj is None:
                raise LuaError(
                    f"attempt to call method {e[2]!r} on a nil value")
            return self.call(getattr(obj, e[2]), args)
        fn = self.eval(e[1], env)
        args = self._evalmulti(e[2], env)
        return self.call(fn, args)

    # --- operators ------------------------------------------------
    @staticmethod
    def _typename(v):
        if v is None:
            return "nil"
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, (int, float)):
            return "number"
        if isinstance(v, str):
            return "string"
        if isinstance(v, LuaTable):
            return "table"
        if isinstance(v, _LuaFunction) or callable(v):
            return "function"
        return "userdata"

    def _arith(self, op, a, b):
        x, y = _tonum(a), _tonum(b)
        if x is None or y is None:
            raise LuaError(
                f"attempt to perform arithmetic on a "
                f"{self._typename(a if x is None else b)} value")
        if op == "+":
            return x + y
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        if op == "/":
            return x / y
        if op == "//":
            r = math.floor(x / y)
            return r if isinstance(x, int) and isinstance(y, int) \
                else float(r)
        if op == "%":
            return x - math.floor(x / y) * y if isinstance(x, float) \
                or isinstance(y, float) else x % y
        if op == "^":
            return float(x) ** float(y)
        raise LuaError(op)

    def _binop(self, op, le, re, env):
        if op == "and":
            lv = self.eval(le, env)
            return self.eval(re, env) if _truthy(lv) else lv
        if op == "or":
            lv = self.eval(le, env)
            return lv if _truthy(lv) else self.eval(re, env)
        a, b = self.eval(le, env), self.eval(re, env)
        if op == "..":
            for v in (a, b):
                if not isinstance(v, (str, int, float)) \
                        or isinstance(v, bool):
                    raise LuaError(
                        f"attempt to concatenate a "
                        f"{self._typename(v)} value")
            return _tostr(a) + _tostr(b) if not isinstance(a, str) \
                or not isinstance(b, str) else a + b
        if op == "==":
            return self._eq(a, b)
        if op == "~=":
            return not self._eq(a, b)
        if op in ("<", "<=", ">", ">="):
            if isinstance(a, (int, float)) and not isinstance(a, bool) \
                    and isinstance(b, (int, float)) \
                    and not isinstance(b, bool):
                pass
            elif isinstance(a, str) and isinstance(b, str):
                pass
            else:
                raise LuaError(
                    f"attempt to compare {self._typename(a)} "
                    f"with {self._typename(b)}")
            return {"<": a < b, "<=": a <= b,
                    ">": a > b, ">=": a >= b}[op]
        return self._arith(op, a, b)

    @staticmethod
    def _eq(a, b):
        if isinstance(a, bool) or isinstance(b, bool):
            return a is b
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a == b
        if type(a) is not type(b) and not (
                isinstance(a, str) and isinstance(b, str)):
            return a is b
        if isinstance(a, (str,)):
            return a == b
        return a is b

    def _unop(self, op, v):
        if op == "-":
            x = _tonum(v)
            if x is None:
                raise LuaError("attempt to perform arithmetic on a "
                               + self._typename(v) + " value")
            return -x
        if op == "not":
            return not _truthy(v)
        if op == "#":
            if isinstance(v, str):
                return len(v)
            if isinstance(v, LuaTable):
                return v.length()
            try:
                return len(v)
            except TypeError:
                raise LuaError("attempt to get length of a "
                               + self._typename(v) + " value") from None
        raise LuaError(op)

    # --- stdlib ---------------------------------------------------
    def _stdlib(self):
        interp = self

        def lua_print(*args):
            line = "\t".join(_tostr(a) for a in args)
            interp.output.append(line)
            if interp.print_hook:
                interp.print_hook(line)

        def lua_error(msg, _level=None):
            raise LuaError(msg)

        def lua_assert(v, msg=None, *rest):
            if not _truthy(v):
                raise LuaError(msg if msg is not None
                               else "assertion failed!")
            return (v, msg, *rest) if msg is not None else v

        def lua_pcall(fn, *args):
            try:
                return tuple([True] + interp.call(fn, list(args)))
            except LuaError as ex:
                return (False, ex.value)
            except Exception as ex:          # host faults surface as strings
                return (False, str(ex))

        def lua_ipairs(t):
            def it(tab, i):
                i = int(i) + 1
                v = interp._index(tab, i)
                if v is None:
                    return None
                return (i, v)
            return (it, t, 0)

        def lua_pairs(t):
            if not isinstance(t, LuaTable):
                raise LuaError("bad argument to 'pairs' (table expected)")
            keys = list(t.hash.keys())
            pos = {"i": 0}

            def it(_tab, _ctl):
                while pos["i"] < len(keys):
                    k = keys[pos["i"]]
                    pos["i"] += 1
                    if k in t.hash:
                        return (k, t.hash[k])
                return None
            return (it, t, None)

        def lua_select(n, *args):
            if n == "#":
                return len(args)
            n = int(n)
            if n < 0:
                n = len(args) + n + 1
            return tuple(args[n - 1:])

        def lua_unpack(t, i=1, j=None):
            i = int(i)
            j = t.length() if j is None else int(j)
            return tuple(t.get(x) for x in range(i, j + 1))

        def tbl_insert(t, a, b=None):
            if b is None:
                t.set(t.length() + 1, a)
            else:
                pos = int(a)
                for x in range(t.length(), pos - 1, -1):
                    t.set(x + 1, t.get(x))
                t.set(pos, b)

        def tbl_remove(t, pos=None):
            n = t.length()
            if n == 0:
                return None
            pos = n if pos is None else int(pos)
            v = t.get(pos)
            for x in range(pos, n):
                t.set(x, t.get(x + 1))
            t.set(n, None)
            return v

        def tbl_concat(t, sep="", i=1, j=None):
            j = t.length() if j is None else int(j)
            return str(sep).join(
                _tostr(t.get(x)) for x in range(int(i), j + 1))

        def tbl_sort(t, cmp=None):
            import functools
            items = [t.get(i) for i in range(1, t.length() + 1)]
            if cmp is None:
                items.sort()
            else:
                items.sort(key=functools.cmp_to_key(
                    lambda a, b: -1 if _truthy(
                        (interp.call(cmp, [a, b]) or [None])[0]) else 1))
            for i, v in enumerate(items):
                t.set(i + 1, v)

        def str_sub(s, i, j=-1):
            n = len(s)
            i, j = int(i), int(j)
            if i < 0:
                i = max(n + i + 1, 1)
            elif i == 0:
                i = 1
            if j < 0:
                j = n + j + 1
            elif j > n:
                j = n
            return s[i - 1:j] if i <= j else ""

        def str_find(s, pat, init=1, _plain=None):
            idx = s.find(pat, int(init) - 1)
            if idx < 0:
                return None
            return (idx + 1, idx + len(pat))

        def str_gsub(s, pat, repl, n=None):
            cnt = s.count(pat) if n is None else min(
                s.count(pat), int(n))
            return (s.replace(pat, str(repl),
                              cnt if n is not None else -1), cnt)

        def str_byte(s, i=1, j=None):
            j = i if j is None else j
            return tuple(ord(c) for c in str_sub(s, i, j))

        string = LuaTable({
            "format": _fmt,
            "sub": str_sub,
            "len": lambda s: len(s),
            "rep": lambda s, n, sep="": str(sep).join([s] * int(n)),
            "upper": lambda s: s.upper(),
            "lower": lambda s: s.lower(),
            "find": str_find,
            "gsub": str_gsub,
            "byte": str_byte,
            "char": lambda *cs: "".join(chr(int(c)) for c in cs),
            "reverse": lambda s: s[::-1],
        })
        table = LuaTable({
            "insert": tbl_insert, "remove": tbl_remove,
            "concat": tbl_concat, "sort": tbl_sort,
            "unpack": lua_unpack,
        })
        mathlib = LuaTable({
            "floor": lambda x: math.floor(_tonum(x)),
            "ceil": lambda x: math.ceil(_tonum(x)),
            "abs": lambda x: abs(_tonum(x)),
            "max": lambda *xs: max(_tonum(x) for x in xs),
            "min": lambda *xs: min(_tonum(x) for x in xs),
            "sqrt": lambda x: math.sqrt(_tonum(x)),
            "huge": math.inf,
            "pi": math.pi,
            "maxinteger": 2**63 - 1,
            "mininteger": -(2**63),
            "fmod": lambda a, b: math.fmod(_tonum(a), _tonum(b)),
            "tointeger": lambda x: int(x) if isinstance(
                x, (int, float)) and not isinstance(x, bool)
                and float(x).is_integer() else None,
        })
        oslib = LuaTable({
            "time": lambda *_: int(_time.time()),
            "clock": lambda: _time.process_time(),
        })
        return {
            "print": lua_print,
            "type": lambda v: interp._typename(v),
            "tostring": _tostr,
            "tonumber": _tonum,
            "error": lua_error,
            "assert": lua_assert,
            "pcall": lua_pcall,
            "ipairs": lua_ipairs,
            "pairs": lua_pairs,
            "select": lua_select,
            "unpack": lua_unpack,
            "string": string,
            "table": table,
            "math": mathlib,
            "os": oslib,
        }
