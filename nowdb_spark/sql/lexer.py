"""Tokenizer for the nowdb SQL dialect (reference: sql/nowdbsql.l).

Keywords are case-insensitive; identifiers are [A-Za-z_][A-Za-z0-9_]*
(optionally qualified a.b); strings are single-quoted with '' escape;
numbers are ints or floats; operators per the reference grammar.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    # statement heads
    "create", "drop", "show", "desc", "describe", "use", "load", "insert",
    "select", "update", "delete", "execute", "exec", "fetch", "close",
    "lock", "unlock", "explain", "merge", "copy", "to",
    # objects (SCOPE/SCHEMA/DATABASE are aliases — nowdbsql.l:75-77)
    "scope", "schema", "database", "storage", "type", "edge", "index",
    "procedure", "proc", "types", "edges", "procedures", "procs",
    "indexes", "indices", "storages", "locks", "scopes", "schemas",
    "databases", "view", "views",
    # clauses
    "into", "values", "from", "where", "group", "order", "by", "on",
    "as", "set", "if", "exists", "not", "and", "or", "in", "is", "null",
    "when", "then", "else", "end", "case", "using", "matched",
    "distinct", "having", "asc", "union", "intersect", "except", "all",
    "qualify",
    # ddl attributes
    "pk", "primary", "key", "inc", "increment", "origin", "destin",
    "destination", "stamp", "timestamp", "language",
    # load options
    "ignore", "header", "errors", "vertex",
    # types
    "text", "date", "time", "float", "int", "uint", "bool", "longtext",
    # misc
    "true", "false", "join", "limit", "for", "reading", "writing",
    "timeout",
    # traversal (the reference DESIGNED this clause but never shipped
    # it — doc/manual/sql.tex:2518-2554, commented out with \ignore)
    "while", "depth",
    # storage/index sizing presets (nowdbsql.y:668-696)
    "tiny", "small", "medium", "big", "large", "huge",
    # general joins (extension — the reference grammar only joins a
    # vertex on origin/destin, sql.tex:2293-2368)
    "inner", "left", "right", "full", "outer", "semi", "anti",
    # window functions (extension — the reference grammar has no OVER,
    # nowdbsql.y; Spark's Window frames back the semantics)
    "over", "partition", "rows", "range", "between", "preceding",
    "following", "unbounded", "current",
    # multi-dimensional grouping (extension — the reference grammar
    # has flat GROUP BY only, nowdbsql.y)
    "rollup", "cube", "grouping", "sets",
    # relational pivot (extension)
    "pivot", "unpivot",
    # as-of join (extension)
    "asof",
    # predicate extensions (the reference grammar stubs LIKE/BETWEEN
    # out — nowdbsql.y:846 '%left MATCH LIKE_KW BETWEEN' is commented)
    "like",
}

SYMBOLS = [
    "<=", ">=", "!=", "<>", "(", ")", ",", ";", "=", "<", ">", "+", "-",
    "*", "/", "%", "^", ".",
]


@dataclass
class Token:
    kind: str   # KW, IDENT, STRING, INT, FLOAT, SYM, EOF
    value: str
    pos: int

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value})"


class LexError(ValueError):
    pass


def tokenize(text: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "-" and text[i:i + 2] == "--":  # line comment
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and text[i:i + 2] == "/*":  # block comment
            j = text.find("*/", i + 2)          # (MCOMMENT state,
            if j < 0:                           # nowdbsql.l:175-180)
                raise LexError(f"unterminated comment at {i}")
            i = j + 2
            continue
        if c == "'":
            j = i + 1
            buf = []
            # escapes per the reference string state (nowdbsql.l:182-190):
            # \\ \' \n \r \t; unknown \x passes through literally.
            # '' doubling is kept too (standard-SQL clients expect it).
            esc = {"\\": "\\", "'": "'", "n": "\n", "r": "\r", "t": "\t"}
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    buf.append(esc.get(text[j + 1], text[j:j + 2]))
                    j += 2
                    continue
                if text[j] == "'":
                    if text[j:j + 2] == "''":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            else:
                raise LexError(f"unterminated string at {i}")
            toks.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            isfloat = False
            while j < n and (text[j].isdigit() or text[j] in ".eE+-"):
                if text[j] in ".eE":
                    # only consume exponent signs right after e/E
                    if text[j] in "eE":
                        if j + 1 < n and text[j + 1] in "+-":
                            j += 1
                    isfloat = True
                elif text[j] in "+-" and text[j - 1] not in "eE":
                    break
                j += 1
            lit = text[i:j]
            try:
                int(lit)
                toks.append(Token("INT", lit, i))
            except ValueError:
                float(lit)
                toks.append(Token("FLOAT", lit, i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            lw = word.lower()
            if lw in KEYWORDS:
                toks.append(Token("KW", lw, i))
            else:
                toks.append(Token("IDENT", word, i))
            i = j
            continue
        matched = False
        for sym in SYMBOLS:
            if text.startswith(sym, i):
                toks.append(Token("SYM", sym, i))
                i += len(sym)
                matched = True
                break
        if not matched:
            raise LexError(f"unexpected character {c!r} at {i}")
    toks.append(Token("EOF", "", n))
    return toks
