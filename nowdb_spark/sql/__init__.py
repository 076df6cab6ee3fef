"""The nowdb SQL dialect front-end.

Grammar surface follows the reference's flex lexer + lemon grammar
(sql/nowdbsql.l, sql/nowdbsql.y): DDL (scope/type/edge/index/proc/
lock), DLL (load), DML (insert), DQL (select), misc (use/show/desc/
exec/fetch/close).

lexer  — tokenizer (keywords case-insensitive, '...' strings,
         ISO time literals, ints/floats/bools, operators)
ast    — plain dataclass statement / expression nodes
parser — recursive descent; expression precedence mirrors
         nowdbsql.y:843-855 (OR < AND < NOT < IS < EQ/NE <
         rel < IN < +/- < */ /% < ^)
binder — expression AST → pyspark Column; SELECT → DataFrame plan
"""

from nowdb_spark.sql.parser import parse  # noqa: F401
