"""Parser/lexer unit tests: precedence, literals, comments, escapes —
the grammar corners (reference sql/nowdbsql.y:843-855 precedence)."""

from __future__ import annotations

import pytest

from nowdb_spark.sql import ast as A
from nowdb_spark.sql.lexer import LexError, tokenize
from nowdb_spark.sql.parser import ParseError, parse, parse_script


def expr_of(sql: str):
    sel = parse(f"select {sql}")
    return sel.items[0].expr


def test_precedence_mul_over_add():
    e = expr_of("1 + 2 * 3")
    assert e.name == "+"
    assert e.args[1].name == "*"


def test_precedence_pow_over_mul():
    e = expr_of("2 * 3 ^ 2")
    assert e.name == "*"
    assert e.args[1].name == "^"


def test_pow_right_assoc():
    e = expr_of("2 ^ 3 ^ 2")
    assert e.name == "^"
    assert e.args[1].name == "^"  # 2^(3^2)


def test_and_binds_tighter_than_or():
    e = expr_of("a = 1 or b = 2 and c = 3")
    assert e.name == "or"
    assert e.args[1].name == "and"


def test_not_and_is_null():
    e = expr_of("not x is null")
    assert e.name == "not"
    assert isinstance(e.args[0], A.IsNull)
    e = expr_of("x is not null")
    assert isinstance(e, A.IsNull) and e.negated


def test_in_after_arithmetic():
    e = expr_of("a + 1 in (1, 2, 3)")
    assert isinstance(e, A.InExpr)
    assert e.expr.name == "+"


def test_string_escape_and_comment():
    sel = parse("select 'it''s' -- trailing comment\n from t")
    assert sel.items[0].expr.value == "it's"
    assert sel.target == "t"


def test_case_nested():
    e = expr_of("case when a > 1 then case when b > 2 then 1 else 2 end "
                "else 3 end")
    assert isinstance(e, A.CaseExpr)
    assert isinstance(e.whens[0][1], A.CaseExpr)


def test_negative_literals_folded():
    assert expr_of("-5").value == -5
    assert expr_of("-5.5").value == -5.5
    e = expr_of("-x")
    assert e.name == "*"


def test_float_formats():
    assert expr_of("1.5e3").value == 1500.0
    assert expr_of("1e-2").value == 0.01
    assert expr_of(".5").value == 0.5


def test_qualified_field():
    e = expr_of("a.b")
    assert isinstance(e, A.Field) and e.qualifier == "a" and e.name == "b"


def test_errors():
    with pytest.raises(ParseError):
        parse("select from t")
    with pytest.raises(ParseError):
        parse("frobnicate x")
    with pytest.raises(ParseError):
        parse("select 1 extra_token junk")
    with pytest.raises(LexError):
        tokenize("select 'unterminated")
    with pytest.raises(LexError):
        tokenize("select @foo")


def test_script_split_respects_strings():
    stmts = parse_script("insert into t values ('a;b'); select 1")
    assert len(stmts) == 2
    assert stmts[0].values[0].value == "a;b"


def test_statement_shapes():
    s = parse("create type if not exists t (a int pk inc, b time timestamp)")
    assert s.if_not_exists and s.props[0].pk and s.props[0].inc
    assert s.props[1].stamp
    s = parse("load 'f.csv' into vertex ignore header as p "
              "set errors='e.txt'")
    assert s.header == "ignore" and s.as_type == "p" and s.errors == "e.txt"
    s = parse("select a from e join v on destination as x where a > 1 "
              "group by a order by a limit 5")
    assert s.joins[0].on == "destin" and s.joins[0].alias == "x"
    assert s.limit == 5
    s = parse("update t set a = 1, b = b + 1 where c = 2")
    assert len(s.assignments) == 2
    s = parse("delete from t")
    assert s.where is None


def test_window_over_parsing():
    from nowdb_spark.sql import ast as A
    s = parse("select row_number() over (partition by k order by t) as rn "
              "from e")
    w = s.items[0].expr
    assert isinstance(w, A.WindowExpr) and w.name == "row_number"
    assert [f.name for f in w.partition_by] == ["k"]
    assert [f.name for f in w.order_by] == ["t"] and not w.order_by[0].desc
    assert w.frame is None

    s = parse("select sum(v) over (partition by a, b order by t desc "
              "rows between 3 preceding and current row) from e")
    w = s.items[0].expr
    assert w.name == "sum" and len(w.args) == 1
    assert [f.name for f in w.partition_by] == ["a", "b"]
    assert w.order_by[0].desc and w.frame == (-3, 0)

    s = parse("select max(v) over (partition by a rows between unbounded "
              "preceding and unbounded following) from e")
    assert s.items[0].expr.frame == (None, None)

    s = parse("select count(*) over (order by t rows between current row "
              "and 2 following) from e")
    w = s.items[0].expr
    assert w.name == "count" and w.args == [] and w.frame == (0, 2)
    assert w.partition_by == []

    s = parse("select lag(v, 2, 0.0) over (order by t) from e")
    assert len(s.items[0].expr.args) == 3


def test_subquery_parsing():
    from nowdb_spark.sql import ast as A
    s = parse("select a from t where k in (select k2 from u where x > 1)")
    c = s.where
    assert isinstance(c, A.InExpr) and c.select is not None
    assert not c.negated and c.values == []
    assert c.select.target == "u"

    s = parse("select a from t where k not in (select k2 from u)")
    assert s.where.negated

    s = parse("select a from t where v > (select avg(v) from t) * 2")
    mul = s.where.args[1]
    assert isinstance(mul.args[0], A.ScalarSubquery)

    s = parse("select a, k not in (1, 2, 3) as flag from t")
    f = s.items[1].expr
    assert isinstance(f, A.InExpr) and f.negated and len(f.values) == 3


def test_setop_parsing():
    from nowdb_spark.sql import ast as A
    s = parse("select a from t union select b from u")
    assert isinstance(s, A.SetOp) and s.op == "union"
    assert s.left.target == "t" and s.right.target == "u"

    s = parse("select a from t union all select b from u "
              "intersect select c from v order by a desc limit 3")
    # left-associative chain; ORDER BY/LIMIT on the whole
    assert s.op == "intersect" and s.left.op == "union_all"
    assert s.order_by[0].name == "a" and s.order_by[0].desc
    assert s.limit == 3
    assert s.left.order_by == [] and s.left.limit is None

    s = parse("select a from t except all select a from u")
    assert s.op == "except_all"

    # plain select still owns its ORDER BY/LIMIT
    s = parse("select a from t order by a limit 2")
    assert isinstance(s, A.Select) and s.limit == 2


def test_simple_case_desugar():
    from nowdb_spark.sql import ast as A
    s = parse("select case status when 'O' then 1 when 'F' then 2 "
              "else 0 end as c from t")
    ce = s.items[0].expr
    assert isinstance(ce, A.CaseExpr) and len(ce.whens) == 2
    cond0 = ce.whens[0][0]
    assert isinstance(cond0, A.Op) and cond0.name == "="
    assert cond0.args[0].name == "status"
    assert cond0.args[1].value == "O"
    assert ce.else_.value == 0
