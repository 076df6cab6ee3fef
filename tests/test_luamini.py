"""luamini interpreter unit tests — the Lua subset stored procedures
rely on (reference smoke coverage model: test/luasmoke/*.lua)."""

import pytest

from nowdb_spark.luamini import Interpreter, LuaError, LuaTable


def run(src, **globals_extra):
    it = Interpreter(globals_extra=globals_extra)
    return it.run(src), it


def ret1(src, **g):
    vals, _ = run(src, **g)
    return vals[0] if vals else None


def test_arithmetic_and_precedence():
    assert ret1("return 1 + 2 * 3") == 7
    assert ret1("return (1 + 2) * 3") == 9
    assert ret1("return 7 // 2") == 3
    assert ret1("return 7 / 2") == 3.5
    assert ret1("return 2 ^ 10") == 1024.0
    assert ret1("return -7 % 3") == 2          # Lua mod semantics
    assert ret1("return 10 - 2 - 3") == 5      # left assoc
    assert ret1("return 2 ^ 3 ^ 2") == 512.0   # right assoc
    assert ret1("return 0x10 + 1") == 17


def test_strings_concat_compare():
    assert ret1("return 'a' .. 'b' .. 1") == "ab1"
    assert ret1("return 'abc' < 'abd'") is True
    assert ret1("return #'hello'") == 5
    assert ret1("return [[long\nstring]]") == "long\nstring"
    assert ret1(r"return 'tab\tnl\n'") == "tab\tnl\n"


def test_logic_and_truthiness():
    assert ret1("return nil or 5") == 5
    assert ret1("return false and error('never')") is False
    assert ret1("return 0 and 'zero-is-true'") == "zero-is-true"
    assert ret1("return not nil") is True
    assert ret1("return 1 == 1.0") is True
    assert ret1("return '1' == 1") is False


def test_locals_globals_and_scope():
    src = """
    x = 10
    local y = 20
    do local y = 99 end
    return x + y
    """
    assert ret1(src) == 30


def test_multiple_assignment_and_returns():
    assert run("local a, b = f()", f=lambda: (1, 2))[1] is not None
    vals, _ = run("local a, b, c = 1, 2\nreturn a, b, c")
    assert vals == [1, 2, None]
    vals, _ = run("""
    local function two() return 10, 20 end
    local a, b = two()
    local c, d = two(), 5     -- truncated to one value
    return a, b, c, d
    """)
    assert vals == [10, 20, 10, 5]


def test_if_elseif_else():
    src = """
    local function grade(n)
      if n >= 90 then return 'A'
      elseif n >= 80 then return 'B'
      elseif n >= 70 then return 'C'
      else return 'F' end
    end
    return grade(95), grade(85), grade(72), grade(10)
    """
    assert run(src)[0] == ["A", "B", "C", "F"]


def test_while_repeat_break():
    assert ret1("""
    local s, i = 0, 1
    while true do
      s = s + i
      i = i + 1
      if i > 10 then break end
    end
    return s""") == 55
    assert ret1("""
    local n = 0
    repeat n = n + 1 until n >= 5
    return n""") == 5


def test_numeric_for():
    assert ret1("""
    local s = 0
    for i = 1, 10 do s = s + i end
    return s""") == 55
    assert ret1("""
    local s = 0
    for i = 10, 1, -2 do s = s + i end
    return s""") == 30


def test_generic_for_ipairs_pairs():
    assert ret1("""
    local t = {10, 20, 30}
    local s = 0
    for i, v in ipairs(t) do s = s + i * v end
    return s""") == 140
    assert ret1("""
    local t = {a = 1, b = 2, c = 3}
    local s = 0
    for k, v in pairs(t) do s = s + v end
    return s""") == 6


def test_tables_and_length():
    assert ret1("return #{1, 2, 3}") == 3
    assert ret1("""
    local t = {x = 1, [2 + 3] = 'five', 'one'}
    return t.x .. t[5] .. t[1]""") == "1fiveone"
    assert ret1("""
    local t = {}
    t.a = {}
    t.a.b = 42
    return t['a']['b']""") == 42


def test_functions_closures_varargs():
    assert ret1("""
    local function counter()
      local n = 0
      return function() n = n + 1 return n end
    end
    local c = counter()
    c() c()
    return c()""") == 3
    assert ret1("""
    local function sum(...)
      local s = 0
      for _, v in ipairs({...}) do s = s + v end
      return s
    end
    return sum(1, 2, 3, 4)""") == 10
    assert ret1("return select('#', 'a', 'b', 'c')") == 3


def test_method_definitions_and_calls():
    assert ret1("""
    local obj = {n = 5}
    function obj:double() return self.n * 2 end
    return obj:double()""") == 10


def test_string_library():
    assert ret1("return string.format('%s=%d (%.2f)', 'x', 7, 1.5)") \
        == "x=7 (1.50)"
    assert ret1("return ('hello'):upper()") == "HELLO"
    assert ret1("return string.sub('hello', 2, 4)") == "ell"
    assert ret1("return string.sub('hello', -3)") == "llo"
    assert ret1("return string.rep('ab', 3)") == "ababab"
    assert ret1("return ('a,b,c'):find(',')") == 2
    assert ret1("return ('x-y-z'):gsub('-', '+')") == "x+y+z"
    assert ret1("return string.format('%5.1f|%-4d|%x', 3.14, 7, 255)") \
        == "  3.1|7   |ff"


def test_table_library():
    assert ret1("""
    local t = {}
    table.insert(t, 'a')
    table.insert(t, 'c')
    table.insert(t, 2, 'b')
    table.remove(t, 1)
    return table.concat(t, '-')""") == "b-c"
    assert ret1("""
    local t = {3, 1, 2}
    table.sort(t)
    return table.concat(t, '')""") == "123"
    assert ret1("""
    local t = {5, 2, 9}
    table.sort(t, function(a, b) return a > b end)
    return table.concat(t, '')""") == "952"


def test_math_library():
    assert ret1("return math.floor(3.7) + math.ceil(3.2)") == 7
    assert ret1("return math.max(1, 9, 4) - math.min(2, 8)") == 7
    assert ret1("return math.huge > 1e308") is True


def test_error_pcall_assert():
    vals, _ = run("return pcall(function() error('boom') end)")
    assert vals == [False, "boom"]
    vals, _ = run("return pcall(function() return 1, 2 end)")
    assert vals == [True, 1, 2]
    with pytest.raises(LuaError, match="boom"):
        run("error('boom')")
    with pytest.raises(LuaError, match="assertion failed"):
        run("assert(false)")
    with pytest.raises(LuaError, match="custom"):
        run("assert(nil, 'custom')")


def test_tostring_tonumber_type():
    assert ret1("return tostring(nil) .. tostring(true) .. tostring(12)") \
        == "niltrue12"
    assert ret1("return tonumber('42') + tonumber('0x10')") == 58
    assert ret1("return tonumber('nope')") is None
    assert ret1("return tonumber('ff', 16)") == 255
    assert ret1("return type({}) .. type('') .. type(1) .. type(nil)") \
        == "tablestringnumbernil"


def test_host_interop_functions_and_objects():
    class Result:
        def __init__(self, rows):
            self._rows = rows

        def field(self, i):
            return self._rows[0][i]

        def rows(self):
            return iter(self._rows)

        def release(self):
            pass

    calls = []

    def execute(sql):
        calls.append(sql)
        return Result([(1, "a"), (2, "b")])

    # attribute access, method calls, and Python-iterable generic for
    vals, _ = run("""
    local r = nowdb.execute('select * from t')
    local first = r.field(0)
    local n = 0
    for row in r.rows() do n = n + 1 end
    r:release()
    return first, n
    """, nowdb={"execute": execute})
    assert vals == [1, 2]
    assert calls == ["select * from t"]


def test_host_table_wrapping():
    vals, it = run("return api.limits[1] + api.limits[2]",
                   api={"limits": [30, 12]})
    assert vals == [42]


def test_print_captured():
    _, it = run("print('hello', 42)")
    assert it.output == ["hello\t42"]


def test_instruction_budget():
    it = Interpreter(max_steps=10_000)
    with pytest.raises(LuaError, match="budget"):
        it.run("while true do end")


def test_reference_smoke_shapes():
    """Shapes from test/luasmoke/basicsmoke.lua: weekday mapping via
    if-chains, string.format, counting loops over cursor rows."""
    src = """
    local function weekday(n)
      if     n == 1 then return 'Sun'
      elseif n == 2 then return 'Mon'
      elseif n == 3 then return 'Tue'
      elseif n == 4 then return 'Wed'
      elseif n == 5 then return 'Thu'
      elseif n == 6 then return 'Fri'
      else               return 'Sat'
      end
    end
    local out = {}
    for i = 1, 7 do table.insert(out, weekday(i)) end
    return table.concat(out, ',')
    """
    assert ret1(src) == "Sun,Mon,Tue,Wed,Thu,Fri,Sat"
