"""Differential tests for the expressions-language compiler: every
expression is evaluated three ways — a Python reference interpreter
with Java semantics (64-bit wrapping longs, mask-63 shifts,
truncate-toward-zero casts), the Spark emission, and the DuckDB
emission — and all three must agree."""

import math

import pytest

from lucene_spark.search.expressions import (
    CompiledExpression,
    ExpressionError,
    compile_expression,
)


def _wrap64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _jlong(x: float) -> int:
    # Java (long) double: truncate toward zero, saturate at the ends
    if math.isnan(x):
        return 0
    if x >= 2**63 - 1:
        return 2**63 - 1
    if x <= -(2**63):
        return -(2**63)
    return int(x)


def _jdiv(x: float, y: float) -> float:
    # Java double division: x/±0 is ±Infinity (NaN for 0/0, NaN/0)
    if y == 0.0 and not math.isnan(y):
        if math.isnan(x) or x == 0.0:
            return math.nan
        return math.inf if x > 0.0 else -math.inf
    return x / y


def _jmod(x: float, y: float) -> float:
    # Java %: IEEE remainder-with-dividend-sign; NaN for 0 divisor,
    # infinite dividend, or NaN operands; x % Inf = x
    if y == 0.0 or math.isnan(x) or math.isnan(y) or math.isinf(x):
        return math.nan
    if math.isinf(y):
        return x
    return math.fmod(x, y)


def _jminmax(fn, a: float, b: float) -> float:
    # Java Math.min/max propagate NaN
    if math.isnan(a) or math.isnan(b):
        return math.nan
    return fn(a, b)


def _py_eval(src: str, env: dict) -> float:
    """Reference interpreter via the compiler's own AST (shared parse,
    independent evaluation semantics)."""
    from lucene_spark.search.expressions import _Parser, _tokenize

    ast = _Parser(_tokenize(src)).parse()

    def ev(n) -> float:
        k = n[0]
        if k == "num":
            return float(n[1])
        if k == "var":
            return float(env[n[1]])
        if k == "un":
            op, a = n[1], n[2]
            x = ev(a)
            if op == "+":
                return x
            if op == "-":
                return -x
            if op == "!":
                return 1.0 if x == 0.0 else 0.0
            return float(_wrap64(~_jlong(x)))
        if k == "bin":
            op, a, b = n[1], n[2], n[3]
            if op == "&&":
                return 1.0 if (ev(a) != 0.0 and ev(b) != 0.0) else 0.0
            if op == "||":
                return 1.0 if (ev(a) != 0.0 or ev(b) != 0.0) else 0.0
            x, y = ev(a), ev(b)
            if op == "+":
                return x + y
            if op == "-":
                return x - y
            if op == "*":
                return x * y
            if op == "/":
                return _jdiv(x, y)
            if op == "%":
                return _jmod(x, y)
            if op in ("<", "<=", ">", ">=", "==", "!="):
                table = {
                    "<": x < y, "<=": x <= y, ">": x > y,
                    ">=": x >= y, "==": x == y, "!=": x != y,
                }
                return 1.0 if table[op] else 0.0
            lx, ly = _jlong(x), _jlong(y)
            if op == "&":
                return float(_wrap64(lx & ly))
            if op == "|":
                return float(_wrap64(lx | ly))
            if op == "^":
                return float(_wrap64(lx ^ ly))
            s = ly & 63
            if op == "<<":
                return float(_wrap64(lx << s))
            if op == ">>":
                return float(lx >> s)  # python >> on signed = arithmetic
            if op == ">>>":
                # s == 0 is the identity (the unsigned reinterpretation
                # would wrongly un-sign negative operands)
                return float(lx) if s == 0 else float((lx & ((1 << 64) - 1)) >> s)
        if k == "cond":
            return ev(n[2]) if ev(n[1]) != 0.0 else ev(n[3])
        if k == "call":
            name, args = n[1], n[2]
            xs = [ev(a) for a in args]
            fns = {
                "abs": lambda x: abs(x),
                "ln": math.log, "log10": math.log10,
                "logn": lambda b, x: math.log(x) / math.log(b),
                "pow": math.pow, "sqrt": math.sqrt, "exp": math.exp,
                "min": lambda a, b: _jminmax(min, a, b),
                "max": lambda a, b: _jminmax(max, a, b),
                "floor": math.floor, "ceil": math.ceil,
                "sin": math.sin, "cos": math.cos, "tan": math.tan,
                "asin": math.asin, "acos": math.acos, "atan": math.atan,
                "atan2": math.atan2,
                "sinh": lambda x: (math.exp(x) - math.exp(-x)) / 2,
                "cosh": lambda x: (math.exp(x) + math.exp(-x)) / 2,
                "tanh": lambda x: (math.exp(2 * x) - 1) / (math.exp(2 * x) + 1),
                "asinh": lambda x: math.log(x + math.sqrt(x * x + 1)),
                "acosh": lambda x: math.log(x + math.sqrt(x * x - 1)),
                "atanh": lambda x: 0.5 * math.log((1 + x) / (1 - x)),
            }
            return float(fns[name](*xs))
        raise AssertionError(n)

    return ev(ast)


CASES = [
    "1 + 2 * 3",
    "(1 + 2) * 3",
    "10 / 4 - 2 % 1.5",
    "-x + +y",
    "x > y ? x - y : y - x",
    "x > 1 && y < 5 ? 100 : 0",
    "!(x == 2) + (y != 3)",
    "(x < y) + (x <= y) + (x > y) + (x >= y)",
    "x * ln(y + 1) + sqrt(abs(x - y))",
    "pow(x, 2) + logn(2, y + 1)",
    "min(x, y) * max(x, y)",
    "floor(x) + ceil(y) - abs(-3.7)",
    "sin(x) * cos(y) + atan2(x, y)",
    "sinh(1.5) + cosh(0.5) - tanh(2.0)",
    "asinh(2.0) + acosh(3.0) + atanh(0.5)",
    "x & 12 | 5 ^ 3",
    "~x + (5 & 3)",
    "1 << 10",
    "x << 2",
    "-8 >> 1",
    "-8 >>> 1",
    "123456789 << 40",
    "1 << 63",
    "(x > 0 || y > 100) ? ln(x) : 0",
    "0x1f + 010",
    "2e3 + .5",
    "x << y",
    "-1 >>> x",
    # Java corners: division/remainder by zero, NaN comparisons,
    # NaN/Infinity through (long) casts, identity >>> shifts
    "1 / 0",
    "-1 / 0",
    "0 / 0",
    "5 % 0",
    "x / (x - 6.7)",
    "(0/0) == (0/0)",
    "(0/0) != 1",
    "((0/0) < 1) + (1 < (0/0)) + ((0/0) >= (0/0))",
    "min(0/0, 1) + 2",
    "max(0/0, 1) - 2",
    "!(0/0)",
    "~(0/0)",
    "(0/0) >> 2",
    "(1/0) << 1",
    "(-1/0) >> 1",
    "-2 >>> 0",
    "1e19 >> 0",
]

ENV = {"x": 6.7, "y": 3.0}


@pytest.fixture(scope="module")
def engines(spark):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT {ENV['x']} AS x, {ENV['y']} AS y")
    sdf = spark.createDataFrame([(ENV["x"], ENV["y"])], "x double, y double")
    sdf.createOrReplaceTempView("exprtest_t")
    return con, spark


@pytest.mark.parametrize("src", CASES)
def test_three_way_differential(engines, src):
    con, spark = engines
    want = _py_eval(src, ENV)
    c = compile_expression(src, {"x": "x", "y": "y"})
    got_duck = con.execute(f"SELECT {c.duckdb_sql} FROM t").fetchone()[0]
    got_spark = spark.sql(f"SELECT ({c.spark_sql}) AS v FROM exprtest_t").collect()[0][
        "v"
    ]
    assert float(got_duck) == pytest.approx(want, rel=1e-12, nan_ok=True), (
        f"duckdb {src}"
    )
    assert float(got_spark) == pytest.approx(want, rel=1e-12, nan_ok=True), (
        f"spark {src}"
    )
    # bit-exact pair agreement for everything except transcendental
    # functions, where the JVM and libm legitimately differ by ~1 ulp
    # (gates round to 4dp, which absorbs that)
    transcendental = any(
        f in src for f in ("sin", "cos", "tan", "ln", "log", "exp", "atan")
    )
    if not transcendental:
        gs, gd = float(got_spark), float(got_duck)
        assert gs == gd or (math.isnan(gs) and math.isnan(gd)), f"pair {src}"


def test_haversin_matches_geo_module(spark):
    from pyspark.sql import functions as F

    from lucene_spark.search.geo import haversine_meters

    c = compile_expression(
        "haversinMeters(48.8566, 2.3522, lat, lon)",
        {"lat": "lat", "lon": "lon"},
    )
    df = spark.createDataFrame([(40.7128, -74.006)], "lat double, lon double")
    a = df.select(c.column().alias("v")).collect()[0]["v"]
    b = df.select(
        haversine_meters(
            F.lit(48.8566), F.lit(2.3522), F.col("lat"), F.col("lon")
        ).alias("v")
    ).collect()[0]["v"]
    assert a == pytest.approx(b, rel=1e-12)
    # and the km variant is exactly /1000
    ckm = compile_expression(
        "haversin(48.8566, 2.3522, lat, lon)", {"lat": "lat", "lon": "lon"}
    )
    akm = df.select(ckm.column().alias("v")).collect()[0]["v"]
    assert akm == pytest.approx(a / 1000.0, rel=1e-12)


def test_parse_errors():
    for bad in ("1 +", "foo(", "1 2", "x ? 1", "@", "unknownfn(1)"):
        with pytest.raises(ExpressionError):
            c = compile_expression(bad, {"x": "x"})
    with pytest.raises(ExpressionError):
        compile_expression("unbound + 1", {})


def test_bindings_map_to_sql_fragments():
    c = compile_expression(
        "_score * boost", {"_score": "s", "boost": "(n_chars / 100.0)"}
    )
    assert "s" in c.spark_sql and "n_chars" in c.spark_sql
    assert isinstance(c, CompiledExpression)


def test_number_bases():
    assert _py_eval("0x10", {}) == 16.0
    assert _py_eval("010", {}) == 8.0
    c = compile_expression("0x10 + 010")
    assert "16" in c.spark_sql and "8" in c.spark_sql
