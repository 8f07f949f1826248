"""The reference's expressions language, compiled to paired SQL.

Re-expression of `lucene/expressions/src/java/org/apache/lucene/expressions/js/JavascriptCompiler.java`
(grammar `Javascript.g4`, default function registry
`JavascriptCompiler.properties`): a small double-typed scoring
language — arithmetic, comparisons (1.0/0.0), booleans (non-zero is
true), Java-semantics bitwise/shift ops over ``(long)`` casts, the
``?:`` conditional, and the published 26-function math registry
(``abs ln log10 logn pow min max sqrt cbrt-less trig/hyperbolic
haversin``), over variables bound via Bindings
(`expressions/SimpleBindings.java`).

Architecture: a recursive-descent parser (one precedence level per
grammar rule) produces an AST; the AST is EMITTED TWICE — once as a
Spark SQL expression (evaluated via ``F.expr``: the whole expression
stays inside whole-stage codegen, zero Python per row) and once as a
DuckDB SQL expression (the correctness oracle's dual). Keeping one AST
and two emitters is what makes engine and oracle agree bit-for-bit,
including the awkward corners:

- ``(long)`` casts follow Java: truncate toward zero, NaN → 0,
  out-of-range clamps to MIN/MAX_LONG (Spark ANSI CAST throws on
  NaN/overflow, DuckDB CAST rounds and errors — both get an explicit
  CASE with TRY_CAST in the reachable branch).
- ``x / 0`` is Java's ±Infinity (NaN for 0/0), not Spark ANSI's
  DIVIDE_BY_ZERO or DuckDB's NULL; ``x % 0`` is NaN likewise.
- comparisons return false when either side is NaN (both engines
  instead order NaN above every double), ``!=`` returns true, and
  ``min``/``max`` propagate NaN like Math.min/max.
- Java shifts mask the count with ``& 63``; Spark's shift functions
  do too, DuckDB's operators don't — the dual masks explicitly.
- Java ``<<`` wraps on overflow; DuckDB's BIGINT ``<<`` raises — the
  dual computes the shift in HUGEINT and wraps mod 2^64 back to the
  signed range.
- ``>>>`` (Spark ``shiftrightunsigned``) has no DuckDB operator — the
  dual is ``(x >> s) & (max_long >> (s-1))`` with an ``s = 0`` guard.
- hyperbolics/``acosh``-family: DuckDB lacks them, so BOTH sides emit
  the same exp/ln closed forms (shared expression = shared rounding).

Compile once per query — the result is a plan fragment, not a UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Tuple

__all__ = ["compile_expression", "ExpressionError", "CompiledExpression"]


class ExpressionError(ValueError):
    """Parse or binding failure (mirrors the reference's ParseException)."""


_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>0[xX][0-9a-fA-F]+|0[0-7]+|(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<var>[_$a-zA-Z][_$a-zA-Z0-9]*(?:\.[_$a-zA-Z][_$a-zA-Z0-9]*)*)"
    r"|(?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!~<>&^|?:,])"
    r")"
)


def _tokenize(src: str) -> List[Tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            if src[pos:].strip() == "":
                break
            raise ExpressionError(f"unexpected character at {pos}: {src[pos]!r}")
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("var") is not None:
            out.append(("var", m.group("var")))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    out.append(("eof", ""))
    return out


# AST: ("num", value) | ("var", name) | ("call", name, [args]) |
#      ("un", op, a) | ("bin", op, a, b) | ("cond", c, a, b)


class _Parser:
    """One method per Javascript.g4 precedence level, lowest first."""

    def __init__(self, tokens: List[Tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> Tuple[str, str]:
        return self.toks[self.i]

    def take(self, op: str | None = None):
        kind, val = self.toks[self.i]
        if op is not None and (kind != "op" or val != op):
            raise ExpressionError(f"expected {op!r}, got {val!r}")
        self.i += 1
        return kind, val

    def parse(self):
        e = self.conditional()
        if self.peek()[0] != "eof":
            raise ExpressionError(f"trailing input: {self.peek()[1]!r}")
        return e

    def conditional(self):
        c = self.boolor()
        if self.peek() == ("op", "?"):
            self.take("?")
            a = self.conditional()
            self.take(":")
            b = self.conditional()  # right-assoc
            return ("cond", c, a, b)
        return c

    def _binlevel(self, ops, next_level):
        e = next_level()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.take()[1]
            e = ("bin", op, e, next_level())
        return e

    def boolor(self):
        return self._binlevel({"||"}, self.booland)

    def booland(self):
        return self._binlevel({"&&"}, self.bwor)

    def bwor(self):
        return self._binlevel({"|"}, self.bwxor)

    def bwxor(self):
        return self._binlevel({"^"}, self.bwand)

    def bwand(self):
        return self._binlevel({"&"}, self.eqne)

    def eqne(self):
        return self._binlevel({"==", "!="}, self.comparison)

    def comparison(self):
        return self._binlevel({"<", "<=", ">", ">="}, self.shift)

    def shift(self):
        return self._binlevel({"<<", ">>", ">>>"}, self.addsub)

    def addsub(self):
        return self._binlevel({"+", "-"}, self.muldiv)

    def muldiv(self):
        return self._binlevel({"*", "/", "%"}, self.unary)

    def unary(self):
        kind, val = self.peek()
        if kind == "op" and val in ("!", "~", "+", "-"):
            self.take()
            return ("un", val, self.unary())
        return self.primary()

    def primary(self):
        kind, val = self.peek()
        if kind == "op" and val == "(":
            self.take("(")
            e = self.conditional()
            self.take(")")
            return e
        if kind == "num":
            self.take()
            if re.fullmatch(r"0[xX][0-9a-fA-F]+", val):
                return ("num", repr(int(val, 16)))
            if re.fullmatch(r"0[0-7]+", val):
                return ("num", repr(int(val, 8)))
            return ("num", val)
        if kind == "var":
            self.take()
            if self.peek() == ("op", "("):
                self.take("(")
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.conditional())
                    while self.peek() == ("op", ","):
                        self.take(",")
                        args.append(self.conditional())
                self.take(")")
                return ("call", val, args)
            return ("var", val)
        raise ExpressionError(f"unexpected token {val!r}")


_MAX_LONG = "9223372036854775807"
_MIN_LONG = "-9223372036854775808"
_NAN = "CAST('NaN' AS DOUBLE)"
_PINF = "CAST('Infinity' AS DOUBLE)"
_NINF = "CAST('-Infinity' AS DOUBLE)"


def _hav(lat1, lon1, lat2, lon2, radius_m: float) -> str:
    """Shared great-circle expression (same IEEE shape as
    geo.haversine_meters / the geo oracles)."""
    return (
        f"(2 * {radius_m!r}) * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


def _emit(node, bindings: Dict[str, str], dialect: str) -> str:
    """Emit `node` as a DOUBLE-valued SQL expression."""
    duck = dialect == "duckdb"

    def e(n) -> str:
        return _emit(n, bindings, dialect)

    def as_long(n) -> str:
        # Java (long) cast semantics: NaN -> 0, out-of-range clamps to
        # MIN/MAX_LONG, truncation toward zero. Spark's CAST truncates
        # but ANSI-throws on NaN/overflow; DuckDB's CAST rounds and
        # errors on overflow — both get the explicit CASE, with
        # TRY_CAST in the reachable branch so constant folding of an
        # unreached branch can never raise.
        x = e(n)
        tr = f"trunc({x})" if duck else x
        return (
            f"(CASE WHEN isnan({x}) THEN CAST(0 AS BIGINT)"
            f" WHEN ({x}) >= 9.223372036854775807e18 THEN CAST({_MAX_LONG} AS BIGINT)"
            f" WHEN ({x}) <= -9.223372036854775808e18 THEN CAST({_MIN_LONG} AS BIGINT)"
            f" ELSE TRY_CAST({tr} AS BIGINT) END)"
        )

    def as_bool(n) -> str:
        return f"(({e(n)}) <> 0.0)"

    def bool_to_d(cond: str) -> str:
        return f"(CASE WHEN {cond} THEN 1.0 ELSE 0.0 END)"

    kind = node[0]
    if kind == "num":
        # always DOUBLE: DuckDB types bare decimal literals as DECIMAL,
        # which would propagate fixed-point arithmetic into the oracle
        return f"CAST({node[1]} AS DOUBLE)"
    if kind == "var":
        name = node[1]
        if name not in bindings:
            raise ExpressionError(f"unbound variable {name!r}")
        return f"(CAST({bindings[name]} AS DOUBLE))"
    if kind == "un":
        op, a = node[1], node[2]
        if op == "+":
            return e(a)
        if op == "-":
            return f"(- ({e(a)}))"
        if op == "!":
            return bool_to_d(f"(({e(a)}) = 0.0)")
        # ~ : bitwise not over the long cast, back to double
        return f"(CAST(~{as_long(a)} AS DOUBLE))"
    if kind == "bin":
        op, a, b = node[1], node[2], node[3]
        if op in ("+", "-", "*"):
            return f"(({e(a)}) {op} ({e(b)}))"
        if op == "/":
            # Java double division: x/0 is ±Infinity (NaN for 0/0 or
            # NaN/0). Spark ANSI throws DIVIDE_BY_ZERO and DuckDB
            # returns NULL, so the zero-divisor case is made explicit;
            # try_divide keeps Catalyst constant folding from raising
            # inside the unreached branch. NaN divisors fall through
            # (NaN = 0.0 is false on both engines) and yield NaN.
            A, B = e(a), e(b)
            div = f"(({A}) / ({B}))" if duck else f"try_divide({A}, {B})"
            return (
                f"(CASE WHEN ({B}) = 0.0 THEN"
                f" (CASE WHEN isnan({A}) OR ({A}) = 0.0 THEN {_NAN}"
                f" WHEN ({A}) > 0.0 THEN {_PINF} ELSE {_NINF} END)"
                f" ELSE {div} END)"
            )
        if op == "%":
            # Both engines' double % keeps the dividend's sign and
            # matches Java's IEEE remainder corners (Inf % y = NaN,
            # x % Inf = x, NaN propagates) — only the zero divisor
            # diverges (Java: NaN; Spark ANSI: REMAINDER_BY_ZERO;
            # DuckDB: NULL) and gets the guard.
            A, B = e(a), e(b)
            mod = f"(({A}) % ({B}))" if duck else f"try_mod({A}, {B})"
            return f"(CASE WHEN ({B}) = 0.0 THEN {_NAN} ELSE {mod} END)"
        if op in ("<", "<=", ">", ">="):
            # Java comparisons are false when either side is NaN; both
            # engines instead order NaN above every double.
            A, B = e(a), e(b)
            return bool_to_d(
                f"(NOT isnan({A}) AND NOT isnan({B}) AND (({A}) {op} ({B})))"
            )
        if op == "==":
            A, B = e(a), e(b)
            return bool_to_d(
                f"(NOT isnan({A}) AND NOT isnan({B}) AND (({A}) = ({B})))"
            )
        if op == "!=":
            A, B = e(a), e(b)
            return bool_to_d(f"(isnan({A}) OR isnan({B}) OR (({A}) <> ({B})))")
        if op == "&&":
            return bool_to_d(f"({as_bool(a)} AND {as_bool(b)})")
        if op == "||":
            return bool_to_d(f"({as_bool(a)} OR {as_bool(b)})")
        if op in ("&", "|", "^"):
            la, lb = as_long(a), as_long(b)
            if op == "^" and duck:
                return f"(CAST(xor({la}, {lb}) AS DOUBLE))"
            return f"(CAST(({la} {op} {lb}) AS DOUBLE))"
        if op in ("<<", ">>", ">>>"):
            la = as_long(a)
            s = f"({as_long(b)} & 63)"  # Java masks the count
            if op == "<<":
                if duck:
                    two64 = "CAST(18446744073709551616 AS HUGEINT)"
                    half = "CAST(9223372036854775808 AS HUGEINT)"
                    return (
                        f"(CAST(CAST((((CAST({la} AS HUGEINT) * "
                        f"(CAST(1 AS HUGEINT) << {s}) + {half}) % {two64} "
                        f"+ {two64}) % {two64} - {half}) AS BIGINT) AS DOUBLE))"
                    )
                return f"(CAST(shiftleft({la}, CAST({s} AS INT)) AS DOUBLE))"
            if op == ">>":
                if duck:
                    return f"(CAST(({la} >> {s}) AS DOUBLE))"
                return f"(CAST(shiftright({la}, CAST({s} AS INT)) AS DOUBLE))"
            if duck:
                return (
                    f"(CAST((CASE WHEN {s} = 0 THEN {la} ELSE "
                    f"(({la} >> {s}) & ({_MAX_LONG} >> ({s} - 1))) END) AS DOUBLE))"
                )
            return f"(CAST(shiftrightunsigned({la}, CAST({s} AS INT)) AS DOUBLE))"
        raise ExpressionError(f"unknown operator {op!r}")
    if kind == "cond":
        c, a, b = node[1], node[2], node[3]
        return f"(CASE WHEN {as_bool(c)} THEN {e(a)} ELSE {e(b)} END)"
    if kind == "call":
        name, args = node[1], node[2]
        n = len(args)
        xs = [e(a) for a in args]

        def need(k):
            if n != k:
                raise ExpressionError(f"{name} expects {k} args, got {n}")

        same = {
            "abs": 1, "acos": 1, "asin": 1, "atan": 1, "atan2": 2,
            "ceil": 1, "cos": 1, "exp": 1, "floor": 1, "log10": 1,
            "sin": 1, "sqrt": 1, "tan": 1,
        }
        if name in same:
            need(same[name])
            return f"{name}({', '.join(xs)})"
        if name == "ln":
            need(1)
            return f"ln({xs[0]})"
        if name == "logn":
            need(2)
            return f"(ln({xs[1]}) / ln({xs[0]}))"
        if name == "pow":
            need(2)
            return f"pow({xs[0]}, {xs[1]})"
        if name in ("min", "max"):
            need(2)
            # Java Math.min/max propagate NaN; both engines order NaN
            # as the largest double (least would drop it, greatest
            # happens to keep it) — make the propagation explicit.
            fn = "least" if name == "min" else "greatest"
            return (
                f"(CASE WHEN isnan({xs[0]}) OR isnan({xs[1]}) THEN {_NAN}"
                f" ELSE {fn}({xs[0]}, {xs[1]}) END)"
            )
        # hyperbolics + inverses: DuckDB lacks them, so BOTH dialects
        # share the closed forms (identical IEEE expression trees)
        if name == "sinh":
            need(1)
            x = xs[0]
            return f"((exp({x}) - exp(-({x}))) / 2)"
        if name == "cosh":
            need(1)
            x = xs[0]
            return f"((exp({x}) + exp(-({x}))) / 2)"
        if name == "tanh":
            need(1)
            x = xs[0]
            return f"((exp(2 * ({x})) - 1) / (exp(2 * ({x})) + 1))"
        if name == "asinh":
            need(1)
            x = xs[0]
            return f"ln(({x}) + sqrt(({x}) * ({x}) + 1))"
        if name == "acosh":
            need(1)
            x = xs[0]
            return f"ln(({x}) + sqrt(({x}) * ({x}) - 1))"
        if name == "atanh":
            need(1)
            x = xs[0]
            return f"(0.5 * ln((1 + ({x})) / (1 - ({x}))))"
        if name == "haversin":
            need(4)
            return f"({_hav(*xs, 6371008.7714)} / 1000.0)"
        if name == "haversinMeters":
            need(4)
            return _hav(*xs, 6371008.7714)
        raise ExpressionError(f"unknown function {name!r}")
    raise ExpressionError(f"bad node {node!r}")


@dataclass(frozen=True)
class CompiledExpression:
    """Paired emission of one source expression.

    ``spark_sql`` evaluates via ``F.expr`` (codegen, no UDF);
    ``duckdb_sql`` is the oracle dual. Bind variables per dialect via
    the ``bindings`` maps given to :func:`compile_expression`."""

    source: str
    spark_sql: str
    duckdb_sql: str

    def column(self):
        from pyspark.sql import functions as F

        return F.expr(self.spark_sql)


def compile_expression(
    source: str,
    bindings: Dict[str, str] | None = None,
    duckdb_bindings: Dict[str, str] | None = None,
) -> CompiledExpression:
    """Compile an expressions-language source string against variable
    bindings (name → SQL fragment per dialect; ``duckdb_bindings``
    defaults to the Spark bindings, which suffices when variables are
    plain column names)."""
    ast = _Parser(_tokenize(source)).parse()
    b = bindings or {}
    db = duckdb_bindings if duckdb_bindings is not None else b
    return CompiledExpression(
        source=source,
        spark_sql=_emit(ast, b, "spark"),
        duckdb_sql=_emit(ast, db, "duckdb"),
    )
