"""Pandas-like filter DSL -> PySpark ``Column`` / ANSI SQL translator.

Re-implements the grammar of the reference's filter DSL
(``/root/reference/parq_tools/utils/_query_parser.py:7-31``) as a
dependency-free recursive-descent parser.  The reference compiles the
same grammar to a ``pyarrow.compute.Expression``; here the AST is
compiled to a :class:`pyspark.sql.Column` so Catalyst can push the
predicate into the Parquet scan (``PushedFilters`` in the physical
plan) — the Spark-native equivalent of handing the expression to
``dataset.scanner(filter=...)``.

Grammar (identical surface to the reference)::

    expr    := term ("or" term)*
    term    := factor ("and" factor)*
    factor  := "(" expr ")" | comparison
    comparison := COLUMN OP literal | COLUMN "in" "[" literal ("," literal)* "]"
    OP      := ">" | "<" | ">=" | "<=" | "==" | "!="
    literal := INT | FLOAT | 'single' | "double" quoted string

Mixed-type ``in`` lists are rejected, matching
``_query_parser.py:89-101``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterator, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "FilterParseError",
    "parse_filter",
    "build_filter_expression",
    "filter_to_sql",
    "extract_referenced_columns",
    "validate_filter",
]


class FilterParseError(ValueError):
    """Raised when the filter DSL cannot be parsed or validated."""


# ---------------------------------------------------------------- AST nodes
@dataclass(frozen=True)
class Comparison:
    column: str
    op: str  # > < >= <= == !=
    value: Union[int, float, str]


@dataclass(frozen=True)
class InList:
    column: str
    values: tuple


@dataclass(frozen=True)
class BoolOp:
    op: str  # and | or
    left: "Node"
    right: "Node"


Node = Union[Comparison, InList, BoolOp]


# ---------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<OP>>=|<=|==|!=|>|<)
  | (?P<LPAREN>\()
  | (?P<RPAREN>\))
  | (?P<LBRACK>\[)
  | (?P<RBRACK>\])
  | (?P<COMMA>,)
  | (?P<FLOAT>-?\d+\.\d*|-?\.\d+)
  | (?P<INT>-?\d+)
  | (?P<STRING>'[^']*'|"[^"]*")
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class _Tok:
    kind: str
    text: str


def _tokenize(src: str) -> Iterator[_Tok]:
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise FilterParseError(
                f"Invalid filter syntax at position {pos}: {src[pos:pos + 20]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        yield _Tok(kind, m.group())
    yield _Tok("EOF", "")


class _Parser:
    def __init__(self, src: str):
        self._src = src
        self._toks = list(_tokenize(src))
        self._i = 0

    def _peek(self) -> _Tok:
        return self._toks[self._i]

    def _next(self) -> _Tok:
        tok = self._toks[self._i]
        self._i += 1
        return tok

    def _expect(self, kind: str) -> _Tok:
        tok = self._next()
        if tok.kind != kind:
            raise FilterParseError(
                f"Expected {kind} but found {tok.text!r} in filter {self._src!r}"
            )
        return tok

    def parse(self) -> Node:
        node = self._expr()
        tok = self._peek()
        if tok.kind != "EOF":
            raise FilterParseError(
                f"Unexpected trailing input {tok.text!r} in filter {self._src!r}"
            )
        return node

    def _expr(self) -> Node:
        node = self._term()
        while self._peek().kind == "NAME" and self._peek().text.lower() == "or":
            self._next()
            node = BoolOp("or", node, self._term())
        return node

    def _term(self) -> Node:
        node = self._factor()
        while self._peek().kind == "NAME" and self._peek().text.lower() == "and":
            self._next()
            node = BoolOp("and", node, self._factor())
        return node

    def _factor(self) -> Node:
        tok = self._peek()
        if tok.kind == "LPAREN":
            self._next()
            node = self._expr()
            self._expect("RPAREN")
            return node
        if tok.kind != "NAME":
            raise FilterParseError(
                f"Expected column name but found {tok.text!r} in filter {self._src!r}"
            )
        column = self._next().text
        nxt = self._peek()
        if nxt.kind == "OP":
            op = self._next().text
            return Comparison(column, op, self._literal())
        if nxt.kind == "NAME" and nxt.text.lower() == "in":
            self._next()
            self._expect("LBRACK")
            values = [self._literal()]
            while self._peek().kind == "COMMA":
                self._next()
                values.append(self._literal())
            self._expect("RBRACK")
            kinds = {type(v) for v in values}
            # int/float may mix per the numeric tower, but str+numeric may not
            # (reference rejects mixed-type lists, _query_parser.py:95-101)
            if str in kinds and kinds != {str}:
                raise FilterParseError(
                    f"Mixed-type 'in' list for column {column!r}: {values!r}"
                )
            return InList(column, tuple(values))
        raise FilterParseError(
            f"Expected comparison operator or 'in' after column {column!r} "
            f"in filter {self._src!r}"
        )

    def _literal(self):
        tok = self._next()
        if tok.kind == "INT":
            return int(tok.text)
        if tok.kind == "FLOAT":
            return float(tok.text)
        if tok.kind == "STRING":
            return tok.text[1:-1]
        raise FilterParseError(
            f"Expected literal value but found {tok.text!r} in filter {self._src!r}"
        )


# ---------------------------------------------------------------- public API
def parse_filter(expression: str) -> Node:
    """Parse the filter DSL into an AST."""
    if not expression or not expression.strip():
        raise FilterParseError("Empty filter expression")
    return _Parser(expression).parse()


def _to_column(node: Node) -> Column:
    if isinstance(node, Comparison):
        col = F.col(node.column)
        return {
            ">": col.__gt__,
            "<": col.__lt__,
            ">=": col.__ge__,
            "<=": col.__le__,
            "==": col.__eq__,
            "!=": col.__ne__,
        }[node.op](F.lit(node.value))
    if isinstance(node, InList):
        return F.col(node.column).isin(list(node.values))
    if isinstance(node, BoolOp):
        left, right = _to_column(node.left), _to_column(node.right)
        return left & right if node.op == "and" else left | right
    raise TypeError(f"Unknown AST node {node!r}")


def build_filter_expression(expression: str, columns=None) -> Column:
    """DSL string -> pyspark ``Column``, optionally validating columns.

    Spark-native analogue of ``build_filter_expression``
    (``_query_parser.py:34-67``): instead of a ``pc.Expression`` handed
    to an Arrow scanner, we emit a ``Column`` that Catalyst pushes into
    the Parquet scan.
    """
    node = parse_filter(expression)
    if columns is not None:
        validate_filter(node, columns)
    return _to_column(node)


def _sql_literal(value) -> str:
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    return repr(value)


def _sql_ident(name: str) -> str:
    """ANSI-quoted identifier — a column named like a SQL keyword
    (``as``, ``select``, ...) is legal in the DSL and must stay legal
    in the emitted SQL."""
    return '"' + name.replace('"', '""') + '"'


def _to_sql(node: Node) -> str:
    if isinstance(node, Comparison):
        op = "=" if node.op == "==" else ("<>" if node.op == "!=" else node.op)
        return f"({_sql_ident(node.column)} {op} {_sql_literal(node.value)})"
    if isinstance(node, InList):
        vals = ", ".join(_sql_literal(v) for v in node.values)
        return f"({_sql_ident(node.column)} IN ({vals}))"
    if isinstance(node, BoolOp):
        return f"({_to_sql(node.left)} {node.op.upper()} {_to_sql(node.right)})"
    raise TypeError(f"Unknown AST node {node!r}")


def filter_to_sql(expression: str) -> str:
    """DSL string -> equivalent ANSI SQL predicate (for oracles/SQL API)."""
    return _to_sql(parse_filter(expression))


def extract_referenced_columns(node_or_expr) -> set:
    """Set of column names referenced by a filter (``_query_parser.py:118-144``)."""
    node = (
        parse_filter(node_or_expr) if isinstance(node_or_expr, str) else node_or_expr
    )
    out: set = set()

    def walk(n: Node) -> None:
        if isinstance(n, (Comparison, InList)):
            out.add(n.column)
        else:
            walk(n.left)
            walk(n.right)

    walk(node)
    return out


def validate_filter(node_or_expr, available_columns) -> None:
    """Raise if the filter references columns absent from ``available_columns``.

    Mirrors the reference's pre-flight validation
    (``parq_concat.py:277-306``) so callers get a clear error before
    Spark's analyzer does.
    """
    missing = sorted(extract_referenced_columns(node_or_expr) - set(available_columns))
    if missing:
        raise FilterParseError(
            "Filter references columns missing from the dataset: "
            + ", ".join(missing)
        )
