"""Property-based parser tests (hypothesis): random ASTs round-trip
through DSL text and SQL emission without loss."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from parq_tools_spark.plans.query_parser import (
    BoolOp,
    Comparison,
    InList,
    extract_referenced_columns,
    filter_to_sql,
    parse_filter,
)

_colnames = st.text(
    alphabet=string.ascii_lowercase + "_", min_size=1, max_size=8
).filter(lambda s: s not in {"and", "or", "in"} and not s[0].isdigit())

_numbers = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ).map(lambda f: round(f, 4)),
)
_strings = st.text(
    alphabet=string.ascii_letters + string.digits + " _.-", max_size=12
)
_ops = st.sampled_from([">", "<", ">=", "<=", "==", "!="])


@st.composite
def comparisons(draw):
    return Comparison(draw(_colnames), draw(_ops), draw(st.one_of(_numbers, _strings)))


@st.composite
def in_lists(draw):
    # homogeneous: all-numeric or all-string (mixed lists are rejected)
    if draw(st.booleans()):
        values = draw(st.lists(_numbers, min_size=1, max_size=4))
    else:
        values = draw(st.lists(_strings, min_size=1, max_size=4))
    return InList(draw(_colnames), tuple(values))


def _asts(depth: int = 3):
    leaf = st.one_of(comparisons(), in_lists())
    if depth == 0:
        return leaf
    sub = _asts(depth - 1)
    return st.one_of(
        leaf,
        st.builds(BoolOp, st.sampled_from(["and", "or"]), sub, sub),
    )


def _to_dsl(node, parent_op: str | None = None) -> str:
    if isinstance(node, Comparison):
        value = node.value
        if isinstance(value, str):
            value = "'" + value + "'" if "'" not in value else '"' + value + '"'
        return f"{node.column} {node.op} {value}"
    if isinstance(node, InList):
        vals = ", ".join(
            f"'{v}'" if isinstance(v, str) else repr(v) for v in node.values
        )
        return f"{node.column} in [{vals}]"
    # always parenthesize children: the property under test is that the
    # parser honors explicit grouping exactly
    return f"({_to_dsl(node.left, node.op)} {node.op} {_to_dsl(node.right, node.op)})"


def _normalize(node):
    """Int/float distinction washes out through repr for values like 2.0."""
    if isinstance(node, Comparison):
        v = node.value
        return ("cmp", node.column, node.op, repr(v))
    if isinstance(node, InList):
        return ("in", node.column, tuple(repr(v) for v in node.values))
    return ("bool", node.op, _normalize(node.left), _normalize(node.right))


@settings(max_examples=200, deadline=None)
@given(_asts())
def test_ast_roundtrips_through_dsl(ast):
    text = _to_dsl(ast)
    reparsed = parse_filter(text)
    assert _normalize(reparsed) == _normalize(ast)


@settings(max_examples=100, deadline=None)
@given(_asts())
def test_sql_emission_never_crashes_and_quotes_strings(ast):
    sql = filter_to_sql(_to_dsl(ast))
    assert sql.count("(") == sql.count(")")
    cols = extract_referenced_columns(_to_dsl(ast))
    assert cols  # at least one column referenced


@settings(max_examples=100, deadline=None)
@given(comparisons())
def test_comparison_sql_matches_duckdb_parse(cmp):
    """Emitted SQL for a single comparison is valid DuckDB syntax."""
    import duckdb

    sql = filter_to_sql(_to_dsl(cmp))
    con = duckdb.connect()
    # validate syntactically against a one-row relation with that column
    col = cmp.column
    typ = "VARCHAR" if isinstance(cmp.value, str) else "DOUBLE"
    val = "'x'" if typ == "VARCHAR" else "1"
    con.execute(f'CREATE TABLE t ("{col}" {typ})')
    con.execute(f"INSERT INTO t VALUES ({val})")
    con.execute(f"SELECT * FROM t WHERE {sql}")  # must not raise
