"""Filter-DSL parser tests (reference parity: test/filter/test_parser.py)."""

import pytest

from parq_tools_spark.plans.query_parser import (
    FilterParseError,
    extract_referenced_columns,
    filter_to_sql,
    parse_filter,
    validate_filter,
)


def test_simple_comparison():
    node = parse_filter("x > 5")
    assert node.column == "x" and node.op == ">" and node.value == 5


def test_float_and_string_literals():
    assert parse_filter("y <= 2.5").value == 2.5
    assert parse_filter("name == 'abc'").value == "abc"
    assert parse_filter('name != "d e f"').value == "d e f"


def test_in_list():
    node = parse_filter("x in [1, 2, 3]")
    assert node.values == (1, 2, 3)
    node = parse_filter("s in ['a', 'b']")
    assert node.values == ("a", "b")


def test_boolean_precedence():
    # and binds tighter than or
    node = parse_filter("a > 1 or b > 2 and c > 3")
    assert node.op == "or"
    assert node.right.op == "and"


def test_parens_override():
    node = parse_filter("(a > 1 or b > 2) and c > 3")
    assert node.op == "and"
    assert node.left.op == "or"


def test_mixed_type_in_list_rejected():
    with pytest.raises(FilterParseError):
        parse_filter("x in [1, 'a']")


def test_malformed_rejected():
    for bad in ["x >", "> 5", "x == ", "x in [1,", "x ?? 3", "", "x > 5 y"]:
        with pytest.raises(FilterParseError):
            parse_filter(bad)


def test_referenced_columns():
    assert extract_referenced_columns("a > 1 and (b < 2 or c in [1])") == {
        "a",
        "b",
        "c",
    }


def test_validate_missing_columns():
    with pytest.raises(FilterParseError, match="missing"):
        validate_filter("a > 1 and d < 2", ["a", "b", "c"])


def test_filter_to_sql():
    sql = filter_to_sql("a > 1 and s == 'x' or b in [1, 2]")
    assert sql == '((("a" > 1) AND ("s" = \'x\')) OR ("b" IN (1, 2)))'


def test_sql_escapes_quotes():
    # a single quote inside a double-quoted DSL literal must be doubled in SQL
    assert filter_to_sql('s == "a\'b"') == '("s" = \'a\'\'b\')'


def test_sql_quotes_keyword_columns():
    # a column named like a SQL keyword must emit valid SQL
    import duckdb

    sql = filter_to_sql("as > 0")
    con = duckdb.connect()
    con.execute('CREATE TABLE t ("as" DOUBLE)')
    con.execute("INSERT INTO t VALUES (1)")
    assert con.sql(f"SELECT count(*) FROM t WHERE {sql}").fetchone()[0] == 1
