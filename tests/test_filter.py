"""Filter operator tests (reference parity: test/filter/test_filter.py)."""

import os

from pyspark.sql import functions as F

from parq_tools_spark.operators.filter import filter_dataframe, filter_parquet
from parq_tools_spark.sources.parquet_io import check_valid_parquet, read_parquet


def test_filter_lineitem_dsl(spark, sf_dir):
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    out = filter_dataframe(li, "l_quantity > 30 and l_returnflag == 'R'")
    rows = out.collect()
    assert rows
    assert all(r.l_quantity > 30 and r.l_returnflag == "R" for r in rows)


def test_projection_with_index_columns(spark, sf_dir):
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    out = filter_dataframe(
        li,
        "l_discount >= 0.05",
        columns=["l_quantity", "l_orderkey"],
        index_columns=["l_orderkey", "l_linenumber"],
    )
    # index columns first, de-duplicated
    assert out.columns == ["l_orderkey", "l_linenumber", "l_quantity"]


def test_in_list_filter(spark, sf_dir):
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    out = filter_dataframe(li, "l_returnflag in ['A', 'N']")
    flags = {r.l_returnflag for r in out.select("l_returnflag").distinct().collect()}
    assert flags <= {"A", "N"}


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = read_parquet(spark, os.path.join(sf_dir, "lineitem.parquet"))
    out = filter_dataframe(li, "l_quantity > 30", columns=["l_quantity"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_filter_parquet_end_to_end(spark, sf_dir, tmp_path):
    out_path = str(tmp_path / "filtered")
    filter_parquet(
        spark,
        os.path.join(sf_dir, "lineitem.parquet"),
        out_path,
        "l_quantity > 45",
        columns=["l_orderkey", "l_quantity"],
    )
    result = spark.read.parquet(out_path)
    assert result.columns == ["l_orderkey", "l_quantity"]
    assert result.filter(F.col("l_quantity") <= 45).count() == 0
    assert result.count() > 0


def test_filter_parquet_progress_callback(spark, sf_dir, tmp_path):
    """The facade reports task progress through the callback: at least
    the final completion call, with done == total > 0."""
    calls = []
    filter_parquet(
        spark,
        os.path.join(sf_dir, "lineitem.parquet"),
        str(tmp_path / "filtered_progress"),
        "l_quantity > 45",
        columns=["l_orderkey", "l_quantity"],
        progress_callback=lambda desc, done, total: calls.append(
            (desc, done, total)
        ),
    )
    assert calls, "progress callback never invoked"
    desc, done, total = calls[-1]
    assert desc == "filter_parquet"
    assert total > 0 and done == total


def test_job_progress_counts_tasks(spark):
    """job_progress sees the real task counters of actions run inside
    the block (multi-partition job => total >= partition count)."""
    from parq_tools_spark.sources.progress import job_progress

    calls = []
    with job_progress(
        spark, "count_job", lambda d, c, t: calls.append((c, t)), interval=0.05
    ):
        spark.range(0, 1_000_000, 1, 8).selectExpr("sum(id)").collect()
    done, total = calls[-1]
    assert total >= 8
    assert done == total


def test_check_valid_parquet(sf_dir, tmp_path):
    assert check_valid_parquet(os.path.join(sf_dir, "lineitem.parquet"))
    bogus = tmp_path / "not_parquet.parquet"
    bogus.write_text("hello")
    assert not check_valid_parquet(str(bogus))
    assert not check_valid_parquet(str(tmp_path / "missing.parquet"))


def test_dsl_null_semantics_match_sql(spark):
    """P7: nulls are excluded by every comparison, including !=, in both
    the Spark DSL compilation and ANSI SQL (DuckDB) — unlike pandas
    object-equality. Checked against a live DuckDB evaluation."""
    import duckdb

    from parq_tools_spark.operators.filter import filter_dataframe
    from parq_tools_spark.plans.query_parser import filter_to_sql

    data = [(1, 10.0), (2, None), (3, 30.0)]
    df = spark.createDataFrame(data, "id int, v double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", data)
    for expr in ["v > 15.0", "v != 10.0", "v <= 30.0", "v in [10.0, 30.0]"]:
        spark_ids = sorted(r.id for r in filter_dataframe(df, expr).collect())
        sql_ids = sorted(
            r[0]
            for r in con.execute(
                f"SELECT id FROM t WHERE {filter_to_sql(expr)}"
            ).fetchall()
        )
        assert spark_ids == sql_ids, expr
        assert 2 not in spark_ids  # the null row never passes


def test_top_level_api_surface():
    """Reference-style root imports (README contract)."""
    import parq_tools_spark as pts

    for name in pts.__all__:
        assert getattr(pts, name) is not None


def test_job_progress_truthful_on_failure(spark):
    """If the block raises, the final callback must NOT claim 100%
    completion of work that never ran."""
    from parq_tools_spark.sources.progress import job_progress

    calls = []
    try:
        with job_progress(spark, "boom", lambda d, c, t: calls.append((c, t))):
            raise RuntimeError("no jobs ever ran")
    except RuntimeError:
        pass
    done, total = calls[-1]
    assert (done, total) == (0, 0)
