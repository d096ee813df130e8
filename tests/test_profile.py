"""Profile tests (reference parity: test/profile/)."""

import math
import os

from parq_tools_spark.operators.profile import (
    compare_profiles,
    profile_dataframe,
)
from parq_tools_spark.operators.schema_tools import (
    get_table_metadata,
    read_pandas_metadata,
    rename_columns,
    rename_parquet,
    set_table_metadata,
    update_column_metadata,
)


def test_profile_numeric_column(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    prof = profile_dataframe(li, ["l_quantity", "l_returnflag"], exact_distinct=True)
    q = prof["l_quantity"]
    pdf = li.select("l_quantity").toPandas()["l_quantity"]
    assert q["n"] == len(pdf)
    assert math.isclose(q["mean"], pdf.mean(), rel_tol=1e-9)
    assert math.isclose(q["std"], pdf.std(), rel_tol=1e-9)
    assert q["min"] == pdf.min() and q["max"] == pdf.max()
    assert q["n_missing"] == 0 and q["p_missing"] == 0.0
    assert q["n_distinct"] == pdf.nunique()


def test_profile_string_column_has_no_mean(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    prof = profile_dataframe(li, ["l_returnflag"])
    flag = prof["l_returnflag"]
    assert flag["mean"] is None and flag["std"] is None
    assert flag["min"] is not None  # strings still min/max


def test_profile_counts_missing(spark):
    df = spark.createDataFrame([(1.0,), (None,), (3.0,), (None,)], "v double")
    prof = profile_dataframe(df)["v"]
    assert prof["n"] == 2 and prof["n_missing"] == 2 and prof["p_missing"] == 0.5


def test_compare_profiles_statuses(spark):
    df1 = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    df2 = spark.createDataFrame([(1.0,), (2.0000001,)], "v double")
    p1, p2 = profile_dataframe(df1), profile_dataframe(df2)
    strict = compare_profiles(p1, p2)
    assert not strict["match"]
    loose = compare_profiles(p1, p2, rel_tol=1e-3)
    assert loose["summary"]["changed"] == 0
    assert loose["summary"]["within_tolerance"] > 0


def test_compare_profiles_added_removed(spark):
    df1 = spark.createDataFrame([(1.0, 1)], "a double, b int")
    df2 = spark.createDataFrame([(1.0,)], "a double")
    report = compare_profiles(profile_dataframe(df1), profile_dataframe(df2))
    assert report["removed_columns"] == ["b"]
    assert not report["match"]


# ------------------------------------------------------------ schema tools
def test_rename_columns(spark, wide_tables):
    df = spark.read.parquet(wide_tables["wide_1"])
    out = rename_columns(df, {"a": "alpha"})
    assert out.columns == ["x", "y", "z", "alpha"]


def test_rename_missing_column_errors(spark, wide_tables):
    import pytest

    df = spark.read.parquet(wide_tables["wide_1"])
    with pytest.raises(ValueError, match="missing"):
        rename_columns(df, {"nope": "x2"})


def test_rename_parquet_with_metadata(spark, wide_tables, tmp_path):
    out_path = str(tmp_path / "renamed")
    rename_parquet(
        spark,
        wide_tables["wide_1"],
        out_path,
        {"a": "alpha"},
        column_metadata={"alpha": {"unit": "furlongs"}},
        table_metadata={"source": "test-suite"},
        single_file=True,
    )
    df = spark.read.parquet(out_path)
    assert "alpha" in df.columns
    assert df.schema["alpha"].metadata.get("unit") == "furlongs"
    assert get_table_metadata(out_path).get("source") == "test-suite"


def test_column_metadata_roundtrip(spark, wide_tables, tmp_path):
    df = spark.read.parquet(wide_tables["wide_1"])
    df = update_column_metadata(df, {"a": {"desc": "letters"}})
    out = str(tmp_path / "meta")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.schema["a"].metadata.get("desc") == "letters"


def test_read_pandas_metadata(wide_tables):
    meta = read_pandas_metadata(wide_tables["wide_1"])
    assert meta is not None and "columns" in meta


def test_set_table_metadata_preserves_data(spark, wide_tables, tmp_path):
    import shutil

    p = str(tmp_path / "copy.parquet")
    shutil.copy(wide_tables["wide_1"], p)
    set_table_metadata(p, {"k1": "v1"})
    assert get_table_metadata(p)["k1"] == "v1"
    assert spark.read.parquet(p).count() == 10


def test_save_profile_report(spark, tmp_path):
    import json

    from parq_tools_spark.operators.profile import (
        compare_profiles,
        profile_dataframe,
        save_profile_report,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    prof = profile_dataframe(df)
    p = tmp_path / "prof.json"
    fmt = save_profile_report(prof, str(p))
    assert fmt == "json"
    loaded = json.loads(p.read_text())
    assert loaded["v"]["n"] == 2

    diff = compare_profiles(prof, prof)
    save_profile_report(diff, str(tmp_path / "diff.json"))
    assert json.loads((tmp_path / "diff.json").read_text())["match"] is True


def test_merge_and_stamp_pandas_metadata(spark, wide_tables, tmp_path):
    from parq_tools_spark.operators.schema_tools import (
        merge_pandas_metadata,
        read_pandas_metadata,
        stamp_pandas_metadata,
    )

    merged = merge_pandas_metadata([wide_tables["wide_1"], wide_tables["wide_2"]])
    names = [c["name"] for c in merged["columns"]]
    assert "a" in names and "b" in names  # union of both inputs' columns

    out = str(tmp_path / "stamped")
    spark.read.parquet(wide_tables["wide_1"]).write.parquet(out)
    assert read_pandas_metadata(out) is None  # Spark writes no pandas blob
    stamp_pandas_metadata(out, [wide_tables["wide_1"], wide_tables["wide_2"]])
    blob = read_pandas_metadata(out)
    assert blob is not None and "a" in [c["name"] for c in blob["columns"]]
    # data still readable by Spark after the footer rewrite
    assert spark.read.parquet(out).count() == 10


def test_profile_approx_distinct_default(spark, sf_dir):
    """Default n_distinct is HLL++ — within ~5% of exact."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    approx = profile_dataframe(li, ["l_quantity"])["l_quantity"]["n_distinct"]
    exact = li.select("l_quantity").distinct().count()
    assert abs(approx - exact) <= max(2, 0.10 * exact)


def test_profile_full_surface(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    prof = profile_dataframe(
        li, ["l_quantity", "l_returnflag"], exact_distinct=True, full=True
    )
    q = prof["l_quantity"]
    pdf = li.select("l_quantity", "l_returnflag").toPandas()
    assert math.isclose(q["sum"], float(pdf.l_quantity.sum()), rel_tol=1e-9)
    assert q["n_zeros"] == int((pdf.l_quantity == 0).sum())
    assert q["n_negative"] == 0 and q["p_zeros"] == 0.0
    assert "skewness" in q and "kurtosis" in q
    # approx quantiles land within the value domain
    for k in ("p5", "p25", "p50", "p75", "p95"):
        assert q["min"] <= q[k] <= q["max"]
    assert q["p5"] <= q["p50"] <= q["p95"]
    flag = prof["l_returnflag"]
    assert flag["max_length"] == 1 and flag["mean_length"] == 1.0
    assert flag["is_unique"] is False
    assert 0 < flag["p_distinct"] < 0.01


def test_profile_alerts(spark):
    from parq_tools_spark.operators.profile import profile_alerts

    df = spark.createDataFrame(
        [(1, "a", 0.0, None), (1, "b", 0.0, 2.0), (1, "c", 5.0, None)],
        "const int, uniq string, zeros double, holes double",
    )
    prof = profile_dataframe(df, exact_distinct=True, full=True)
    alerts = profile_alerts(prof)
    assert "constant" in alerts["const"]
    assert "unique" in alerts["uniq"]
    assert "zeros" in alerts["zeros"]
    assert "missing" in alerts["holes"]


def test_profile_html_report(spark, sf_dir, tmp_path):
    from parq_tools_spark.operators.profile import (
        render_profile_html,
        save_profile_report,
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    prof = profile_dataframe(li, ["l_quantity", "l_returnflag"], full=True)
    p = tmp_path / "report.html"
    fmt = save_profile_report(prof, str(p))
    assert fmt == "html"
    html = p.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "l_quantity" in html and "l_returnflag" in html
    assert "n_distinct" in html and "<style>" in html

    # diff rendering carries status classes
    df2 = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    df3 = spark.createDataFrame([(1.0,), (9.0,)], "v double")
    diff = compare_profiles(
        profile_dataframe(df2, exact_distinct=True),
        profile_dataframe(df3, exact_distinct=True),
    )
    html2 = render_profile_html(diff, title="diff")
    assert "status-changed" in html2 and "Summary" in html2


def test_profile_partial_merge_matches_whole(spark, sf_dir):
    """Profiles computed on disjoint chunks and merged must equal the
    whole-table profile: moments exactly, n_distinct within HLL error."""
    from parq_tools_spark.operators.profile import (
        merge_profile_partials,
        profile_partial,
    )

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_quantity", "l_returnflag", "l_extendedprice"
    )
    whole = profile_dataframe(li, exact_distinct=True)

    chunks = li.randomSplit([1.0, 1.0, 1.0], seed=7)
    partials = [profile_partial(c) for c in chunks]
    merged_df = partials[0]
    for p in partials[1:]:
        merged_df = merged_df.unionByName(p)
    merged = merge_profile_partials(merged_df)

    for c in ["l_quantity", "l_returnflag", "l_extendedprice"]:
        w, m = whole[c], merged[c]
        assert m["n"] == w["n"] and m["n_missing"] == w["n_missing"]
        assert m["min"] == w["min"] and m["max"] == w["max"]
        if w["mean"] is not None:
            assert math.isclose(m["mean"], w["mean"], rel_tol=1e-9)
            assert math.isclose(m["std"], w["std"], rel_tol=1e-6)
        assert abs(m["n_distinct"] - w["n_distinct"]) <= max(
            2, 0.05 * w["n_distinct"]
        )


def test_column_metadata_normalization():
    import pytest

    from parq_tools_spark.operators.profile import ColumnMetadata

    assert ColumnMetadata.from_value("just text").description == "just text"
    m = ColumnMetadata.from_value(
        {"title": "Grade", "description": "Cu grade", "unit_of_measure": "%"}
    )
    assert m.units == "%"
    assert m.to_description_string() == "Grade: Cu grade | Units: %"
    assert ColumnMetadata.from_value(m) is m
    assert ColumnMetadata(description="x") == ColumnMetadata(description="x")
    with pytest.raises(TypeError):
        ColumnMetadata.from_value(42)
    assert ColumnMetadata(units="m").to_description_string("Depth") == (
        "Depth | Units: m"
    )


def test_profile_html_column_metadata(spark):
    from parq_tools_spark.operators.profile import render_profile_html

    df = spark.createDataFrame([(1.0,), (2.0,)], "grade double")
    prof = profile_dataframe(df, exact_distinct=True)
    html = render_profile_html(
        prof, column_metadata={"grade": {"description": "Cu grade", "units": "%"}}
    )
    assert "Cu grade" in html and "Units: %" in html and "description" in html


def test_partial_profile_overflow_reported_not_silent(spark):
    """Values whose squares exceed decimal(38,6) must yield std=None,
    not a corrupted variance or a crash."""
    from parq_tools_spark.operators.profile import (
        merge_profile_partials,
        profile_partial,
    )

    df = spark.createDataFrame([(1e18,), (2e18,), (3e18,)], "v double")
    merged = merge_profile_partials(profile_partial(df))
    assert merged["v"]["n"] == 3
    assert merged["v"]["std"] is None  # overflow reported, not faked


def test_approx_unique_not_asserted(spark):
    """With the HLL default, uniqueness is None and alerts say
    maybe_unique instead of claiming unique."""
    from parq_tools_spark.operators.profile import profile_alerts

    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    prof = profile_dataframe(df, full=True)  # approx default
    assert prof["k"]["is_unique"] is None
    a = profile_alerts(prof)
    assert "unique" not in a.get("k", [])
    exact = profile_dataframe(df, full=True, exact_distinct=True)
    assert exact["k"]["is_unique"] is True
    assert "unique" in profile_alerts(exact)["k"]
