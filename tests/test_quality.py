"""Data-quality constraint checker tests."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parq_tools_spark.operators.quality import (  # noqa: E402
    in_range,
    matches,
    not_null,
    run_checks,
    unique,
)


def test_run_checks_single_pass(spark):
    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (2, None, 50.0),
            (2, "dup-key", -1.0),
            (3, "UPPER", 7.5),
        ],
        "k long, s string, v double",
    )
    out = {
        r.check: (r.n_violations, r.passed)
        for r in run_checks(
            df,
            [
                not_null("s"),
                unique("k", approx=False),
                in_range("v", 0.0, 10.0),
                matches("s", "^[a-z-]+$"),
            ],
        ).collect()
    }
    assert out["not_null(s)"] == (1, False)
    assert out["unique(k)"] == (1, False)
    assert out["in_range(v,0.0,10.0)"] == (2, False)  # 50.0 and -1.0
    assert out["matches(s)"] == (1, False)  # UPPER


def test_run_checks_all_pass(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    res = run_checks(df, [not_null("s"), unique("k")]).collect()
    assert all(r.passed and r.n_violations == 0 for r in res)


def test_unique_approx_default_no_expand(spark):
    """Default unique() rides HLL: the agg plan must not contain an
    Expand node. Exact countDistinct over >= 2 distinct column sets
    (i.e. two unique rules) makes Catalyst Expand-replicate EVERY
    input row per rule — the expansion a 100 TB table shouldn't pay.
    A truly-unique column must still pass despite estimation."""
    df = spark.range(20_000).withColumnRenamed("id", "k").withColumn(
        "s", F.concat(F.lit("v"), F.col("k"))
    )
    checks = [not_null("s"), unique("k"), unique("s")]
    # reproduce run_checks' aggregation to inspect its plan
    aggs = []
    for i, chk in enumerate(checks):
        if chk.kind == "unique":
            est = F.count(F.col(chk.column)) - F.approx_count_distinct(
                F.col(chk.column), chk.rsd
            )
            aggs.append(est.alias(f"_c{i}"))
        else:
            aggs.append(F.count(F.when(chk.violation, 1)).alias(f"_c{i}"))
    plan = df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan

    exact_plan = (
        df.agg(
            F.count(F.when(checks[0].violation, 1)).alias("_c0"),
            (F.count("k") - F.countDistinct("k")).alias("_c1"),
            (F.count("s") - F.countDistinct("s")).alias("_c2"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # what approx mode avoids

    out = {r.check: r for r in run_checks(df, checks).collect()}
    assert out["unique(k)"].passed and out["unique(k)"].n_violations == 0
    assert out["unique(s)"].passed and out["unique(s)"].n_violations == 0


def test_unique_approx_detects_heavy_duplication(spark):
    df = spark.range(20_000).withColumn("k", F.col("id") % 100)
    out = {r.check: r for r in run_checks(df, [unique("k")]).collect()}
    r = out["unique(k)"]
    assert not r.passed
    # ~19,900 true duplicates; HLL with rsd=0.05 lands well above the
    # 3*rsd*count noise floor (3,000)
    assert r.n_violations > 15_000


def test_unique_approx_catches_moderate_duplication(spark):
    """The default rsd=0.01 noise floor is 3% of rows: a 10%-duplicated
    key column must FAIL the approx check (the false-negative bound
    the check documents)."""
    df = spark.range(20_000).withColumn(
        "k", F.when(F.col("id") % 10 == 0, F.lit(0)).otherwise(F.col("id"))
    )
    out = {r.check: r for r in run_checks(df, [unique("k")]).collect()}
    r = out["unique(k)"]
    assert not r.passed
    # ~1,999 true duplicates; floor at rsd=0.01 is 600
    assert r.n_violations > 600


class TestGopherFilter:
    """Gopher A1.1 quality rules (operators/text.py
    with_gopher_filter): each rule trips independently."""

    def _run(self, spark, text):
        from parq_tools_spark.operators.text import with_gopher_filter

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return with_gopher_filter(df).collect()[0]

    def _good_text(self):
        # 60 plain words incl. several required words, mean len in range
        return (
            "the quick brown fox jumps over that lazy dog and have "
            "some more words to keep the count up with good text "
        ) * 3

    def test_good_document_passes(self, spark):
        r = self._run(spark, self._good_text())
        assert r["gopher_pass"] is True
        assert 50 <= r["n_words"] <= 100000
        assert r["n_required_words"] >= 2

    def test_too_short_fails(self, spark):
        r = self._run(spark, "the cat sat on the mat with that be of")
        assert r["gopher_pass"] is False
        assert r["n_words"] < 50

    def test_symbol_ratio_fails(self, spark):
        text = self._good_text() + " #" * 20
        r = self._run(spark, text)
        assert r["symbol_word_ratio"] > 0.1
        assert r["gopher_pass"] is False

    def test_bullet_lines_fail(self, spark):
        words = self._good_text()
        bullets = "\n".join(f"- item {i}" for i in range(40))
        r = self._run(spark, words + "\n" + bullets)
        assert r["bullet_line_ratio"] > 0.9
        assert r["gopher_pass"] is False

    def test_ellipsis_lines_fail(self, spark):
        head = self._good_text()
        lines = "\n".join(
            [head] + [f"to be continued number {i} ..." for i in range(9)]
        )
        r = self._run(spark, lines)
        assert r["ellipsis_line_ratio"] > 0.3
        assert r["gopher_pass"] is False

    def test_non_alpha_words_fail(self, spark):
        text = self._good_text() + " 123 456" * 30
        r = self._run(spark, text)
        assert r["alpha_word_ratio"] < 0.8
        assert r["gopher_pass"] is False

    def test_required_words_rule(self, spark):
        # 60 words, none from the required inventory
        text = ("zebra quokka lemur gecko panda otter walrus ibex "
                "koala dingo ") * 6
        r = self._run(spark, text)
        assert r["n_required_words"] == 0
        assert r["gopher_pass"] is False

    def test_null_text_fails_cleanly(self, spark):
        from parq_tools_spark.operators.text import with_gopher_filter

        df = spark.createDataFrame(
            [(1, None)], "doc_id long, text string"
        )
        r = with_gopher_filter(df).collect()[0]
        assert r["n_words"] == 0 and r["gopher_pass"] is False


class TestC4Filter:
    """C4 line/page cleaning (operators/text.py with_c4_filter)."""

    def _run(self, spark, text, **kw):
        from parq_tools_spark.operators.text import with_c4_filter

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return with_c4_filter(df, **kw).collect()[0]

    def test_line_retention_rules(self, spark):
        text = "\n".join(
            [
                "This line ends with a period and has words.",   # kept
                "no terminal punctuation here",                   # dropped
                "Too short.",                                     # dropped (<3 words)
                "Enable javascript to view this page.",           # dropped
                'A quoted line ends well, he said."',             # kept
            ]
        )
        r = self._run(spark, text)
        assert r["n_lines"] == 5
        assert r["n_kept_lines"] == 2
        kept = r["c4_text"].split("\n")
        assert kept[0].startswith("This line") and "javascript" not in r["c4_text"]

    def test_page_verdict(self, spark):
        good = "\n".join(
            f"Sentence number {i} is a complete line." for i in range(6)
        )
        assert self._run(spark, good)["c4_pass"] is True
        assert self._run(spark, good + "\nvar x = {1};")["has_brace"]
        assert self._run(spark, good + "\nvar x = {1};")["c4_pass"] is False
        assert self._run(spark, good + "\nLorem ipsum dolor sit amet.")[
            "c4_pass"
        ] is False
        few = "Only one good sentence here."
        assert self._run(spark, few)["c4_pass"] is False

    def test_thresholds_are_knobs(self, spark):
        text = "One good sentence right here."
        assert self._run(spark, text, min_sentences=1)["c4_pass"] is True

    def test_null_text(self, spark):
        r = self._run(spark, None)
        assert r["n_lines"] == 0 and r["c4_text"] == "" and r["c4_pass"] is False
