"""Data-quality constraint checker tests."""

import os
import sys

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
                unique("k"),
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
