"""Data-quality constraint checks (beyond-reference pipeline operator).

Declarative deequ-style constraints evaluated in ONE aggregation pass:
every rule compiles to a conditional count inside a single ``df.agg``
(map-side partials, one tiny shuffle), so checking a 100 TB table costs
one scan regardless of rule count. Results come back as one row per
rule with the violation count — SQL-recomputable, so the whole checker
is oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Check", "not_null", "unique", "in_range", "matches", "run_checks"]


class Check:
    """One named constraint: a boolean violation predicate, or a
    whole-frame aggregate comparison for ``unique``."""

    def __init__(self, name: str, violation: Column | None, kind: str = "row"):
        self.name = name
        self.violation = violation
        self.kind = kind
        self.column: str | None = None


def not_null(column: str) -> Check:
    return Check(f"not_null({column})", F.col(column).isNull())


def in_range(column: str, lo, hi) -> Check:
    c = F.col(column)
    return Check(
        f"in_range({column},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def matches(column: str, pattern: str) -> Check:
    c = F.col(column)
    return Check(
        f"matches({column})",
        c.isNotNull() & ~c.rlike(pattern),
    )


def unique(column: str) -> Check:
    chk = Check(f"unique({column})", None, kind="unique")
    chk.column = column
    return chk


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all constraints in one aggregation pass.

    Row-level rules become ``count(CASE WHEN violation)``; uniqueness
    becomes ``count(col) - count(DISTINCT col)`` — all inside ONE
    ``df.agg``, so the whole rule set is a single scan. Returns
    (check, n_violations, passed) rows, stable order = input order.
    """
    aggs = []
    for i, chk in enumerate(checks):
        if chk.kind == "unique":
            aggs.append(
                (
                    F.count(F.col(chk.column))
                    - F.countDistinct(F.col(chk.column))
                ).alias(f"_c{i}")
            )
        else:
            aggs.append(F.count(F.when(chk.violation, 1)).alias(f"_c{i}"))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    out = [
        (chk.name, int(row[f"_c{i}"]), int(row[f"_c{i}"]) == 0)
        for i, chk in enumerate(checks)
    ]
    return spark.createDataFrame(
        out, "check string, n_violations long, passed boolean"
    )
