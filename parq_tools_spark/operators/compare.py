"""Strict comparison of two datasets (SURVEY §2.6 U2, §2.4 A6).

Spark-native rebuild of ``compare_parquet_files``
(``/root/reference/parq_tools/parq_compare.py:14-92``). The reference
compares raw Arrow buffer sha256 hashes per column batch — a byte-level
definition that is unreproducible in any other engine (SURVEY §7.4 #5).
Here equality is **logical**:

- schema: column sets + Spark SQL types;
- row counts;
- content: symmetric ``exceptAll`` (order-insensitive multiset
  equality) plus per-column commutative ``xxhash64`` fingerprints that
  localize *which* columns differ, computed in one aggregation pass.

The result dict keeps the reference's report shape (match booleans +
detail lists, ``parq_compare.py:30-38``) so callers can switch over.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parq_tools_spark.sources.parquet_io import read_parquet

__all__ = [
    "compare_dataframes",
    "compare_parquet_files",
    "column_fingerprints",
    "group_overlap_report",
]


def column_fingerprints(df: DataFrame, columns: Sequence[str]) -> dict[str, int]:
    """Order-insensitive per-column fingerprint in ONE pass.

    ``sum(xxhash64(col))`` is commutative, so it is stable under any
    row order/partitioning — a distributed analogue of the reference's
    per-column hash stream, minus the order sensitivity. All columns
    are fingerprinted in a single ``agg`` (one job, one scan). The sum
    is taken in decimal(38,0) so it cannot overflow under ANSI mode.
    """
    aggs = [
        F.sum(F.xxhash64(F.col(c).cast("string")).cast("decimal(38,0)")).alias(c)
        for c in columns
    ]
    row = df.agg(*aggs).collect()[0]
    return {c: row[c] for c in columns}


def compare_dataframes(
    df1: DataFrame,
    df2: DataFrame,
    check_content: bool = True,
    columns: Optional[Sequence[str]] = None,
) -> dict:
    """Compare two DataFrames; returns the reference-shaped report dict."""
    cols1, cols2 = set(df1.columns), set(df2.columns)
    common = [c for c in df1.columns if c in cols2]
    if columns is not None:
        common = [c for c in common if c in set(columns)]
    dtypes1, dtypes2 = dict(df1.dtypes), dict(df2.dtypes)
    dtype_mismatches = {
        c: (dtypes1[c], dtypes2[c]) for c in common if dtypes1[c] != dtypes2[c]
    }
    n1, n2 = df1.count(), df2.count()

    report = {
        "row_counts": (n1, n2),
        "row_count_match": n1 == n2,
        "columns_only_in_first": sorted(cols1 - cols2),
        "columns_only_in_second": sorted(cols2 - cols1),
        "dtype_mismatches": dtype_mismatches,
        "schema_match": cols1 == cols2 and not dtype_mismatches,
        "column_match": {},
        "content_match": None,
    }
    if not check_content or not common:
        return report

    comparable = [c for c in common if c not in dtype_mismatches]
    if not comparable:
        report["content_match"] = False
        return report
    fp1 = column_fingerprints(df1, comparable)
    fp2 = column_fingerprints(df2, comparable)
    report["column_match"] = {c: fp1[c] == fp2[c] for c in comparable}

    if report["row_count_match"] and all(report["column_match"].values()):
        # fingerprints can collide across columns jointly; confirm with
        # multiset equality: per-row-value counts full-outer-joined on
        # the grouping keys. One shuffle per side (the join reuses the
        # aggs' hash partitioning — no extra exchange) and ONE action,
        # vs two full exceptAll passes for the symmetric difference.
        # The join must use NULL-SAFE equality (eqNullSafe): groupBy
        # treats NULL keys as one group, but a null-unsafe join would
        # never match them, reporting identical NULL-bearing frames as
        # different (exceptAll's set semantics treat NULLs as equal).
        a, b = df1.select(*comparable), df2.select(*comparable)
        ka = a.groupBy(*comparable).agg(F.count(F.lit(1)).alias("_n1"))
        kb = b.groupBy(*comparable).agg(F.count(F.lit(1)).alias("_n2")).select(
            *[F.col(c).alias(f"_r_{c}") for c in comparable], "_n2"
        )
        cond = None
        for c in comparable:
            term = ka[c].eqNullSafe(kb[f"_r_{c}"])
            cond = term if cond is None else (cond & term)
        diff = ka.join(kb, cond, "full").filter(
            F.coalesce("_n1", F.lit(0)) != F.coalesce("_n2", F.lit(0))
        )
        report["content_match"] = diff.limit(1).count() == 0
    else:
        report["content_match"] = False
    return report


def compare_parquet_files(
    spark: SparkSession,
    path1: str,
    path2: str,
    check_content: bool = True,
    columns: Optional[Sequence[str]] = None,
) -> dict:
    """File-level facade (``parq_compare.py:28-92``)."""
    return compare_dataframes(
        read_parquet(spark, path1),
        read_parquet(spark, path2),
        check_content=check_content,
        columns=columns,
    )


def group_overlap_report(
    df: DataFrame,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """Pairwise distinct-set overlap between groups via theta sketches
    (beyond-reference): ``(group_a, group_b, n_common_est,
    n_union_est, jaccard_est)`` for every unordered group pair —
    which sources share documents/URLs/users, without ever
    materializing the distinct sets.

    One shuffle builds a theta sketch per group (map-side partial);
    the pairwise intersections/unions then run over G sketch rows (a
    broadcast self-join — sketches are KB), so a 100 TB corpus costs
    one aggregation regardless of how many pairs are reported.
    Estimates are EXACT while a group's distinct keys fit the sketch
    (default k = 4096 retained hashes) and ~2% beyond it.

    Rows whose ``group_col`` is NULL are excluded (an unnamed group
    has no meaningful pair ordering). The pair count is G*(G-1)/2 —
    by construction this is a per-GROUP report, so G is the
    cardinality of a grouping column (sources, languages, shards),
    not of a key; for G beyond a few thousand, pre-aggregate groups.
    """
    sk = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.theta_sketch_agg(key_col).alias("__sk"))
    )
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("__sk").alias("__ska")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("__sk").alias("__skb")
    )
    common = F.theta_sketch_estimate(
        F.theta_intersection(F.col("__ska"), F.col("__skb"))
    )
    union = F.theta_sketch_estimate(
        F.theta_union(F.col("__ska"), F.col("__skb"))
    )
    return (
        a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            F.round(common).cast("long").alias("n_common_est"),
            F.round(union).cast("long").alias("n_union_est"),
            # two all-NULL-key groups union to 0: jaccard 0, not NaN
            F.when(F.round(union) > 0, F.round(common) / F.round(union))
            .otherwise(F.lit(0.0))
            .alias("jaccard_est"),
        )
    )
