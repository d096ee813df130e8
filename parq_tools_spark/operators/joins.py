"""Join extensions Spark lacks natively (beyond-reference).

- :func:`asof_join` — time-series as-of join (for each left row, the
  latest right row with key equality and right_time <= left_time).
  Implemented as the classic union + ordered window trick: both sides
  interleave into one partition-by-key, order-by-time stream, and a
  ``last(..., ignorenulls=True)`` window carries the most recent right
  payload forward onto left rows. ONE shuffle on the key — no
  per-key loops, no range explosion; state per key is a single row.
  DuckDB's native ``ASOF JOIN`` serves as the oracle.

- :func:`salted_join` — equi-join with key salting for skew: the hot
  side's keys get a random-ish salt in [0, n); the small side is
  exploded n ways. Complements AQE's skew splitting when one key
  dominates beyond what partition splitting fixes.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "salted_join", "range_join"]


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    window: int,
    on: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Interval join: pairs with |left_time - right_time| <= window.

    A naive inequality join degenerates to a (broadcast) nested-loop
    cross product. Binning makes it an equi-join: both sides bucket by
    ``floor(t / window)``; any qualifying pair lands in the same or an
    adjacent bucket, so the left side expands 3x into candidate
    buckets, equi-joins on (keys..., bucket), and the exact predicate
    filters the boundary misses. Shuffle cost is O(3|L| + |R|),
    independent of the time span.

    Returns left columns + right columns (caller projects/renames;
    overlapping names must be disambiguated by the caller first).
    """
    bucket_l = F.floor(F.col(left_time) / F.lit(window))
    bucket_r = F.floor(F.col(right_time) / F.lit(window))
    keys = list(on or [])
    l = left.withColumn(
        "__range_bucket", F.explode(F.array(bucket_l - 1, bucket_l, bucket_l + 1))
    )
    r = right.withColumn("__range_bucket", bucket_r)
    joined = l.join(r, on=[*keys, "__range_bucket"], how="inner").drop("__range_bucket")
    dt = F.col(left_time) - F.col(right_time)
    return joined.filter((dt <= window) & (dt >= -window))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance: Optional[int] = None,
) -> DataFrame:
    """As-of join: latest ``right`` row at-or-before each left row.

    Matches pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics
    (``direction='backward'``; ``'forward'`` mirrors it). Time columns
    must be mutually comparable (both numeric or both timestamps).
    ``tolerance`` (same units as the time columns' difference) drops
    matches further than the bound.

    Right rows tied on (key, time) are reduced to ONE deterministic
    row first (the last by all remaining columns) — unlike engines
    that pick an arbitrary tie member.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = list(on)
    left_cols = left.columns
    right_payload = [c for c in right.columns if c not in keys and c != right_time]

    # deterministic tie-break within right: keep one row per (key, time)
    tie_order = [F.col(c).desc() for c in right_payload] or [F.lit(1).asc()]
    wr = Window.partitionBy(*keys, right_time).orderBy(*tie_order)
    right_one = (
        right.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    l = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_time).alias("__asof_t"),
        F.lit(1).alias("__asof_is_left"),
        *[F.lit(None).cast(right_one.schema[c].dataType).alias(f"__asof_r_{c}")
          for c in right_payload],
        F.lit(None).cast(right_one.schema[right_time].dataType).alias("__asof_rt"),
    )
    r = right_one.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__asof_t"),
        F.lit(0).alias("__asof_is_left"),
        *[F.col(c).alias(f"__asof_r_{c}") for c in right_payload],
        F.col(right_time).alias("__asof_rt"),
    ).select(*l.columns)  # align column order

    merged = l.unionByName(r)
    if direction == "forward":
        # mirror: order descending, right still first among equal times
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__asof_t").desc(), F.col("__asof_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        # at equal times the right row sorts first, so '<=' matches
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__asof_t").asc(), F.col("__asof_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    carried = merged.select(
        *merged.columns,
        *[
            F.last(f"__asof_r_{c}", ignorenulls=True).over(w).alias(f"__asof_c_{c}")
            for c in right_payload
        ],
        F.last("__asof_rt", ignorenulls=True).over(w).alias("__asof_c_rt"),
    )
    out = carried.filter(F.col("__asof_is_left") == 1)
    if tolerance is not None:
        delta = (
            F.col("__asof_t") - F.col("__asof_c_rt")
            if direction == "backward"
            else F.col("__asof_c_rt") - F.col("__asof_t")
        )
        within = delta <= F.lit(tolerance)
        out = out.select(
            *left_cols,
            *[
                F.when(within, F.col(f"__asof_c_{c}")).alias(c)
                for c in right_payload
            ],
        )
    else:
        out = out.select(
            *left_cols, *[F.col(f"__asof_c_{c}").alias(c) for c in right_payload]
        )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with salting for a skew-dominated left side.

    Left rows get ``_salt = pmod(xxhash64(all left cols), salt)`` —
    deterministic, spreads a hot key over ``salt`` reducers. The right
    side is exploded ``salt`` ways (size x salt; keep the smaller side
    right). AQE's skew-join handles moderate skew on its own; use this
    when single keys exceed what partition splitting can fix.
    """
    if how.replace("_", "") not in ("inner", "left", "leftouter", "leftsemi", "leftanti"):
        # right/full would duplicate unmatched right rows (exploded n ways)
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = list(on)
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return (
        salted_left.join(salted_right, on=[*keys, "_salt"], how=how).drop("_salt")
    )
