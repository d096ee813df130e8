"""Z-order clustered write: Morton code correctness + the pruning
payoff measured from real parquet footer statistics."""

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.sources.zorder import (
    file_stat_ranges,
    write_zordered,
    zorder_column,
)


def test_morton_interleave_known_values(spark):
    # 2 columns, 2 bits: z = x0 + 2*y0 + 4*x1 + 8*y1
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_column([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15
    assert got[(2, 1)] == 6  # x=10b, y=01b -> bits x0=0,y0=1,x1=1,y1=0 -> 0110b


def test_morton_bit_budget_guard(spark):
    with pytest.raises(ValueError, match="bits"):
        zorder_column([F.col("x")] * 4, bits=16)  # 64 bits > 63


def test_zorder_write_tightens_file_ranges(spark, sf_dir, tmp_path):
    """Both clustered columns must get much tighter per-file min/max
    ranges than a round-robin write of the same data — that's the
    entire point (stats-based pruning on every clustered column)."""
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # 16 files = 4 top Morton bits = 2 partitioning bits PER dimension
    # (with 8, one dimension would get only 1 bit and tighten to ~0.5)
    n_files = 16

    plain = str(tmp_path / "plain")
    orders.repartition(n_files).write.parquet(plain)
    zpath = str(tmp_path / "zordered")
    write_zordered(
        orders, zpath, ["o_custkey", "o_totalprice"], bits=10, num_files=n_files
    )

    # same rows, just re-clustered
    assert spark.read.parquet(zpath).count() == orders.count()

    def avg_span(path, col):
        ranges = file_stat_ranges(path, col)
        assert ranges, f"no footer stats for {col} in {path}"
        return sum(mx - mn for mn, mx in ranges) / len(ranges)

    for col in ["o_custkey", "o_totalprice"]:
        tightened = avg_span(zpath, col) / avg_span(plain, col)
        # round-robin files span ~the full domain; with 2 partitioning
        # bits per dimension z-ordered files must cover well under half
        # of it on EVERY clustered column (theory ~0.25 + edge effects)
        assert tightened < 0.55, f"{col}: only tightened to {tightened:.2f}"


def test_morton_is_bijective_on_the_grid(spark):
    """Distinct (x, y) grid cells must map to distinct Morton codes —
    interleaving is a bijection onto [0, 4^bits)."""
    bits = 4
    n = 1 << bits
    cells = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    z = cells.select(
        zorder_column([F.col("x"), F.col("y")], bits=bits).alias("z")
    )
    stats = z.agg(
        F.countDistinct("z").alias("d"), F.min("z").alias("mn"), F.max("z").alias("mx")
    ).collect()[0]
    assert stats.d == n * n
    assert stats.mn == 0 and stats.mx == n * n - 1


def test_zorder_write_survives_nulls_and_all_null_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.0, None), (2, None, None), (3, 30.0, None)],
        "id long, v double, w double",
    )
    path = str(tmp_path / "z_nulls")
    write_zordered(df, path, ["v", "w"], bits=4, num_files=2)
    assert spark.read.parquet(path).count() == 3


def test_write_zordered_autofits_bits_for_wide_column_sets(spark, tmp_path):
    """4 columns at the default 16 bits would overflow 63 value bits;
    write_zordered shrinks bits instead of crashing."""
    df = spark.createDataFrame(
        [(i, i * 2.0, i * 3.0, i % 7, i % 5) for i in range(100)],
        "id long, a double, b double, c long, d long",
    )
    path = str(tmp_path / "z4")
    write_zordered(df, path, ["a", "b", "c", "d"], num_files=2)  # bits=16 default
    assert spark.read.parquet(path).count() == 100
