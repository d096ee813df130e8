"""Demo block-model generator (SURVEY §2.1 S11).

Spark-native rebuild of ``create_demo_blockmodel``
(``/root/reference/parq_tools/utils/demo_block_model.py:7-74``): a
regular 3-D grid with x/y/z centroids, C- and F-order block ids, and a
depth attribute. The reference builds it with numpy meshgrid on one
node; here it is ``spark.range(n)`` + integer arithmetic — generated
*distributed*, so a 100M-block model (the reference's skipped perf
test) never materializes on the driver.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["create_demo_blockmodel"]


def create_demo_blockmodel(
    spark: SparkSession,
    shape: Tuple[int, int, int] = (3, 3, 3),
    block_size: Sequence[float] = (1.0, 1.0, 1.0),
    corner: Sequence[float] = (0.0, 0.0, 0.0),
) -> DataFrame:
    """Regular grid in C-order (z fastest), one row per block.

    Columns: x, y, z centroids; c_order_xyz / f_order_zyx ids; depth
    (distance from the top of the model, matching the reference's
    surface-relative attribute).
    """
    nx, ny, nz = shape
    dx, dy, dz = block_size
    cx, cy, cz = corner
    n = nx * ny * nz

    ids = spark.range(n)  # id = C-order index, z fastest
    ix = (F.col("id") / (ny * nz)).cast("long")
    iy = ((F.col("id") / nz) % ny).cast("long")
    iz = (F.col("id") % nz).cast("long")

    top_z = cz + nz * dz
    return (
        ids.withColumn("x", cx + dx / 2 + ix * F.lit(dx))
        .withColumn("y", cy + dy / 2 + iy * F.lit(dy))
        .withColumn("z", cz + dz / 2 + iz * F.lit(dz))
        .withColumn("c_order_xyz", F.col("id"))
        .withColumn("f_order_zyx", iz * (nx * ny) + iy * nx + ix)
        .withColumn("depth", F.lit(top_z) - F.col("z"))
        .drop("id")
    )
