"""SparkSession factory tuned for the engine.

Local-mode defaults mirror the test/bench environment (one JVM,
``local[N]`` threads); on a real cluster the same settings are safe —
AQE handles partition coalescing and skew joins at runtime, which is
how this engine stays efficient at 100 TB without per-query hand
tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(app_name: str = "parq_tools_spark", **extra_conf) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults chosen for scale:

    - AQE on: runtime partition coalescing + skew-join splitting.
    - ``shuffle.partitions`` sized to local cores (overridable; on a
      cluster set to ~2-3x total cores — AQE coalesces the excess).
    - Arrow enabled for any pandas-interop boundary (``toPandas``,
      Pandas UDFs) — vectorized transfer instead of per-row pickling.
    - UTC session timezone so timestamp semantics are deterministic.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in extra_conf.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
