"""Wide concatenation (reference examples/02_wide_concatenation.py).

Column-wise concat of Parquet files sharing index columns. The
reference zips batches positionally; here it is an equi-join on the
index columns (broadcast when one side is small), validated the same
way and correct under any partitioning.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import concat_parquet_files, get_spark

tmp = Path(tempfile.mkdtemp(prefix="pts_wide_"))
idx = {"x": range(5), "y": range(5, 10)}
pd.DataFrame({**idx, "a": list("abcde")}).to_parquet(tmp / "f1.parquet", index=False)
pd.DataFrame({**idx, "b": [i * 1.5 for i in range(5)]}).to_parquet(
    tmp / "f2.parquet", index=False
)

spark = get_spark("example_02")
out = tmp / "wide"
concat_parquet_files(
    spark,
    [str(tmp / "f1.parquet"), str(tmp / "f2.parquet")],
    str(out),
    axis=1,
    index_columns=["x", "y"],
)
print(spark.read.parquet(str(out)).orderBy("x").show())
