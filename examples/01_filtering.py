"""Filtering (reference examples/01_filtering.py).

Filter a Parquet file with the pandas-like expression DSL. The DSL
compiles to a Catalyst Column, so the predicate lands in
``PushedFilters`` and the projection in ``ReadSchema`` — at any scale
only matching row groups and requested columns are read.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import filter_parquet, get_spark

tmp = Path(tempfile.mkdtemp(prefix="pts_filter_"))
src = tmp / "data.parquet"
pd.DataFrame(
    {"x": range(10), "y": range(10, 20), "label": list("aabbccddee")}
).to_parquet(src, index=False)

spark = get_spark("example_01")
out = tmp / "filtered"
filter_parquet(
    spark, str(src), str(out), "(x > 2) and (label != 'd')", columns=["x", "label"]
)
print(spark.read.parquet(str(out)).orderBy("x").show())
