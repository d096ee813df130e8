"""Tall concatenation (reference examples/03_tall_concatenation.py).

Row-wise union with schema evolution: columns missing in some files
are null-filled, matching ``pandas.concat`` alignment. Spark's
``unionByName(allowMissingColumns=True)`` handles it in one plan.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import concat_parquet_files, get_spark

tmp = Path(tempfile.mkdtemp(prefix="pts_tall_"))
pd.DataFrame({"x": [1, 2], "a": ["p", "q"]}).to_parquet(tmp / "f1.parquet", index=False)
pd.DataFrame({"x": [3, 4], "b": [0.5, 0.7]}).to_parquet(tmp / "f2.parquet", index=False)

spark = get_spark("example_03")
out = tmp / "tall"
concat_parquet_files(
    spark, [str(tmp / "f1.parquet"), str(tmp / "f2.parquet")], str(out), axis=0
)
print(spark.read.parquet(str(out)).orderBy("x").show())
