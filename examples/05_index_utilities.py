"""Index utilities (reference examples/05_index_utilities.py).

Sort by index columns, reindex onto a new index (left join), and
keep-first dedup — each one shuffle, spill-safe, at any scale.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import dedupe_keep_first, get_spark, reindex_dataframe, sort_dataframe

tmp = Path(tempfile.mkdtemp(prefix="pts_idx_"))
src = tmp / "data.parquet"
pd.DataFrame(
    {"k": [3, 1, 2, 1], "v": ["c", "a", "b", "dup"]}
).to_parquet(src, index=False)

spark = get_spark("example_05")
df = spark.read.parquet(str(src))
print(sort_dataframe(df, ["k"]).show())
print(dedupe_keep_first(df, ["k"]).show())
new_index = spark.createDataFrame([(i,) for i in range(1, 6)], "k long")
print(reindex_dataframe(df, new_index, ["k"]).orderBy("k").show())
