"""Lazy DataFrame facade (reference examples/09_lazy_parquet_df.py).

Column-on-demand access with pandas ergonomics over a Spark plan:
nothing is read until a column is materialized, and arithmetic on
columns stays a Catalyst expression until then.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import LazySparkDF, get_spark

tmp = Path(tempfile.mkdtemp(prefix="pts_lazy_"))
src = tmp / "data.parquet"
pd.DataFrame(
    {"k": range(10), "price": [float(i) for i in range(10)], "qty": [2] * 10}
).set_index("k").to_parquet(src)

spark = get_spark("example_09")
lazy = LazySparkDF(spark, str(src))
print(lazy.info())
lazy["total"] = lazy["price"] * lazy["qty"]          # lazy expression
print(lazy.loc[lazy["total"] > 10, ["price", "total"]].to_pandas())
print(lazy.loc[[3, 7], "total"].tolist())            # label access
for chunk in lazy.iter_row_chunks(chunk_size=4):
    print("chunk rows:", len(chunk))
lazy.save(str(tmp / "saved"), single_file=True)
