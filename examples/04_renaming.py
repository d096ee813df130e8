"""Renaming and metadata (reference examples/04_renaming.py).

Rename columns and attach column descriptions. Renames are plan-level
(zero data movement); table/column metadata is written into the
parquet footer so any reader sees it.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import get_spark, rename_parquet
from parq_tools_spark.operators.schema_tools import (
    get_table_metadata,
    set_table_metadata,
)

tmp = Path(tempfile.mkdtemp(prefix="pts_rename_"))
src = tmp / "data.parquet"
pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_parquet(src, index=False)

spark = get_spark("example_04")
out = tmp / "renamed"
rename_parquet(spark, str(src), str(out), {"a": "amount", "b": "bucket"}, single_file=True)
part = next(out.glob("*.parquet"))
set_table_metadata(str(part), {"description": "renamed demo table"})
print(spark.read.parquet(str(out)).show())
print(get_table_metadata(str(part)))
