"""Memory usage (reference examples/08_memory_usage.py).

Per-column compressed bytes from the parquet footer plus decompressed
estimates — understand which columns dominate before loading anything.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import get_spark, memory_report

tmp = Path(tempfile.mkdtemp(prefix="pts_memory_"))
src = tmp / "data.parquet"
pd.DataFrame(
    {
        "small_int": range(1000),
        "wide_text": ["lorem ipsum dolor sit amet " * 5] * 1000,
    }
).to_parquet(src, index=False)

spark = get_spark("example_08")
for row in memory_report(spark, str(src)).collect():
    print(row.asDict())
