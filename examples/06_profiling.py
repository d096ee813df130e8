"""Profiling (reference examples/06_profiling.py).

One-pass per-column statistics (the reference loads columns in
batches; Spark computes every metric for every column in a single
aggregation), alerts, an HTML report, and mergeable partial profiles
for incremental pipelines.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
from pathlib import Path

import pandas as pd

from parq_tools_spark import (
    get_spark,
    profile_alerts,
    profile_dataframe,
    save_profile_report,
)

tmp = Path(tempfile.mkdtemp(prefix="pts_profile_"))
src = tmp / "data.parquet"
pd.DataFrame(
    {"v": [1.0, 2.0, None, 4.0] * 25, "c": ["k"] * 100}
).to_parquet(src, index=False)

spark = get_spark("example_06")
df = spark.read.parquet(str(src))
prof = profile_dataframe(df, full=True)
print({k: {m: s[m] for m in ("n", "mean", "n_missing", "n_distinct")} for k, s in prof.items()})
print("alerts:", profile_alerts(prof))
save_profile_report(prof, str(tmp / "report.html"))
print("report:", tmp / "report.html")
