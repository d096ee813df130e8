"""Data layout + corpus hygiene at scale (beyond-reference, round 4).

Z-order clustered writes (multi-column pruning), task-level progress on
file facades, PII redaction, and token-budget corpus sharding.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parq_tools_spark import (
    decontaminate,
    get_spark,
    pack_token_shards,
    with_pii_redacted,
    write_zordered,
)
from parq_tools_spark.operators.text import token_count
from parq_tools_spark.sources.zorder import file_stat_ranges

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example_11")
out = tempfile.mkdtemp()

# --- Z-order layout: tight min/max stats on BOTH clustered columns,
# so a filter on either prunes most files at plain-parquet read time
orders = spark.read.parquet(f"{SF}/orders.parquet")
write_zordered(
    orders, f"{out}/orders_z", ["o_custkey", "o_totalprice"], num_files=16
)
spans = file_stat_ranges(f"{out}/orders_z", "o_custkey")
print(f"z-ordered into {len(spans)} files; per-file o_custkey spans:")
print([f"{int(mn)}..{int(mx)}" for mn, mx in spans[:4]], "...")

# --- PII hygiene: scrub emails/phones/IPs, quarantine dense docs
docs = spark.read.parquet(f"{SF}/documents.parquet")
scrubbed = with_pii_redacted(docs)
dense = scrubbed.filter("n_email + n_phone + n_ipv4 > 3")
print("PII-dense documents to quarantine:", dense.count())

# --- Benchmark decontamination: drop training docs that contain an
# eval document's n-gram set (the eval side broadcasts; the corpus
# side never shuffles)
eval_set = docs.filter("doc_id % 25 = 0").selectExpr(
    "doc_id AS eval_id", "text"
)
clean = decontaminate(docs, eval_set, k=8, threshold=0.8)
print("decontaminated corpus:", clean.count(), "of", docs.count(), "docs")

# --- Token-budget sharding: ~equal-token training files, stable order
sharded = pack_token_shards(
    docs.select("doc_id", token_count("text").alias("n_tokens")),
    "n_tokens",
    budget=20_000,
)
sharded.write.mode("overwrite").partitionBy("shard").parquet(f"{out}/shards")
print(
    "shards written:",
    sharded.select("shard").distinct().count(),
    "->",
    f"{out}/shards",
)
