"""LLM training-data pipeline (beyond-reference).

The operators a 100 TB corpus build needs, composed in one lazy plan:
quality scoring, cleaning, exact + near dedup, deterministic splits,
token budgeting, and ANN search over embeddings.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os

from parq_tools_spark import (
    bpe_token_count,
    brute_force_topk,
    dedupe_exact_text,
    dedupe_near_duplicates,
    get_spark,
    hash_split,
    minhash_lsh_pairs,
    with_clean_text,
    with_quality_score,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example_10")
docs = spark.read.parquet(f"{SF}/documents.parquet")

scored = with_quality_score(docs).filter("quality_score > 0.75")
cleaned = with_clean_text(scored)
exact = dedupe_exact_text(cleaned)
pairs = minhash_lsh_pairs(exact, num_hashes=64, bands=16, threshold=0.5)
deduped = dedupe_near_duplicates(exact, pairs)
final = hash_split(deduped, "doc_id", [0.8, 0.1, 0.1], names=["train", "val", "test"])
final = final.withColumn("n_tokens", bpe_token_count("clean_text"))
final.groupBy("split").count().show()

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
queries = emb.limit(3)
brute_force_topk(emb, queries, k=5).show()
