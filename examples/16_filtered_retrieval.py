"""Filtered retrieval, three shapes (round 14).

Nearly every real retrieval call is filtered: "top-k among the
ENGLISH documents", "nearest neighbors the license allows", "dedup
this batch against MY tenant's corpus only". Post-filtering a k-sized
result under-returns — the filter must scope CANDIDATES before
ranking. This example drives the three physical shapes, cheapest
first:

1. ``where=`` over index-STORED metadata (``store_cols=``): the
   predicate pushes into the cell-/bucket-pruned parquet scans —
   planning-time cost, no join, no id set.
2. ``allowed_ids`` as a literal id list: a pushed ``In(...)`` filter —
   right for request-sized sets.
3. ``allowed_ids`` as a DataFrame of ids: a left-semi join whose
   strategy Catalyst/AQE picks — right for predicate-derived sets
   over EXTERNAL metadata the index doesn't store.

Plus the admission flavor: ``semantic_dedupe_incremental(
allowed_ids=...)`` scopes WHO MAY BLOCK a new vector, so one physical
index serves per-scope (per-language, per-tenant) dedup.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parq_tools_spark import get_spark
from parq_tools_spark.operators.ann_index import (
    ann_index_build,
    ann_index_topk,
    semantic_dedupe_incremental,
)
from parq_tools_spark.operators.hybrid import hybrid_index_topk
from parq_tools_spark.operators.search import (
    bm25_index_build,
    bm25_index_topk,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("filtered_retrieval_example")
docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
    "doc_id", "text", "lang"
)
emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))

work = tempfile.mkdtemp(prefix="filtered_")
bp, ap = os.path.join(work, "bm25"), os.path.join(work, "ann")

# --- shape 1: metadata stored IN the index, where= pushed to the scan
bm25_index_build(docs, bp, n_buckets=8, store_cols=["lang"])
ann_index_build(
    emb, ap, n_cells=8, m=8, n_codes=16,
    store_vectors=True, store_cols=["label"],
)

en_hits = bm25_index_topk(
    spark, bp, "stream merge window", k=5, where="lang == 'en'"
)
print("-- BM25 top-5 among English docs (where= pushed filter) --")
en_hits.show(truncate=60)

qs = emb.filter(F.col("vec_id") < 2)
near = ann_index_topk(
    spark, ap, qs, k=5, nprobe=2, where="label in [0, 1, 2, 3, 4]"
)
print("-- ANN top-5 among labels 0-4 (where= pushed filter) --")
near.show()

# --- shape 2: literal allowed-id list (pushed In(...) filter)
shortlist = [r.doc_id for r in docs.limit(200).collect() if r.doc_id % 3 == 0]
print("-- BM25 top-5 within an explicit shortlist --")
bm25_index_topk(
    spark, bp, "customer value table", k=5, allowed_ids=shortlist
).show()

# --- shape 3: DataFrame of ids from EXTERNAL metadata (semi-join)
allowed = docs.filter(F.length("text") > 200).select("doc_id")
print("-- hybrid top-5 among long documents (semi-join, both legs) --")
hybrid_index_topk(
    spark, bp, ap, "stream merge window",
    [float(x) for x in emb.first()["embedding"]],
    k=5, n_candidates=20, allowed_ids=allowed,
).show()

# --- scoped admission: only English-corpus entries may block
batch = emb.select(
    (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
).limit(50)
survivors = semantic_dedupe_incremental(
    spark, ap, batch, threshold=0.99,
    allowed_ids=emb.filter(F.col("label") == 0).select("vec_id"),
)
print(f"scoped admission: {survivors.count()} of 50 admitted "
      "(only label-0 index entries could block)")

spark.stop()
