"""The store_cols metadata lifecycle, end to end (round 16).

A 100 TB corpus's metadata is not static: licenses get re-graded,
quality scores get recomputed, and new signals appear long after the
index was built. Re-encoding vectors or re-tokenizing documents to
ship a metadata fix is how index maintenance becomes the pipeline's
bottleneck — so the four persisted index families treat metadata as a
first-class, independently-maintainable axis:

    store   -> build with store_cols=[...] (metadata rides the rows)
    filter  -> serve with where="..." (pushed into the pruned scans)
    update  -> *_index_update_metadata (O(affected), nothing recomputed)
    evolve  -> *_index_add_metadata_col (backfill a NEW column)
    stream  -> op-typed 'M' rows on the same CDC feed as content

This example walks all five legs on a BM25 index through the
family-agnostic facade; the identical calls work on the ANN, MinHash
and SimHash families (MIGRATION.md tabulates the 4-family surface).
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parq_tools_spark import get_spark, open_index
from parq_tools_spark.operators.search import (
    bm25_index_build,
    bm25_index_topk,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example_17")
work = tempfile.mkdtemp()
idx = os.path.join(work, "docs")

docs = spark.read.parquet(f"{SF}/documents.parquet").select(
    "doc_id", "text", "lang"
)

# --- STORE: lang rides every posting row; no metadata table exists
bm25_index_build(docs, idx, n_buckets=8, store_cols=["lang"])
h = open_index(spark, idx)

# --- FILTER: the DSL predicate is pushed into the bucket-pruned
# postings scans — no join, no id set, statistics stay index-wide
q = "stream merge window"
en = bm25_index_topk(spark, idx, q, k=5, where="lang == 'en'")
print("top-5 English:", [(r.doc_id, r.score) for r in en.collect()])

# --- UPDATE: a license re-grade flips stored values WITHOUT
# re-tokenizing — one id-join, one O(affected) segment + tombstone.
# max_segments= arms the stats-driven compaction trigger so a
# re-grade-only maintenance loop folds like ingests do.
victim = en.first().doc_id
h.update_metadata(
    spark.createDataFrame([(victim, "restricted")],
                          "doc_id long, lang string"),
    max_segments=8,
)
assert victim not in {
    r.doc_id
    for r in bm25_index_topk(
        spark, idx, q, k=5, where="lang == 'en'"
    ).collect()
}
print(f"doc {victim} re-graded out of the 'en' slice")

# --- EVOLVE: a quality score computed long AFTER the build becomes a
# served, filterable column — every visible row backfilled, the
# manifest's store_cols extended in the SAME atomic commit. values is
# an id->value lookup; uncovered ids take default= (or raise loudly).
grades = docs.select("doc_id", (F.col("doc_id") % 3).cast("int").alias("grade"))
h.add_metadata_col(grades, default=9)
print("stats:", h.stats()["params"]["store_cols"])
good = bm25_index_topk(
    spark, idx, q, k=5, where="lang == 'en' and grade == 0"
)
print("top-5 English grade-0:", [r.doc_id for r in good.collect()])

# --- STREAM: re-grades ride the SAME change feed as content. An 'M'
# row carries the id plus ALL store_cols and folds into
# update_metadata after the batch's deletes/upserts — no re-tokenize,
# no raw text needed. (start_bm25_index_stream passes 'M' through the
# identical apply_cdc call for micro-batches.)
changes = spark.createDataFrame(
    [
        (10**6, "a brand new training document", "en", 0, "I", 1),
        # 'M' rows carry the FULL metadata record (id + all store_cols)
        (victim, None, "en", int(victim % 3), "M", 2),
        (10**6, None, "en", 1, "M", 3),
    ],
    "doc_id long, text string, lang string, grade int, op string, seq long",
)
out = h.apply_cdc(changes, seq_col="seq")
print("apply_cdc:", {k: out[k] for k in
                     ("inserted", "meta_updated", "meta_noops")})
assert victim in {
    r.doc_id
    for r in bm25_index_topk(
        spark, idx, q, k=1_000_000, where="lang == 'en'"
    ).collect()
}
print("lifecycle complete: store -> filter -> update -> evolve -> stream")
