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
    evolve  -> *_index_add_metadata_col (backfill NEW columns — k of
               them in ONE O(index) rewrite)
    prune   -> *_index_drop_metadata_col (the inverse rewrite)
    stream  -> op-typed 'M' rows on the same CDC feed as content,
               through a cold-bootstrapped streaming sink

This example walks all the legs on a BM25 index through the
family-agnostic facade; the identical calls work on the ANN, MinHash
and SimHash families (MIGRATION.md tabulates the 4-family surface —
round 17 added MinHash/SimHash CDC sinks, so the streamed leg below
works on all four too).
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

# --- EVOLVE: quality signals computed long AFTER the build become
# served, filterable columns — every visible row backfilled, the
# manifest's store_cols extended in the SAME atomic commit. values is
# an id->value lookup; uncovered ids take default= (or raise loudly).
# k columns land in ONE O(index) rewrite (default= takes a per-column
# dict), because the rewrite is the entire cost of evolution.
signals = docs.select(
    "doc_id",
    (F.col("doc_id") % 3).cast("int").alias("grade"),
    (F.length("text") > 200).alias("long_doc"),
)
h.add_metadata_col(signals, default={"grade": 9, "long_doc": False})
print("stats:", h.stats()["params"]["store_cols"])
good = bm25_index_topk(
    spark, idx, q, k=5, where="lang == 'en' and grade == 0"
)
print("top-5 English grade-0:", [r.doc_id for r in good.collect()])

# --- PRUNE: a superseded column stops paying its bytes on every
# postings scan — the inverse rewrite, shrinking store_cols in the
# same atomic commit shape. where= on the dropped column now fails
# with the standard unknown-column error.
h.drop_metadata_col("long_doc")
print("after prune:", h.stats()["params"]["store_cols"])

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

# --- STREAMED: the same mixed feed as a real micro-batch stream
# through a COLD-started sink — store_cols= bootstraps the index on
# batch 0, so a scoped serving surface needs no out-of-band
# pre-build. (start_minhash_index_stream / start_simhash_index_stream
# are the band twins; start_ann_index_stream the vector one.)
from parq_tools_spark.streaming.index_sink import start_bm25_index_stream

cdc_dir = os.path.join(work, "cdc")
sidx = os.path.join(work, "stream_idx")
feed = docs.select(
    "doc_id", "text", "lang",
    F.lit("I").alias("op"), F.lit(1).cast("long").alias("seq"),
).unionByName(
    # re-grade every English doc divisible by 11 — metadata-only, no
    # text on the row, lands via update_metadata inside the sink
    docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 11 == 0))
    .select(
        "doc_id", F.lit(None).cast("string").alias("text"),
        F.lit("restricted").alias("lang"),
        F.lit("M").alias("op"), F.lit(2).cast("long").alias("seq"),
    )
)
feed.coalesce(1).write.parquet(os.path.join(cdc_dir, "f0"))
stream = spark.readStream.schema(
    "doc_id long, text string, lang string, op string, seq long"
).parquet(cdc_dir + "/*")
sq = start_bm25_index_stream(
    stream, sidx, os.path.join(work, "ck"),
    seq_col="seq", n_buckets=8, store_cols=["lang"],
)
sq.awaitTermination(300)
restricted = bm25_index_topk(
    spark, sidx, q, k=1_000_000, where="lang == 'restricted'"
)
print("streamed re-grades now serve:", restricted.count(), "docs")
print("lifecycle complete: "
      "store -> filter -> update -> evolve -> prune -> stream")
