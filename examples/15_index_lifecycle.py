"""The persisted-index lifecycle, one surface (round 13).

An index over a training corpus is long-lived infrastructure: it
grows past its training sample (drift), accumulates segments (scan
creep) and tombstones (query-time anti-joins), and is operated by
jobs that hold a path, not a family. This example drives the round-13
surface end to end: grow an ANN index far past its frozen model,
watch recall drift, `ann_index_retrain` from the STORED vectors
(source corpus never touched), let stats-driven `maybe_compact` fold
exactly when the manifest says fragmentation crossed a bound, admit
a new batch semantically (`semantic_dedupe_incremental`), and do all
the maintenance through the family-agnostic `open_index` facade.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parq_tools_spark import (
    ann_index_build,
    get_spark,
    open_index,
    semantic_dedupe_incremental,
)
from parq_tools_spark.operators.ann_index import ann_index_add
from parq_tools_spark.operators.similarity import brute_force_topk

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example_15")
work = tempfile.mkdtemp()
idx = os.path.join(work, "vectors")

emb = spark.read.parquet(f"{SF}/embeddings.parquet")

# --- build on HALF the corpus (the model freezes on this sample),
# then grow the index far past it: the standard drift story
ann_index_build(
    emb.filter(F.col("label") < 5).select("vec_id", "embedding"),
    idx, n_cells=16, m=8, n_codes=16, store_vectors=True,
)
ann_index_add(
    emb.filter(F.col("label") >= 5).select("vec_id", "embedding"), idx
)

# --- every later step goes through the facade: jobs hold a PATH
h = open_index(spark, idx)
print("family:", h.family, "| stats:", h.stats())

qs = emb.filter(
    (F.col("label") >= 5) & (F.col("vec_id") % 7 == 0)
).select("vec_id", "embedding")
truth = {
    (r.query_id, r.vec_id)
    for r in brute_force_topk(
        emb.select("vec_id", "embedding"), qs, k=10
    ).select("query_id", "vec_id").collect()
}


def recall():
    got = {
        (r.query_id, r.vec_id)
        for r in h.query(qs, k=10, nprobe=4)
        .select("query_id", "vec_id").collect()
    }
    return len(got & truth) / len(truth)


drifted = recall()
# --- retrain from STORED vectors: one column-pruned index read, the
# source corpus is never touched; bit-identical to a fresh build
h.retrain()
print(f"recall@10 on the drifted half: {drifted:.3f} -> {recall():.3f}"
      " after retrain")

# --- semantic admission of a new batch: drop rows with an admitted
# same-cell neighbor at rounded cosine >= threshold; index is
# serving-shaped, so the corpus is never re-read
batch = emb.filter(F.col("vec_id") % 11 == 0).select(
    (F.col("vec_id") + 100_000).alias("vec_id"),
    # half the batch = exact copies of corpus vectors (near-dups of
    # the corpus, dropped); half = negated vectors — far from every
    # corpus vector they resemble, but negations of mutually-similar
    # vectors are themselves mutually similar, so the in-batch
    # lower-id rule keeps ONE representative per near-dup group
    F.when(
        F.col("vec_id") % 2 == 0, F.col("embedding")
    ).otherwise(
        F.transform("embedding", lambda v: -v)
    ).alias("embedding"),
)
admitted = semantic_dedupe_incremental(
    spark, idx, batch, threshold=0.35, update_index=True
)
print("semantic admission:", admitted.count(), "of", batch.count(),
      "new vectors admitted (rest are near-dups of the corpus or of "
      "a lower-id in-batch sibling)")

# --- stats-driven maintenance: compact ONLY when the manifest's own
# fragmentation signals cross a bound — O(manifest) otherwise
print("segments before:", h.stats()["n_segments"])
print("maybe_compact(max_segments=8) ->",
      h.maybe_compact(max_segments=8))   # under the bound: no-op
print("maybe_compact(max_segments=1) ->",
      h.maybe_compact(max_segments=1))   # breach: folds
print("segments after:", h.stats()["n_segments"],
      "| committed versions (time travel):", h.versions())

spark.stop()
