"""Incremental corpus maintenance + repetition hygiene (round 5).

A training-data lake is not write-once: documents get refreshed,
takedowns delete keys, and every refresh re-runs quality filters.
This example drives the round-5 surface end to end: repetition
filters (Gopher family), paragraph-level boilerplate dedup,
semantic dedup over embedding cells, a CDC merge applying a day's
changes without shuffling the snapshot, and PQ-compressed ANN.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parq_tools_spark import (
    apply_cdc,
    dedupe_paragraphs,
    get_spark,
    ngram_repetition_stats,
    pq_build,
    pq_topk,
    semantic_dedupe,
    with_word_repetition_stats,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark("example_12")
out = tempfile.mkdtemp()

# --- repetition hygiene: flag documents dominated by repeated n-grams
docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
rep = with_word_repetition_stats(docs)
ngram = ngram_repetition_stats(docs, n=2)
flagged = ngram.filter("top_ngram_char_frac > 0.15").join(
    rep.select("doc_id", "frac_unique_words"), "doc_id"
)
print("repetition-flagged documents:", flagged.count(), "of", docs.count())

# --- paragraph-level boilerplate dedup (C4/RefinedWeb pass): derive a
# line structure, keep only the corpus-first occurrence of each chunk
chunked = docs.withColumn(
    "text", F.regexp_replace("text", r"((?:\S+ ){2}\S+) ", "$1\n")
)
deduped = dedupe_paragraphs(chunked, sep="\n")
removed = (
    chunked.select(F.explode(F.split("text", "\n"))).count()
    - deduped.agg(F.sum("n_paras_kept")).collect()[0][0]
)
print("boilerplate paragraph occurrences removed:", removed)

# --- semantic dedup: within embedding cells, drop near-identical docs
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
survivors = semantic_dedupe(emb, threshold=0.35, n_cells=8)
print("semantic survivors:", survivors.count(), "of", emb.count())

# --- a day of CDC: refreshed docs (U), takedowns (D), new docs (I).
# The snapshot rides broadcast joins only — at 100 TB this is a
# metadata-rate operation, not a corpus rewrite.
snapshot = spark.read.parquet(f"{SF}/documents.parquet")
changes = (
    snapshot.filter("doc_id % 50 = 0")
    .select(
        "doc_id",
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
        F.concat(F.lit("refreshed: "), "text").alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    .unionByName(
        snapshot.filter("doc_id % 97 = 0").select(
            "doc_id",
            F.lit("D").alias("op"),
            F.lit(2).alias("seq"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
)
next_snapshot = apply_cdc(snapshot, changes, ["doc_id"], broadcast_source=True)
next_snapshot.write.mode("overwrite").parquet(f"{out}/documents_v2")
v2 = spark.read.parquet(f"{out}/documents_v2")
print(
    "snapshot v2:",
    v2.count(),
    "docs,",
    v2.filter(F.col("text").startswith("refreshed:")).count(),
    "refreshed,",
    snapshot.count() - v2.count(),
    "taken down",
)

# --- PQ-compressed ANN: 8 codes per vector instead of 64 floats; the
# codebooks are closed-form (hash-seeded), so the index needs no
# trained state shipped to readers
codes, codebooks = pq_build(emb, m=8, n_codes=16)
codes.write.mode("overwrite").parquet(f"{out}/pq_codes")
queries = emb.filter("vec_id < 2")
hits = pq_topk(
    spark.read.parquet(f"{out}/pq_codes"), codebooks, queries, k=5
)
print("PQ ANN hits:")
hits.orderBy("query_id", "rank").show(10, truncate=False)

# --- persistent incremental dedup: index today's corpus once; every
# future batch dedupes against it by banding ONLY the batch (the
# corpus is never re-shingled and never shuffles), then appends its
# survivors so tomorrow's batch sees them
from parq_tools_spark import incremental_dedupe, minhash_index_write

corpus = snapshot.filter("doc_id < 400").select("doc_id", "text")
minhash_index_write(corpus, f"{out}/mh_index", num_hashes=64, bands=16)
batch = (
    snapshot.filter("doc_id >= 400")
    .select("doc_id", "text")
    .unionByName(  # re-crawled copies of already-indexed documents
        snapshot.filter("doc_id < 5").select(
            (F.col("doc_id") + 90000).alias("doc_id"), "text"
        )
    )
)
fresh = incremental_dedupe(
    spark, f"{out}/mh_index", batch, threshold=0.9, update_index=True
)
print(
    "incremental ingest:",
    batch.count(),
    "arrived,",
    fresh.count(),
    "survived (re-crawls and in-batch dups dropped, index extended)",
)

# --- continuous maintenance: the same CDC merge as above, but driven
# by a change STREAM folding into the snapshot batch by batch
from parq_tools_spark.streaming.cdc import start_cdc_apply

snap2 = f"{out}/documents_stream"
snapshot.write.mode("overwrite").parquet(snap2)
chg_dir = f"{out}/changes"
changes.limit(20).coalesce(1).write.mode("overwrite").parquet(
    f"{chg_dir}/batch1"
)
stream = (
    spark.readStream.schema(changes.schema)
    .option("maxFilesPerTrigger", 1)
    .parquet(f"{chg_dir}/*")
)
q = start_cdc_apply(
    stream, snap2, ["doc_id"], f"{out}/ckpt", available_now=True
)
q.awaitTermination(120)
print(
    "streamed snapshot:",
    spark.read.parquet(snap2).count(),
    "docs after folding the change stream",
)

# --- incremental rollup: a revenue summary that folds ONLY new files
from pyspark.sql import functions as F

from parq_tools_spark.operators.incremental_agg import (
    finalize_aggregate,
    incremental_aggregate,
)

li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
    "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
    F.expr("l_extendedprice * (1 - l_discount)").alias("revenue"),
)
inp, state = f"{out}/facts", f"{out}/rollup_state"
measures = [
    ("sum", "revenue", "decimal(27,6)"),
    ("count", "revenue"),
    ("approx_distinct", "l_orderkey"),
]
for day, pred in enumerate((F.col("l_orderkey") % 2 == r for r in range(2))):
    li.filter(pred).write.parquet(f"{inp}/day{day}")
    st = incremental_aggregate(
        spark, inp, state, ["l_returnflag", "l_linestatus"], measures
    )
    print(f"rollup after day {day}: {st.count()} groups "
          f"(only day {day}'s files were read)")
print("== final rollup (sketch-backed distinct order count) ==")
finalize_aggregate(
    st, averages=["revenue"], distinct_counts=["l_orderkey"]
).select(
    "l_returnflag", "l_linestatus", "n_rows",
    F.round(F.col("revenue_sum").cast("double"), 2).alias("revenue"),
    "l_orderkey_distinct_est",
).orderBy("l_returnflag", "l_linestatus").show()
spark.stop()
