"""Streaming near-duplicate admission (late round 6).

Documents arrive as a stream; only those that are not near-duplicates
of anything previously admitted make it through. State is the
persistent MinHash band index on disk — shared with batch jobs,
unbounded by any state store, replay-safe (see
streaming/near_dedup.py's recovery contract).

Run: python examples/14_streaming_near_dedup.py
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parq_tools_spark import get_spark
from parq_tools_spark.streaming.near_dedup import start_near_dedupe_stream

spark = get_spark("example_14")
work = tempfile.mkdtemp(prefix="near_dedup_demo_")
src = os.path.join(work, "docs")
os.makedirs(src)

# three "days" of arrivals; day 2 and 3 carry near-copies of earlier docs
day1 = [
    (1, "the quick brown fox jumps over the lazy dog near the river " * 4),
    (2, "pack my box with five dozen liquor jugs before the trip " * 4),
]
day2 = [
    (3, day1[0][1] + "tail"),  # near-copy of doc 1 -> rejected
    (4, "sphinx of black quartz judge my vow said the curator " * 4),
]
day3 = [
    (5, day1[1][1]),  # exact copy of doc 2 -> rejected
    (6, "a genuinely new document about distributed stream processing"),
]
for i, rows in enumerate((day1, day2, day3)):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(os.path.join(src, f"day{i}"))

stream = (
    spark.readStream.schema("doc_id long, text string")
    .option("maxFilesPerTrigger", 1)
    .parquet(os.path.join(src, "*"))
)
q = start_near_dedupe_stream(
    stream,
    index_path=os.path.join(work, "index"),
    output_path=os.path.join(work, "admitted"),
    checkpoint_dir=os.path.join(work, "ckpt"),
    num_hashes=64,
    bands=16,
    compact_every=2,
    available_now=True,
)
q.awaitTermination(180)

admitted = spark.read.parquet(os.path.join(work, "admitted"))
print("== admitted documents (batch = arrival micro-batch) ==")
admitted.select("batch", "doc_id").orderBy("batch", "doc_id").show()
got = sorted(r.doc_id for r in admitted.collect())
assert got == [1, 2, 4, 6], got
print("near-duplicates 3 and 5 rejected; uniques admitted. ok")

shutil.rmtree(work, ignore_errors=True)
spark.stop()
