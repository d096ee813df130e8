"""Generate PLANS_r15.txt — plan audit of round-15-changed paths,
with in-script asserts so a regressed plan fails the generation
instead of silently writing a stale claim. Run:
    SPARK_GRAFT_CPUS=4 python tools/make_plans_r15.py
"""

import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parq_tools_spark import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PLANS_r15.txt")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import functions as F

    spark = get_spark("plans-r15")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    work = tempfile.mkdtemp(prefix="plans15_")
    sections = []

    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
        ann_index_update_metadata,
    )
    from parq_tools_spark.operators.dedup import (
        minhash_index_query,
        minhash_index_write,
    )
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_stats,
        bm25_index_topk,
        bm25_index_update_metadata,
        contamination_from_index,
    )
    from parq_tools_spark.operators.simhash_index import (
        simhash_incremental_dedupe,
        simhash_index_query,
        simhash_index_write,
    )

    mp, sp = f"{work}/mh", f"{work}/sh"
    minhash_index_write(
        docs, mp, num_hashes=32, bands=8, store_cols=["lang"]
    )
    simhash_index_write(docs, sp, n_bands=8, store_cols=["lang"])
    batch = docs.filter("doc_id < 10").select("doc_id", "text")

    # 1. minhash where= — pushed EqualTo into the band-row scans
    df = minhash_index_query(
        spark, mp, batch, threshold=0.5, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "LeftSemi" not in plan
    sections.append((
        "1. minhash_index_query(where=\"lang == 'en'\") — band-scan filter",
        "Claim: store_cols metadata rides every band row (carried\n"
        "through the signature aggregation's GROUP KEY — zero extra\n"
        "shuffle at ingest), so the serving predicate compiles to\n"
        "EqualTo(lang,en) inside the index segments' PushedFilters —\n"
        "no metadata table join, no id set, no semi-join. The batch\n"
        "side legitimately scans its own source; the filter sits on\n"
        "the INDEX side only. Value parity with the allowed_ids path\n"
        "is the minhash_where_query oracle.",
        plan,
    ))

    # 2. simhash where= — same shape
    df = simhash_index_query(
        spark, sp, batch, max_hamming=7, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "LeftSemi" not in plan
    sections.append((
        "2. simhash_index_query(where=\"lang == 'en'\") — band-scan filter",
        "Claim: the SimHash mirror (metadata joined onto the\n"
        "fingerprints ONCE at ingest; serving never joins) — the\n"
        "predicate is a pushed EqualTo in the band scans, candidates\n"
        "still verify with bit_count(xor). Oracle: simhash_where_query.",
        plan,
    ))

    # 3. ann_index_update_metadata — metadata flipped, serving shape
    # byte-identical (pushed where, cell pruning), old files untouched
    ap = f"{work}/ann"
    ann_index_build(
        emb, ap, n_cells=4, m=4, n_codes=8, store_cols=["label"]
    )
    before = set(glob.glob(ap + "/seg-*/cell=*/*.parquet"))
    flips = emb.filter("label = 1").limit(5).select(
        "vec_id", F.lit(0).cast("int").alias("label")
    )
    ann_index_update_metadata(spark, ap, flips)
    after = set(glob.glob(ap + "/seg-*/cell=*/*.parquet"))
    assert before <= after and len(after) > len(before)
    qs = emb.filter(F.col("vec_id") < 3)
    df = ann_index_topk(spark, ap, qs, k=5, nprobe=2, where="label == 0")
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(label,0\)", plan)
    assert "LeftSemi" not in plan
    assert "embeddings.parquet" not in plan
    io_note = (
        f"  code files before update: {len(before)}\n"
        f"  code files after update:  {len(after)} "
        "(superset — pure append, nothing rewritten)"
    )
    sections.append((
        "3. ann_index_update_metadata — flip metadata, re-encode nothing",
        "Claim: a metadata-only update rewrites ONLY the affected\n"
        "rows (read back with their existing codes, new segment +\n"
        "version-scoped tombstone, one atomic commit) — every\n"
        "pre-update code file is still on disk untouched, and the\n"
        "post-update serving plan is the same pushed-filter shape as\n"
        "before the update. Equivalence with a fresh build over the\n"
        "flipped corpus is the ann_update_metadata oracle.\n" + io_note,
        plan,
    ))

    # 4. bm25_index_update_metadata — stats untouched by construction
    bp = f"{work}/bm25"
    bm25_index_build(docs, bp, n_buckets=8, store_cols=["lang"])
    st0 = bm25_index_stats(spark, bp)
    vic = bm25_index_topk(spark, bp, "stream merge window", k=1).first()
    bm25_index_update_metadata(
        spark, bp,
        spark.createDataFrame(
            [(vic["doc_id"], "zz")], "doc_id long, lang string"
        ),
    )
    st1 = bm25_index_stats(spark, bp)
    assert (st0["n_docs"], st0["sum_dl"]) == (st1["n_docs"], st1["sum_dl"])
    df = bm25_index_topk(
        spark, bp, "stream merge window", k=10, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "documents.parquet" not in plan
    sections.append((
        "4. bm25_index_update_metadata — same scores, new metadata",
        "Claim: the documents' terms did not change, so the manifest\n"
        "keeps the SAME vocabulary snapshot, n_docs and sum_dl\n"
        f"(asserted: {st0['n_docs']} docs / {st0['sum_dl']} tokens\n"
        "before and after) — post-update scores provably equal a\n"
        "fresh build over the flipped corpus (the\n"
        "bm25_update_metadata oracle). Serving plan unchanged.",
        plan,
    ))

    # 5. contamination_from_index — decontamination with NO corpus scan
    bpp = f"{work}/bmpos"
    bm25_index_build(docs, bpp, n_buckets=8, store_positions=True)
    ev = docs.filter("doc_id % 25 = 0").selectExpr(
        "doc_id AS eval_id", "text"
    )
    df = contamination_from_index(spark, bpp, ev, k=3, threshold=0.6)
    plan = fmt(df)
    assert "documents.parquet" not in plan
    assert re.search(r"PartitionFilters: \[.*tbucket.*\]", plan)
    assert re.search(r"PushedFilters: \[.*In\(term", plan)
    sections.append((
        "5. contamination_from_index — eval containment, zero corpus IO",
        "Claim: the eval set's distinct terms prune the postings read\n"
        "(tbucket PartitionFilters + pushed In(term,...)); candidate\n"
        "doc k-grams are RECONSTRUCTED from the stored positions via\n"
        "co-partitioned (doc, pos) joins and matched on the FULL gram\n"
        "string (selectivity survives a degenerate vocabulary). The\n"
        "corpus parquet appears NOWHERE in the plan (the eval grams\n"
        "are checkpointed) — decontaminating 100 TB against a new\n"
        "benchmark costs O(eval-term postings), not a corpus pass.\n"
        "Value parity with the scan path: contamination_from_index\n"
        "oracle + test_contamination_from_index_equals_scan.",
        plan,
    ))

    # 6. simhash_incremental_dedupe(where=) — scoped admission
    newb = docs.filter("doc_id % 2 = 1").select("doc_id", "text")
    df = simhash_incremental_dedupe(
        spark, sp, newb, max_hamming=7, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "LeftSemi" not in plan.split("BroadcastHashJoin")[0]
    sections.append((
        "6. simhash_incremental_dedupe(where=) — scoped admission",
        "Claim: only predicate-matching INDEX entries may block a new\n"
        "document — the scope is the same pushed EqualTo on the band\n"
        "scans (no semi-join before the candidate joins), the\n"
        "in-batch lower-id rule stays unscoped, and the streaming\n"
        "sink (start_simhash_dedupe_stream) threads the identical\n"
        "kwargs per micro-batch. Equivalence with an index built on\n"
        "the predicate subset: test_streaming_simhash_scoped_*.",
        plan,
    ))

    with open(OUT, "w") as f:
        f.write(
            "PLANS_r15 — plan audit of round-15-changed paths "
            "(local[4], sf0.001 inputs)\n"
            + "=" * 74 + "\n\n"
        )
        for title, claim, plan in sections:
            f.write(title + "\n" + "-" * len(title) + "\n")
            f.write(claim + "\n\nPlan:\n" + plan + "\n\n")
    print(f"wrote {OUT} ({len(sections)} sections, all asserts passed)")


if __name__ == "__main__":
    main()
