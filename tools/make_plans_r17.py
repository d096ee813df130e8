"""Generate PLANS_r17.txt — plan audit of round-17-changed paths,
with in-script asserts so a regressed plan fails the generation
instead of silently writing a stale claim. Run:
    SPARK_GRAFT_CPUS=4 python tools/make_plans_r17.py
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
                   "PLANS_r17.txt")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import functions as F

    spark = get_spark("plans-r17")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    work = tempfile.mkdtemp(prefix="plans17_")
    sections = []

    from parq_tools_spark.operators.ann_index import (
        ann_index_add_metadata_col,
        ann_index_build,
        ann_index_topk,
    )
    from parq_tools_spark.operators.dedup import (
        minhash_index_drop_metadata_col,
        minhash_index_query,
        minhash_index_write,
    )
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_drop_metadata_col,
        bm25_index_stats,
        bm25_index_topk,
    )

    # 1. MULTI-COLUMN backfill: k columns, ONE new segment directory,
    # both columns pushed at serve time inside the cell-pruned scan
    ap = f"{work}/ann"
    ann_index_build(
        emb.select("vec_id", "embedding"), ap, n_cells=4, m=4, n_codes=8
    )
    segs_before = set(glob.glob(ap + "/seg-*"))
    files_before = set(glob.glob(ap + "/seg-*/cell=*/*.parquet"))
    ann_index_add_metadata_col(
        spark, ap,
        emb.select(
            "vec_id", "label",
            (F.col("vec_id") % 2).cast("int").alias("par"),
        ),
    )
    segs_after = set(glob.glob(ap + "/seg-*"))
    assert len(segs_after - segs_before) == 1  # ONE rewrite for k cols
    assert files_before <= set(glob.glob(ap + "/seg-*/cell=*/*.parquet"))
    qs = emb.filter(F.col("vec_id") < 3)
    df = ann_index_topk(
        spark, ap, qs, k=5, nprobe=2, where="label == 1 and par == 0"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(label,1\)", plan)
    assert re.search(r"PushedFilters: \[.*EqualTo\(par,0\)", plan)
    assert "LeftSemi" not in plan
    io_note = (
        f"  segment dirs before 2-column backfill: {len(segs_before)}\n"
        f"  segment dirs after:                    {len(segs_after)} "
        "(exactly ONE new — k columns never pay k rewrites)"
    )
    sections.append((
        "1. multi-column ann_index_add_metadata_col — k columns, one rewrite",
        "Claim: the O(index) rewrite is the entire cost of schema\n"
        "evolution, so a two-column backfill commits ONE new segment\n"
        "(asserted below), with per-column defaults resolved map-side\n"
        "and coverage probed once on the column-pruned code rows.\n"
        "Serving a conjunction over BOTH backfilled columns pushes\n"
        "both EqualTo filters into the cell-pruned scans — identical\n"
        "shape to a fresh two-column build, which is the\n"
        "ann_add_metadata_cols2 oracle (ann_where_topk's SQL plus the\n"
        "parity conjunct).\n" + io_note,
        plan,
    ))

    # 2. bm25 drop leg: statistics untouched, pure-append IO, the
    # surviving column's pushdown intact
    bp = f"{work}/bm"
    bm25_index_build(
        docs.withColumn("grade", (F.col("doc_id") % 3).cast("int")),
        bp, n_buckets=8, store_cols=["lang", "grade"],
    )
    st0 = bm25_index_stats(spark, bp)
    p_before = set(glob.glob(bp + "/seg-*/tbucket=*/*.parquet"))
    bm25_index_drop_metadata_col(spark, bp, "grade")
    st1 = bm25_index_stats(spark, bp)
    assert (st0["n_docs"], st0["sum_dl"]) == (st1["n_docs"], st1["sum_dl"])
    assert st1["params"]["store_cols"] == ["lang"]
    assert p_before <= set(glob.glob(bp + "/seg-*/tbucket=*/*.parquet"))
    df = bm25_index_topk(
        spark, bp, "stream merge window", k=10, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "documents.parquet" not in plan
    sections.append((
        "2. bm25_index_drop_metadata_col — the prune leg",
        "Claim: dropping a stored column is the inverse compaction-\n"
        "shaped rewrite — no token changed (n_docs/sum_dl asserted\n"
        f"equal: {st0['n_docs']} docs / {st0['sum_dl']} tokens),\n"
        "store_cols shrinks atomically, old posting files stay on\n"
        "disk for the reader-grace cycle, and the SURVIVING column's\n"
        "where= keeps its pushed-EqualTo shape. Post-drop serving\n"
        "equals a build that never had the column — the\n"
        "bm25_drop_metadata_col oracle (bm25_where_topk verbatim).",
        plan,
    ))

    # 3. band drop leg (shared drop_band_metadata_cols)
    mp = f"{work}/mh"
    minhash_index_write(
        docs.withColumn("grade", (F.col("doc_id") % 3).cast("int")),
        mp, num_hashes=32, bands=8, store_cols=["lang", "grade"],
    )
    b_before = set(glob.glob(mp + "/seg-*/band=*/*.parquet"))
    minhash_index_drop_metadata_col(spark, mp, "grade")
    assert b_before <= set(glob.glob(mp + "/seg-*/band=*/*.parquet"))
    batch = docs.filter("doc_id < 10").select("doc_id", "text")
    df = minhash_index_query(
        spark, mp, batch, threshold=0.5, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "LeftSemi" not in plan
    sections.append((
        "3. minhash_index_drop_metadata_col — band-row prune",
        "Claim: the band families share one prune implementation\n"
        "(drop_band_metadata_cols, reusing the backfill's read side\n"
        "and commit tail so the two evolution legs cannot drift) —\n"
        "signatures carried, nothing re-shingled, old band files\n"
        "untouched, and the surviving column still serves as a pushed\n"
        "EqualTo in the band scans. Oracle: minhash_drop_metadata_col\n"
        "= minhash_where_query verbatim.",
        plan,
    ))

    # 4. band CDC sink serve phase: a sink-built (cold store_cols
    # bootstrap) index serves the streamed 'M' re-grades with the
    # standard pushed shape — the index a stream maintains is
    # plan-indistinguishable from a batch-built one
    from parq_tools_spark.streaming.index_sink import (
        start_minhash_index_stream,
    )

    src = f"{work}/cdc"
    feed = docs.select(
        "doc_id", "text", "lang",
        F.lit("I").alias("op"), F.lit(1).cast("long").alias("seq"),
    ).unionByName(
        docs.filter((F.col("lang") == "en") & (F.col("doc_id") % 11 == 0))
        .select(
            "doc_id", F.lit(None).cast("string").alias("text"),
            F.lit("zz").alias("lang"),
            F.lit("M").alias("op"), F.lit(2).cast("long").alias("seq"),
        )
    )
    feed.coalesce(1).write.parquet(src + "/f0")
    sp = f"{work}/mh_stream"
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, op string, seq long"
    ).parquet(src + "/*")
    q = start_minhash_index_stream(
        stream, sp, f"{work}/ck", seq_col="seq",
        num_hashes=32, bands=8, store_cols=["lang"],
    )
    assert q.awaitTermination(300)
    df = minhash_index_query(
        spark, sp, batch, threshold=0.5, where="lang == 'zz'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,zz\)", plan)
    assert "LeftSemi" not in plan
    sections.append((
        "4. start_minhash_index_stream — sink-built index, batch-shaped serving",
        "Claim: the r17 band CDC sinks reuse the shared foreachBatch\n"
        "recovery skeleton over the families' apply_cdc, so an index\n"
        "a stream cold-bootstrapped (store_cols= on batch 0) and\n"
        "maintained through I/U/M/D micro-batches serves with the\n"
        "exact plan of a batch-built one: pushed EqualTo on the\n"
        "streamed-in re-grade value inside the band scans, no joins.\n"
        "End-to-end value oracle: minhash_meta_cdc_stream (DuckDB's\n"
        "band pipeline over the post-stream corpus); stream==batch\n"
        "parity: tests/test_index_sink.py.",
        plan,
    ))

    # 5. snapshot 'M' fold: with broadcast_source the 100 TB target
    # never shuffles — the upsert leg AND the meta fold both ride
    # broadcasts
    from parq_tools_spark.operators.merge import apply_cdc

    snap = docs.select("doc_id", "text", "lang")
    ch = spark.createDataFrame(
        [(3, None, "zz", "M", 1), (9999999, "new doc", "en", "I", 1)],
        "doc_id long, text string, lang string, op string, seq long",
    )
    df = apply_cdc(
        snap, ch, ["doc_id"], meta_cols=["lang"], broadcast_source=True
    )
    plan = fmt(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    sections.append((
        "5. merge.apply_cdc meta_cols= — the snapshot-side 'M' fold",
        "Claim: 'M' ops now update the snapshot with the index\n"
        "families' exact resolution instead of NULLing content as a\n"
        "fake upsert — and the fold costs one extra broadcast join\n"
        "over the batch's surviving 'M' keys, never a shuffle of the\n"
        "snapshot: with broadcast_source=True the whole plan (upsert\n"
        "leg + meta fold) is BroadcastHashJoins with zero\n"
        "SortMergeJoin (asserted). A log carrying 'M' without\n"
        "meta_cols=, or any unknown op, raises loudly — one\n"
        "early-stopping take(1) probe per call.",
        plan,
    ))

    with open(OUT, "w") as f:
        f.write(
            "PLANS_r17 — plan audit of round-17-changed paths "
            "(local[4], sf0.001 inputs)\n"
            + "=" * 74 + "\n\n"
        )
        for title, claim, plan in sections:
            f.write(title + "\n" + "-" * len(title) + "\n")
            f.write(claim + "\n\nPlan:\n" + plan + "\n\n")
    print(f"wrote {OUT} ({len(sections)} sections, all asserts passed)")


if __name__ == "__main__":
    main()
