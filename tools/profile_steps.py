"""Per-step wall-clock attribution for the heavy index operations at
bench scale (guide §1: measure first). Times each internal phase of
bm25_index_build / upsert / delete / update_metadata / apply_cdc and
the ann build, so optimization targets the step that actually costs,
not the one that looks expensive. Run on a QUIET box:

    python tools/profile_steps.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {dt:7.3f}s  {label}", flush=True)
    return out


def main():
    from pyspark.sql import functions as F

    from parq_tools_spark import get_spark

    spark = get_spark("profile-steps")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    t("warmup count", lambda: docs.count())
    t("trivial job (range.count)", lambda: spark.range(10).count())
    t("trivial job 2", lambda: spark.range(10).count())

    work = tempfile.mkdtemp(prefix="prof_")
    try:
        # ---- bm25_index_build step by step -------------------------
        from parq_tools_spark.operators import search as S

        print("bm25_index_build steps:")
        path = f"{work}/bm"
        corpus = docs.select("doc_id", "text")
        post = S._postings(corpus, "doc_id", "text", False, [])
        t(
            "  postings write",
            lambda: S._write_postings_segment(post, f"{path}/seg-1", 32, 1),
        )
        t(
            "  docs sidecar write",
            lambda: S._write_segment_docs(corpus, "doc_id", "text", f"{path}/seg-1"),
        )
        t(
            "  terms write",
            lambda: S._write_terms(
                S._segment_terms(spark, path, "seg-1"), f"{path}/terms-1"
            ),
        )
        shutil.rmtree(path, ignore_errors=True)
        t(
            "bm25_index_build TOTAL",
            lambda: S.bm25_index_build(corpus, path, n_buckets=32),
        )
        t(
            "bm25 build with store_cols TOTAL",
            lambda: S.bm25_index_build(
                docs, f"{work}/bm2", n_buckets=8, store_cols=["lang"]
            ),
        )

        # ---- upsert / delete / update_metadata ---------------------
        batch = docs.select("doc_id", "text").filter(F.col("doc_id") % 10 == 0)
        t("bm25_index_upsert (10% batch)", lambda: S.bm25_index_upsert(batch, path))
        dels = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id")
        t("bm25_index_delete (6%)", lambda: S.bm25_index_delete(spark, path, dels))
        flips = docs.filter(F.col("doc_id") % 97 == 0).select(
            "doc_id", F.lit("zz").alias("lang")
        )
        t(
            "bm25_update_metadata (1%)",
            lambda: S.bm25_index_update_metadata(spark, f"{work}/bm2", flips),
        )

        # ---- apply_cdc (U+D+M mix) --------------------------------
        ch = (
            docs.filter(F.col("doc_id") % 50 == 0)
            .select(
                "doc_id",
                "text",
                F.lit("en").alias("lang"),
                F.when(F.col("doc_id") % 100 == 0, "D")
                .otherwise("U")
                .alias("op"),
                F.lit(1).alias("seq"),
            )
        )
        t(
            "bm25_index_apply_cdc (2% U/D)",
            lambda: S.bm25_index_apply_cdc(
                spark, f"{work}/bm2", ch, seq_col="seq"
            ),
        )

        # ---- ann build --------------------------------------------
        from parq_tools_spark.operators import ann_index as A

        emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        t(
            "ann_index_build TOTAL",
            lambda: A.ann_index_build(
                emb, f"{work}/ann", n_cells=8, m=8, n_codes=16
            ),
        )

        # ---- minhash / simhash builds -----------------------------
        from parq_tools_spark.operators import dedup as D
        from parq_tools_spark.operators import simhash_index as SH

        t(
            "minhash_index_write TOTAL",
            lambda: D.minhash_index_write(
                docs.select("doc_id", "text"), f"{work}/mh",
                num_hashes=64, bands=16,
            ),
        )
        t(
            "simhash_index_write TOTAL",
            lambda: SH.simhash_index_write(
                docs.select("doc_id", "text"), f"{work}/sh"
            ),
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
