"""Generate PLANS_r16.txt — plan audit of round-16-changed paths,
with in-script asserts so a regressed plan fails the generation
instead of silently writing a stale claim. Run:
    SPARK_GRAFT_CPUS=4 python tools/make_plans_r16.py
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
                   "PLANS_r16.txt")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import functions as F

    spark = get_spark("plans-r16")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    work = tempfile.mkdtemp(prefix="plans16_")
    sections = []

    from parq_tools_spark.operators.ann_index import (
        ann_index_add_metadata_col,
        ann_index_build,
        ann_index_topk,
    )
    from parq_tools_spark.operators.dedup import (
        minhash_index_add_metadata_col,
        minhash_index_query,
        minhash_index_write,
    )
    from parq_tools_spark.operators.search import (
        bm25_index_add_metadata_col,
        bm25_index_apply_cdc,
        bm25_index_build,
        bm25_index_stats,
        bm25_index_topk,
        decontaminate_from_index,
    )

    # 1. ann_index_add_metadata_col on a store_vectors=False index —
    # the backfill CANNOT re-encode (no vectors exist), old code
    # files untouched, post-evolution serving is the standard pushed
    # shape on the NEW column
    ap = f"{work}/ann"
    ann_index_build(
        emb.select("vec_id", "embedding"), ap, n_cells=4, m=4, n_codes=8
    )
    before = set(glob.glob(ap + "/seg-*/cell=*/*.parquet"))
    ann_index_add_metadata_col(spark, ap, emb.select("vec_id", "label"))
    after = set(glob.glob(ap + "/seg-*/cell=*/*.parquet"))
    assert before <= after and len(after) > len(before)
    qs = emb.filter(F.col("vec_id") < 3)
    df = ann_index_topk(spark, ap, qs, k=5, nprobe=2, where="label == 1")
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(label,1\)", plan)
    assert "LeftSemi" not in plan
    assert "embeddings.parquet" not in plan
    io_note = (
        f"  code files before backfill: {len(before)}\n"
        f"  code files after backfill:  {len(after)} "
        "(superset — old segments keep their reader-grace cycle)"
    )
    sections.append((
        "1. ann_index_add_metadata_col — evolve store_cols, re-encode nothing",
        "Claim: backfilling a NEW metadata column onto a BARE,\n"
        "store_vectors=False index is possible at all only because the\n"
        "codes are carried as stored bytes — there are no vectors to\n"
        "re-encode from, so the rewrite is one id-lookup join plus the\n"
        "cell-keyed segment write (compaction-shaped commit:\n"
        "segments=[new], tombstones folded, params.store_cols extended\n"
        "atomically). Post-evolution serving pushes EqualTo on the new\n"
        "column into the cell-pruned scans — identical shape to a\n"
        "fresh store_cols build, which is the ann_add_metadata_col\n"
        "oracle (ann_where_topk's SQL verbatim).\n" + io_note,
        plan,
    ))

    # 2. bm25_index_add_metadata_col — statistics untouched BY
    # CONSTRUCTION; where= on the backfilled column is pushed
    bp = f"{work}/bm"
    bm25_index_build(docs.select("doc_id", "text"), bp, n_buckets=8)
    st0 = bm25_index_stats(spark, bp)
    bm25_index_add_metadata_col(spark, bp, docs.select("doc_id", "lang"))
    st1 = bm25_index_stats(spark, bp)
    assert (st0["n_docs"], st0["sum_dl"]) == (st1["n_docs"], st1["sum_dl"])
    df = bm25_index_topk(
        spark, bp, "stream merge window", k=10, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "documents.parquet" not in plan
    sections.append((
        "2. bm25_index_add_metadata_col — same scores, new column",
        "Claim: no token changed, so the manifest keeps the SAME\n"
        "vocabulary snapshot, n_docs and sum_dl (asserted:\n"
        f"{st0['n_docs']} docs / {st0['sum_dl']} tokens before and\n"
        "after) — post-backfill where= serving equals a fresh\n"
        "store_cols build (the bm25_add_metadata_col oracle =\n"
        "bm25_where_topk's SQL verbatim), and the predicate on the\n"
        "column that did not exist at build time pushes into the\n"
        "bucket-pruned postings scans like any built-in one.",
        plan,
    ))

    # 3. minhash backfill — band twin, pushed filter, no semi-join
    mp = f"{work}/mh"
    minhash_index_write(
        docs.select("doc_id", "text"), mp, num_hashes=32, bands=8
    )
    b_before = set(glob.glob(mp + "/seg-*/band=*/*.parquet"))
    minhash_index_add_metadata_col(spark, mp, docs.select("doc_id", "lang"))
    assert b_before <= set(glob.glob(mp + "/seg-*/band=*/*.parquet"))
    batch = docs.filter("doc_id < 10").select("doc_id", "text")
    df = minhash_index_query(
        spark, mp, batch, threshold=0.5, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert "LeftSemi" not in plan
    sections.append((
        "3. minhash_index_add_metadata_col — band-row evolution",
        "Claim: the shared band backfill (add_band_metadata_col, one\n"
        "implementation for MinHash AND SimHash) rewrites every\n"
        "visible band row with the new column — signatures carried,\n"
        "nothing re-shingled, old band files untouched on disk — and\n"
        "the evolved column serves as a pushed EqualTo in the band\n"
        "scans with no metadata join. Oracle:\n"
        "minhash_add_metadata_col = minhash_where_query verbatim.",
        plan,
    ))

    # 4. CDC 'M' fold — metadata re-grade through apply_cdc is pure
    # append (old postings untouched), serving shape unchanged
    bps = f"{work}/bms"
    bm25_index_build(docs, bps, n_buckets=8, store_cols=["lang"])
    p_before = set(glob.glob(bps + "/seg-*/tbucket=*/*.parquet"))
    vic = bm25_index_topk(spark, bps, "stream merge window", k=1).first()
    out = bm25_index_apply_cdc(
        spark, bps,
        spark.createDataFrame(
            [(vic["doc_id"], None, "zz", "M")],
            "doc_id long, text string, lang string, op string",
        ),
    )
    assert out["meta_updated"] == 1 and out["meta_noops"] == 0
    p_after = set(glob.glob(bps + "/seg-*/tbucket=*/*.parquet"))
    assert p_before <= p_after and len(p_after) > len(p_before)
    df = bm25_index_topk(
        spark, bps, "stream merge window", k=10, where="lang == 'zz'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,zz\)", plan)
    io_note = (
        f"  posting files before 'M' op: {len(p_before)}\n"
        f"  posting files after 'M' op:  {len(p_after)} "
        "(superset — the re-grade re-tokenized nothing)"
    )
    sections.append((
        "4. apply_cdc op='M' — metadata re-grades on the change stream",
        "Claim: an 'M' row folds into update_metadata AFTER the\n"
        "batch's deletes and upserts (resolve_cdc_with_meta: last 'M'\n"
        "per id, superseded by an equal-or-later same-batch U/D,\n"
        "not-visible ids are counted no-ops so sink replays converge)\n"
        "— the fold costs an O(affected) segment + tombstone, never a\n"
        "re-tokenize/re-encode upsert, and the no-M fast path costs\n"
        "one early-stopping take(1) probe. Stream==batch parity:\n"
        "tests/test_metadata_lifecycle.py; end-to-end stream oracle:\n"
        "bm25_meta_cdc_stream.\n" + io_note,
        plan,
    ))

    # 5. decontaminate_from_index — anti-join strategy is AQE's call
    bpp = f"{work}/bmpos"
    bm25_index_build(
        docs.select("doc_id", "text"), bpp, n_buckets=8,
        store_positions=True,
    )
    ev = docs.filter("doc_id % 25 = 0").selectExpr(
        "doc_id AS eval_id", "text"
    )
    df = decontaminate_from_index(
        spark, bpp, docs, ev, k=3, threshold=0.6
    )
    plan = fmt(df)
    assert "LeftAnti" in plan
    assert re.search(r"PushedFilters: \[.*In\(term", plan)
    sections.append((
        "5. decontaminate_from_index — AQE-decided anti-join",
        "Claim: the flagged-id side still comes entirely from the\n"
        "term-pruned positional index (pushed In(term,...), zero\n"
        "corpus tokenization), but the final anti-join no longer\n"
        "carries a forced broadcast hint: the flagged DISTINCT set is\n"
        "bounded by how widely the benchmark leaked — millions of ids\n"
        "at a low threshold — so AQE now broadcasts small flag sets\n"
        "and falls back to a shuffled anti-join for large ones instead\n"
        "of pinning the set on every executor.",
        plan,
    ))

    with open(OUT, "w") as f:
        f.write(
            "PLANS_r16 — plan audit of round-16-changed paths "
            "(local[4], sf0.001 inputs)\n"
            + "=" * 74 + "\n\n"
        )
        for title, claim, plan in sections:
            f.write(title + "\n" + "-" * len(title) + "\n")
            f.write(claim + "\n\nPlan:\n" + plan + "\n\n")
    print(f"wrote {OUT} ({len(sections)} sections, all asserts passed)")


if __name__ == "__main__":
    main()
