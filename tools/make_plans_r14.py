"""Generate PLANS_r14.txt — plan audit of round-14-changed paths,
with in-script asserts so a regressed plan fails the generation
instead of silently writing a stale claim. Run:
    SPARK_GRAFT_CPUS=4 python tools/make_plans_r14.py
"""

import glob
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parq_tools_spark import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PLANS_r14.txt")


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    from pyspark.sql import functions as F

    spark = get_spark("plans-r14")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    work = tempfile.mkdtemp(prefix="plans14_")
    sections = []

    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_topk,
        semantic_dedupe_incremental,
    )
    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
    )

    ap = f"{work}/ann"
    bp = f"{work}/bm25"
    ann_index_build(
        emb, ap, n_cells=4, m=4, n_codes=8,
        store_vectors=True, store_cols=["label"],
    )
    bm25_index_build(docs, bp, n_buckets=8, store_cols=["lang"])
    qs = emb.filter(F.col("vec_id") < 3)

    # 1. filtered ANN top-k, literal-list form: pushed In() filter
    df = ann_index_topk(
        spark, ap, qs, k=5, nprobe=2, allowed_ids=[0, 3, 6, 9, 12]
    )
    plan = fmt(df)
    assert "embeddings.parquet" not in plan
    assert re.search(r"PartitionFilters: \[.*cell.*\]", plan)
    assert re.search(r"PushedFilters: \[.*In\(vec_id", plan)
    sections.append((
        "1. ann_index_topk(allowed_ids=[...]) — literal list, pushed filter",
        "Claim: a literal allowed-id list becomes a data filter PUSHED\n"
        "into the probed-cell segment scans (PushedFilters In(vec_id,..)\n"
        "under the cell= PartitionFilters) — the candidate filter costs\n"
        "planning time, zero joins, and lands BEFORE the per-query\n"
        "ranking window, so the returned k is correct under the filter.\n"
        "The source corpus parquet never appears in the plan.",
        plan,
    ))

    # 2. filtered ANN top-k, DataFrame form: left-semi before ranking
    df = ann_index_topk(
        spark, ap, qs, k=5, nprobe=2,
        allowed_ids=emb.filter("vec_id % 3 = 0").select("vec_id"),
    )
    plan = fmt(df)
    assert "LeftSemi" in plan
    assert re.search(r"PartitionFilters: \[.*cell.*\]", plan)
    sections.append((
        "2. ann_index_topk(allowed_ids=DataFrame) — semi-join form",
        "Claim: a DataFrame of allowed ids left-semi-joins the candidate\n"
        "rows (strategy left to Catalyst/AQE: broadcast when small,\n"
        "shuffled when corpus-sized — an allowed set like 'every English\n"
        "doc' must never be collected), still under the cell pruning and\n"
        "before ranking. Value parity with the list form is pinned by\n"
        "test_filtered_topk.py.",
        plan,
    ))

    # 3. where= over ANN-stored metadata: predicate IS the scan filter
    df = ann_index_topk(spark, ap, qs, k=5, nprobe=2, where="label == 0")
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(label,0\)", plan)
    assert "LeftSemi" not in plan
    assert "embeddings.parquet" not in plan
    sections.append((
        "3. ann_index_topk(where=\"label == 0\") — stored metadata, pushed",
        "Claim: store_cols metadata rides each row's codes through the\n"
        "encoder (zero extra shuffle at build), so the serving predicate\n"
        "compiles to EqualTo(label,0) INSIDE the segment scans'\n"
        "PushedFilters — no metadata table join, no id set materialized,\n"
        "no semi-join shape anywhere in the plan.",
        plan,
    ))

    # 4. where= over BM25-stored metadata on the postings scan
    df = bm25_index_topk(
        spark, bp, "stream merge window", k=10, where="lang == 'en'"
    )
    plan = fmt(df)
    assert re.search(r"PushedFilters: \[.*EqualTo\(lang,en\)", plan)
    assert re.search(r"PartitionFilters: \[.*tbucket.*\]", plan)
    assert "documents.parquet" not in plan
    sections.append((
        "4. bm25_index_topk(where=\"lang == 'en'\") — postings-scan filter",
        "Claim: lang rides every posting row like dl (doc-constant, so\n"
        "scoring/grouping are untouched) and the serving predicate is\n"
        "EqualTo(lang,en) in the bucket-pruned postings scans'\n"
        "PushedFilters. Statistics stay index-wide (the filtered-search\n"
        "contract); oracle bm25_where_topk value-matches DuckDB.",
        plan,
    ))

    # 5. auto task splits — stats-driven salt factor, layout evidence
    from parq_tools_spark.operators import _index_common

    budget = _index_common.AUTO_ROWS_PER_TASK
    _index_common.AUTO_ROWS_PER_TASK = 50
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        auto_p = f"{work}/auto"
        ann_index_build(
            emb.select("vec_id", "embedding"), auto_p,
            n_cells=2, m=4, n_codes=8, cell_task_splits="auto",
        )
    finally:
        spark.conf.set(coalesce_key, prev)
        _index_common.AUTO_ROWS_PER_TASK = budget
    per_cell = {
        c: len(glob.glob(c + "/*.parquet"))
        for c in glob.glob(auto_p + "/seg-*/cell=*")
    }
    assert per_cell and any(n > 1 for n in per_cell.values()), per_cell
    layout = "\n".join(
        f"  {os.path.basename(c)}: {n} file(s)"
        for c, n in sorted(per_cell.items())
    )
    sections.append((
        "5. cell_task_splits=\"auto\" — measured salt factor, bounded write tasks",
        "Claim: \"auto\" resolves the salt factor from the batch's OWN\n"
        "hottest-cell row count over a per-task row budget (one extra\n"
        "aggregation pass), so a hot cell splits across write tasks —\n"
        "multiple files in its cell= directory below — while a uniform\n"
        "batch resolves to 1. The manifest stores the literal \"auto\",\n"
        "so every later ingest re-measures ITS batch. Bit-identity with\n"
        "the unsalted build is pinned by test_auto_cell_task_splits_*.\n"
        "Observed layout (per-task budget pinned to 50 rows):\n" + layout,
        "(file-layout audit; serving plan unchanged — see section 1)",
    ))

    # 6. scoped admission — allowed_ids on the admission dup-join
    dim = len(emb.first()["embedding"])
    batch = spark.createDataFrame(
        [(9001, [1.0] + [0.0] * (dim - 1), 0)],
        "vec_id long, embedding array<double>, label int",
    )
    df = semantic_dedupe_incremental(
        spark, ap, batch, threshold=0.95,
        allowed_ids=emb.filter("label = 0").select("vec_id"),
    )
    plan = fmt(df)
    assert "embeddings.parquet" not in plan.split("LeftSemi")[0]
    assert re.search(r"PartitionFilters: \[.*cell.*\]", plan)
    assert "SortMergeJoin" not in plan
    sections.append((
        "6. semantic_dedupe_incremental(allowed_ids=) — scoped admission",
        "Claim: the admission scope filters the INDEX side of the dup\n"
        "join (who may BLOCK), on top of the existing cell-pruned\n"
        "stored-vector read — the corpus is never rescanned, nothing\n"
        "SortMergeJoins, and the in-batch lower-id rule stays unscoped.\n"
        "Equivalence with a pre-filtered index under the same frozen\n"
        "model is pinned by TestScopedAdmission.",
        plan,
    ))

    with open(OUT, "w") as f:
        f.write(
            "PLANS_r14 — plan audit of round-14-changed paths "
            "(local[4], sf0.001 inputs)\n"
            + "=" * 74 + "\n\n"
        )
        for title, claim, plan in sections:
            f.write(f"## {title}\n{claim}\n\n{plan}\n\n\n")
    shutil.rmtree(work, ignore_errors=True)
    print(f"wrote {OUT} with {len(sections)} sections")


if __name__ == "__main__":
    main()
