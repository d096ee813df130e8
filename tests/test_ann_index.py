"""Persisted IVF-PQ ANN index (operators/ann_index.py): equivalence
with the per-call path, the lossless/full-probe brute-force gate, the
versioned-manifest lifecycle, and the partition-pruned serving plan."""

import os

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.ann_index import (
    ann_index_add,
    ann_index_build,
    ann_index_compact,
    ann_index_delete,
    ann_index_stats,
    ann_index_topk,
    ann_index_upsert,
)


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _rows(df):
    return sorted(
        (r.query_id, r.vec_id, r.pq_score, r.rank) for r in df.collect()
    )


def test_index_served_equals_per_call_ivfpq(spark, emb, tmp_path):
    """Index-served top-k must be BIT-IDENTICAL to the per-call
    ivf_pq_topk with the same params (same probes, same ADC tables,
    same rounding, same order)."""
    from parq_tools_spark.operators.similarity import ivf_pq_topk

    path = str(tmp_path / "annidx")
    ann_index_build(emb, path, n_cells=8, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 3)
    idx = ann_index_topk(spark, path, qs, k=5, nprobe=2)
    per_call = ivf_pq_topk(emb, qs, k=5, n_cells=8, nprobe=2, m=8, n_codes=16)
    got = _rows(idx.select("query_id", "vec_id", "pq_score", "rank"))
    want = _rows(per_call.select("query_id", "vec_id", "pq_score", "rank"))
    assert got == want and len(got) == 15
    assert {r.index_version for r in idx.collect()} == {1}


def test_lossless_fullprobe_opq_equals_brute_force(spark, emb, tmp_path):
    """The equivalence gate: nprobe=n_cells + identity codebook + OPQ
    rotation -> index-served result set equals brute-force cosine
    top-k exactly."""
    from parq_tools_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "annidx")
    ann_index_build(emb, path, n_cells=8, m=8, n_codes=None, opq=True,
                    opq_sample=64)
    qs = emb.filter(F.col("vec_id") < 3)
    idx = {
        (r.query_id, r.vec_id)
        for r in ann_index_topk(spark, path, qs, k=5, nprobe=8).collect()
    }
    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, qs, k=5).collect()
    }
    assert idx == bf and len(idx) == 15


def test_add_uses_frozen_model_and_lifecycle(spark, emb, tmp_path):
    """ann_index_add encodes under the model frozen at build (codes
    of the added batch match pq_encode against the stored codebooks),
    versions/n_vecs advance, and added vectors are served."""
    from parq_tools_spark.operators.ann_index import (
        _ann_manifest,
        _read_model,
    )
    from parq_tools_spark.operators.similarity import pq_encode

    path = str(tmp_path / "annidx")
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    odds = emb.filter(F.col("vec_id") % 2 == 1)
    ann_index_build(evens, path, n_cells=8, m=8, n_codes=16)
    s1 = ann_index_stats(spark, path)
    ann_index_add(odds, path)
    s2 = ann_index_stats(spark, path)
    assert s2["version"] == s1["version"] + 1
    assert s2["n_vecs"] == emb.count()

    vs, _, m = _ann_manifest(spark, path)
    _, codebooks, rot = _read_model(vs.fs, path, m)
    want = {
        r.vec_id: r.codes
        for r in pq_encode(odds, codebooks, rotation=rot).collect()
    }
    stored = {
        r.vec_id: r.codes
        for seg in m["segments"]
        for r in spark.read.parquet(f"{path}/{seg}").collect()
        if r.vec_id % 2 == 1
    }
    assert stored == want and len(stored) > 0

    qs = emb.filter(F.col("vec_id") < 3)
    served = ann_index_topk(spark, path, qs, k=10, nprobe=8)
    assert served.filter(F.col("vec_id") % 2 == 1).count() > 0
    assert {r.index_version for r in served.collect()} == {2}


def test_crash_invisible_rebuild_nondestructive_compact(
    spark, emb, tmp_path
):
    """A crash at the commit point (injected) leaves the old index
    serving identical results; a completed rebuild grace-keeps the
    previous generation one cycle; compaction folds segments and
    preserves results bit-for-bit."""
    from parq_tools_spark.sources import statefs

    path = str(tmp_path / "annidx")
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    ann_index_build(evens, path, n_cells=4, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 3)
    before = _rows(
        ann_index_topk(spark, path, qs, k=5, nprobe=2).select(
            "query_id", "vec_id", "pq_score", "rank"
        )
    )

    real_commit = statefs.VersionedState.commit

    def boom(self, n, text):
        raise RuntimeError("injected crash before commit")

    statefs.VersionedState.commit = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            ann_index_build(emb, path, n_cells=4, m=8, n_codes=16)
    finally:
        statefs.VersionedState.commit = real_commit
    assert (
        _rows(
            ann_index_topk(spark, path, qs, k=5, nprobe=2).select(
                "query_id", "vec_id", "pq_score", "rank"
            )
        )
        == before
    )
    assert ann_index_stats(spark, path)["version"] == 1

    # completed rebuild: old generation survives this cycle
    ann_index_build(emb, path, n_cells=4, m=8, n_codes=16)
    assert ann_index_stats(spark, path)["version"] == 2
    assert os.path.exists(os.path.join(path, "v=1"))

    # two more segments, then compaction
    # (adds of fresh ids keep the id-unique contract)
    extra1 = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    extra2 = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 200000
    )
    ann_index_add(extra1, path)
    ann_index_add(extra2, path)
    pre = _rows(
        ann_index_topk(spark, path, qs, k=5, nprobe=4).select(
            "query_id", "vec_id", "pq_score", "rank"
        )
    )
    compacted = ann_index_compact(spark, path, min_files_per_cell=1)
    assert compacted
    post = _rows(
        ann_index_topk(spark, path, qs, k=5, nprobe=4).select(
            "query_id", "vec_id", "pq_score", "rank"
        )
    )
    assert post == pre
    # old generations swept by the following cycle
    assert ann_index_compact(spark, path) == {}
    segs = [e for e in os.listdir(path) if e.startswith("seg-")]
    assert len(segs) == 1
    assert not os.path.exists(os.path.join(path, "v=1"))


def test_serving_plan_prunes_partitions_never_reads_vectors(
    spark, emb, tmp_path
):
    """The serving plan must (a) prune the codes scan to the probed
    cell directories at PLANNING time (PartitionFilters on cell) and
    (b) never touch the corpus or any embedding column — the index
    reads m small ints per candidate, not dim floats."""
    path = str(tmp_path / "annidx")
    ann_index_build(emb, path, n_cells=8, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 2).localCheckpoint(eager=True)
    q = ann_index_topk(spark, path, qs, k=5, nprobe=2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    assert "cell#" in plan.split("PartitionFilters", 1)[1][:400] or (
        "cell IN" in plan
    )
    assert "embedding" not in plan
    assert "embeddings.parquet" not in plan


def test_validation_and_missing_index(spark, emb, tmp_path):
    with pytest.raises(ValueError, match="no committed ann index"):
        ann_index_stats(spark, str(tmp_path / "nope"))
    path = str(tmp_path / "annidx")
    ann_index_build(emb.limit(50), path, n_cells=4, m=8, n_codes=8)
    with pytest.raises(ValueError, match="no queries"):
        ann_index_topk(spark, path, emb.filter("vec_id < 0"), k=5)
    dup = emb.limit(1).unionByName(emb.limit(1))
    with pytest.raises(ValueError, match="duplicate"):
        ann_index_topk(spark, path, dup, k=5)


def test_round_to_forwarded_everywhere(spark, emb, tmp_path):
    """Regression (review r9): ivf_pq_topk must forward round_to to
    the PQ encoding, so the index/per-call bit-identity holds on
    non-default grids too."""
    from parq_tools_spark.operators.similarity import ivf_pq_topk

    path = str(tmp_path / "annidx5")
    ann_index_build(emb, path, n_cells=8, m=8, n_codes=16, round_to=4)
    qs = emb.filter(F.col("vec_id") < 3)
    idx = _rows(
        ann_index_topk(spark, path, qs, k=5, nprobe=2).select(
            "query_id", "vec_id", "pq_score", "rank"
        )
    )
    per_call = _rows(
        ivf_pq_topk(
            emb, qs, k=5, n_cells=8, nprobe=2, m=8, n_codes=16, round_to=4
        ).select("query_id", "vec_id", "pq_score", "rank")
    )
    assert idx == per_call and len(idx) == 15


def test_ann_index_delete_upsert_lifecycle(spark, emb, tmp_path):
    """Version-scoped tombstones on the ANN index: delete hides a
    vector from serving; upsert (replace embedding) is immediately
    visible without compaction; compaction folds tombstones and
    preserves results; invalid deletes raise."""
    path = str(tmp_path / "annidx")
    ann_index_build(emb, path, n_cells=8, m=8, n_codes=16)
    qs = emb.filter(F.col("vec_id") < 3).localCheckpoint(eager=True)
    full = ann_index_topk(spark, path, qs, k=50, nprobe=8)
    victim = int(
        full.filter(F.col("rank") == 1).first()["vec_id"]
    )

    out = ann_index_delete(spark, path, [victim])
    assert out["deleted"] == 1
    st = ann_index_stats(spark, path)
    assert st["n_vecs"] == emb.count() - 1
    assert st["pending_delete_batches"] == 1
    served = ann_index_topk(spark, path, qs, k=50, nprobe=8)
    assert served.filter(F.col("vec_id") == victim).count() == 0

    # double delete: loud
    with pytest.raises(ValueError, match="not visible"):
        ann_index_delete(spark, path, [victim])
    # never-indexed id: loud
    with pytest.raises(ValueError, match="not visible"):
        ann_index_delete(spark, path, [987654321])

    # upsert the victim back with a DIFFERENT embedding: visible at
    # once (no compaction), codes re-encoded under the frozen model
    replacement = emb.filter(F.col("vec_id") == victim + 7).withColumn(
        "vec_id", F.lit(victim).cast("long")
    ).select("vec_id", "embedding")
    res = ann_index_upsert(replacement, path)
    assert (res["updated"], res["inserted"]) == (0, 1)  # was deleted -> insert
    # a second upsert of the same id IS an update
    res2 = ann_index_upsert(replacement, path)
    assert (res2["updated"], res2["inserted"]) == (1, 0)
    assert ann_index_stats(spark, path)["n_vecs"] == emb.count()
    back = ann_index_topk(spark, path, qs, k=200, nprobe=8)
    assert back.filter(F.col("vec_id") == victim).count() > 0

    # compaction folds, results bit-identical before/after
    pre = _rows(
        ann_index_topk(spark, path, qs, k=10, nprobe=8).select(
            "query_id", "vec_id", "pq_score", "rank"
        )
    )
    ann_index_compact(spark, path, min_files_per_cell=1)
    assert ann_index_stats(spark, path)["pending_delete_batches"] == 0
    post = _rows(
        ann_index_topk(spark, path, qs, k=10, nprobe=8).select(
            "query_id", "vec_id", "pq_score", "rank"
        )
    )
    assert post == pre


def test_exclude_self_type_guard_on_string_id_index(spark, tmp_path):
    """Long query ids vs a string-id index: exclude_self=True must
    fail loudly UP FRONT (ANSI mode would throw CAST_INVALID_INPUT
    mid-query; non-ANSI would cast to NULL and silently drop every
    candidate); exclude_self=False skips the predicate entirely and
    serves normally."""
    svecs = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    path = str(tmp_path / "sidx")
    ann_index_build(svecs, path, n_cells=2, m=2, n_codes=None)
    qs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exclude_self"):
        ann_index_topk(
            spark, path, qs, k=2, nprobe=2,
            query_id_col="query_id", query_vec_col="embedding",
        )
    got = sorted(
        ann_index_topk(
            spark, path, qs, k=2, nprobe=2,
            query_id_col="query_id", query_vec_col="embedding",
            exclude_self=False,
        ).collect(),
        key=lambda r: r.rank,
    )
    assert [r.vec_id for r in got] == ["a", "b"]


def test_exclude_self_false_keeps_matching_id(spark, emb, tmp_path):
    """exclude_self=False must surface the corpus vector even when
    its id equals the query id (lossless config: it is the exact
    query vector, so it ranks first with sim 1.0)."""
    path = str(tmp_path / "annidx")
    ann_index_build(
        emb, path, n_cells=8, m=8, n_codes=None, opq=True, opq_sample=64
    )
    qs = emb.filter(F.col("vec_id") == 0)
    with_self = sorted(
        ann_index_topk(
            spark, path, qs, k=3, nprobe=8, exclude_self=False
        ).collect(),
        key=lambda r: r.rank,
    )
    assert with_self[0].vec_id == 0 and with_self[0].pq_score == 1.0
    without = ann_index_topk(spark, path, qs, k=3, nprobe=8).collect()
    assert 0 not in {r.vec_id for r in without}


def test_max_queries_caps_driver_collect(spark, emb, tmp_path):
    path = str(tmp_path / "annidx")
    ann_index_build(emb, path, n_cells=4, m=8, n_codes=8)
    qs = emb.filter(F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="max_queries"):
        ann_index_topk(spark, path, qs, k=2, nprobe=2, max_queries=3)
    ok = ann_index_topk(spark, path, qs, k=2, nprobe=2, max_queries=5)
    assert ok.count() == 10


def test_refine_recovers_brute_force_on_lossy_codebook(spark, emb, tmp_path):
    """The refine gate: on a LOSSY codebook (the config where ADC
    alone provably differs from exact cosine), full-probe serving
    with refine >= corpus re-scores every candidate against its
    stored exact vector — the result set EQUALS brute-force top-k.
    A partial refine lands strictly between (recall improves
    monotonically with R)."""
    from parq_tools_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "annidx")
    ann_index_build(
        emb, path, n_cells=8, m=8, n_codes=16, store_vectors=True
    )
    n = emb.count()
    qs = emb.filter(F.col("vec_id") < 3)
    bf = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, qs, k=10).collect()
    }
    adc = {
        (r.query_id, r.vec_id)
        for r in ann_index_topk(spark, path, qs, k=10, nprobe=8).collect()
    }
    assert adc != bf  # quantization error is real on this config
    part = {
        (r.query_id, r.vec_id)
        for r in ann_index_topk(
            spark, path, qs, k=10, nprobe=8, refine=40
        ).collect()
    }
    assert len(part & bf) > len(adc & bf)
    full = {
        (r.query_id, r.vec_id)
        for r in ann_index_topk(
            spark, path, qs, k=10, nprobe=8, refine=n
        ).collect()
    }
    assert full == bf


def test_refine_validation_and_add_path(spark, emb, tmp_path):
    """refine < k and a no-vectors index raise; a batch added AFTER
    the build stores its vectors too, so refined serving sees it."""
    path = str(tmp_path / "annidx")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    ann_index_build(
        base, path, n_cells=4, m=8, n_codes=16, store_vectors=True
    )
    ann_index_add(extra, path)
    qs = emb.filter(F.col("vec_id") == 450)  # an added-batch vector
    got = sorted(
        ann_index_topk(
            spark, path, qs, k=5, nprobe=4, refine=1000
        ).collect(),
        key=lambda r: r.rank,
    )
    assert len(got) == 5 and all(r.cosine_sim <= 1.0 for r in got)

    with pytest.raises(ValueError, match="refine.*must be >= k"):
        ann_index_topk(spark, path, qs, k=10, refine=5)
    path2 = str(tmp_path / "novec")
    ann_index_build(base, path2, n_cells=4, m=8, n_codes=16)
    with pytest.raises(ValueError, match="store_vectors"):
        ann_index_topk(spark, path2, qs, k=5, refine=50)


def test_refine_survives_delete_and_compaction(spark, emb, tmp_path):
    """Stored vectors ride the same segment lifecycle as codes:
    tombstoned ids drop out of refined serving, and compaction
    preserves the vec column so refine keeps working after the
    rewrite."""
    from parq_tools_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "annidx")
    ann_index_build(
        emb, path, n_cells=4, m=8, n_codes=16, store_vectors=True
    )
    n = emb.count()
    qs = emb.filter(F.col("vec_id") == 0)
    victim = ann_index_topk(
        spark, path, qs, k=1, nprobe=4, refine=n
    ).first()["vec_id"]
    ann_index_delete(spark, path, [int(victim)])
    after = {
        r.vec_id
        for r in ann_index_topk(
            spark, path, qs, k=10, nprobe=4, refine=n
        ).collect()
    }
    assert victim not in after
    def snap():
        # index_version legitimately bumps on compaction — compare
        # the served values only
        return sorted(
            (r.query_id, r.vec_id, r.cosine_sim, r.rank)
            for r in ann_index_topk(
                spark, path, qs, k=10, nprobe=4, refine=n
            ).collect()
        )

    pre = snap()
    ann_index_compact(spark, path, min_files_per_cell=1)
    post = snap()
    assert post == pre


def test_retrain_equals_fresh_build_and_bumps_model(spark, emb, tmp_path):
    """ann_index_retrain refits the model from the STORED vectors and
    must serve bit-identically to a from-scratch ann_index_build over
    the same visible corpus (hash-seeding depends only on ids and
    float64 vector values; float32->float64 upcast is exact). It must
    also actually CHANGE the model when the corpus drifted — the
    frozen-model pre-retrain results differ."""
    from parq_tools_spark.operators.ann_index import ann_index_retrain

    k = F.col("vec_id")
    path = str(tmp_path / "grown")
    ann_index_build(
        emb.filter(k % 2 == 0).select("vec_id", "embedding"), path,
        n_cells=8, m=8, n_codes=16, store_vectors=True,
    )
    ann_index_add(emb.filter(k % 2 == 1).select("vec_id", "embedding"), path)
    qs = emb.filter(k < 5).select("vec_id", "embedding")
    pre = _rows(
        ann_index_topk(spark, path, qs, k=5, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    ann_index_retrain(spark, path)
    post = _rows(
        ann_index_topk(spark, path, qs, k=5, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    fresh_path = str(tmp_path / "fresh")
    ann_index_build(
        emb.select("vec_id", "embedding"), fresh_path,
        n_cells=8, m=8, n_codes=16, store_vectors=True,
    )
    fresh = _rows(
        ann_index_topk(spark, fresh_path, qs, k=5, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    assert post == fresh
    assert pre != post  # the drifted half re-seeded the model
    st = ann_index_stats(spark, path)
    assert st["n_vecs"] == emb.count()
    assert st["params"]["store_vectors"] is True


def test_retrain_honors_tombstones_and_folds_them(spark, emb, tmp_path):
    """Retrain reads only VISIBLE vectors: deleted ids never re-enter
    the rebuilt corpus, n_vecs reflects the deletes, and the fresh
    generation carries no pending tombstones."""
    from parq_tools_spark.operators.ann_index import ann_index_retrain

    path = str(tmp_path / "idx")
    ann_index_build(
        emb.select("vec_id", "embedding"), path,
        n_cells=8, m=8, n_codes=16, store_vectors=True, keep_versions=2,
    )
    ann_index_delete(spark, path, [0, 2])
    ann_index_retrain(spark, path)
    st = ann_index_stats(spark, path)
    assert st["n_vecs"] == emb.count() - 2
    assert st["pending_delete_batches"] == 0
    qs = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")
    got = (
        ann_index_topk(spark, path, qs, k=1000, nprobe=8)
        .select("vec_id").distinct()
    )
    assert got.filter(F.col("vec_id").isin(0, 2)).count() == 0


def test_retrain_improves_drifted_corpus_recall(spark, emb, tmp_path):
    """The drift story end-to-end: build on labels 0-4, add labels
    5-9 under the frozen model, query from the drifted half — recall
    vs brute force must not get worse after retrain (on this fixture
    it strictly improves; everything is hash-seeded so the margin is
    deterministic)."""
    from parq_tools_spark.operators.ann_index import ann_index_retrain
    from parq_tools_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "drift")
    ann_index_build(
        emb.filter(F.col("label") < 5).select("vec_id", "embedding"),
        path, n_cells=16, m=8, n_codes=16, store_vectors=True,
    )
    ann_index_add(
        emb.filter(F.col("label") >= 5).select("vec_id", "embedding"), path
    )
    qs = emb.filter(
        (F.col("label") >= 5) & (F.col("vec_id") % 7 == 0)
    ).select("vec_id", "embedding")
    want = set(
        (r.query_id, r.vec_id)
        for r in brute_force_topk(
            emb.select("vec_id", "embedding"), qs, k=10
        ).select("query_id", "vec_id").collect()
    )

    def recall():
        got = set(
            (r.query_id, r.vec_id)
            for r in ann_index_topk(spark, path, qs, k=10, nprobe=4)
            .select("query_id", "vec_id").collect()
        )
        return len(got & want) / len(want)

    pre = recall()
    ann_index_retrain(spark, path)
    post = recall()
    assert post >= pre
    assert post > 0


def test_retrain_guards(spark, emb, tmp_path):
    """No stored vectors -> actionable error; fully-deleted index ->
    actionable error; geometry overrides are applied and n_codes=None
    is reachable (identity codebook, not the inherited width)."""
    from parq_tools_spark.operators.ann_index import ann_index_retrain

    bare = str(tmp_path / "bare")
    ann_index_build(
        emb.select("vec_id", "embedding"), bare, n_cells=8, m=8, n_codes=16
    )
    with pytest.raises(ValueError, match="store_vectors"):
        ann_index_retrain(spark, bare)

    small = str(tmp_path / "small")
    ann_index_build(
        emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding"),
        small, n_cells=2, m=8, n_codes=4, store_vectors=True,
        keep_versions=2,
    )
    ann_index_delete(spark, small, list(range(10)))
    with pytest.raises(ValueError, match="no visible vectors"):
        ann_index_retrain(spark, small)

    geo = str(tmp_path / "geo")
    ann_index_build(
        emb.select("vec_id", "embedding"), geo,
        n_cells=8, m=8, n_codes=16, store_vectors=True,
    )
    ann_index_retrain(spark, geo, n_cells=4, n_codes=None)
    st = ann_index_stats(spark, geo)
    assert st["params"]["n_cells"] == 4
    # identity codebook: realized width == corpus size, not 16
    assert st["params"]["n_codes"] == emb.count()


def test_cell_task_splits_bit_identical_and_multifile(
    spark, emb, tmp_path
):
    """cell_task_splits salts only the WRITE shuffle: a hot cell
    splits across tasks (multiple files in its cell= directory) but
    serving reads whole cell directories, so topk is bit-identical
    to the unsalted build; add inherits the stored setting."""
    import glob

    from parq_tools_spark.operators.ann_index import ann_index_stats

    k = F.col("vec_id")
    plain = str(tmp_path / "plain")
    salted = str(tmp_path / "salted")
    ann_index_build(emb.select("vec_id", "embedding"), plain,
                    n_cells=2, m=8, n_codes=16)
    # at test scale AQE would coalesce the tiny salted shuffle back
    # into one partition per cell (at real scale it only merges SMALL
    # partitions — exactly the desired interplay); pin it off to
    # observe the split in the file layout
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        ann_index_build(emb.select("vec_id", "embedding"), salted,
                        n_cells=2, m=8, n_codes=16, cell_task_splits=4)
    finally:
        spark.conf.set(coalesce_key, prev)
    st = ann_index_stats(spark, salted)
    assert st["params"]["cell_task_splits"] == 4
    cells = glob.glob(salted + "/seg-*/cell=*")
    assert cells
    # the salt actually split the write: some cell dir has >1 file
    assert any(
        len(glob.glob(c + "/*.parquet")) > 1 for c in cells
    ), "no cell directory carries multiple files"
    qs = emb.filter(k < 5).select("vec_id", "embedding")
    a = _rows(
        ann_index_topk(spark, plain, qs, k=5, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    b = _rows(
        ann_index_topk(spark, salted, qs, k=5, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    assert a == b
    # add inherits the stored splits and stays equivalent
    ann_index_add(
        emb.select((k + 10_000).alias("vec_id"), "embedding"), salted
    )
    ann_index_add(
        emb.select((k + 10_000).alias("vec_id"), "embedding"), plain
    )
    a2 = _rows(
        ann_index_topk(spark, plain, qs, k=8, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    b2 = _rows(
        ann_index_topk(spark, salted, qs, k=8, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    assert a2 == b2

    with pytest.raises(ValueError, match="cell_task_splits"):
        ann_index_build(
            emb.select("vec_id", "embedding"), str(tmp_path / "bad"),
            cell_task_splits=0,
        )


def test_retrain_refuses_manifest_segment_with_no_files(
    spark, emb, tmp_path
):
    """A committed manifest's segments must exist: retrain REWRITES
    the index from what it reads, so a segment whose listing comes
    back empty (transient FS fault, external deletion) must fail the
    call loudly — silently skipping it would commit permanent,
    unreported vector loss as the new truth."""
    import shutil

    from parq_tools_spark.operators.ann_index import (
        _ann_manifest,
        ann_index_retrain,
    )

    k = F.col("vec_id")
    path = str(tmp_path / "idx")
    ann_index_build(
        emb.filter(k % 2 == 0).select("vec_id", "embedding"), path,
        n_cells=8, m=8, n_codes=16, store_vectors=True,
    )
    ann_index_add(emb.filter(k % 2 == 1).select("vec_id", "embedding"), path)
    _, _, m = _ann_manifest(spark, path)
    lost = m["segments"][-1]
    shutil.rmtree(os.path.join(path, lost))
    with pytest.raises(ValueError, match="no data files"):
        ann_index_retrain(spark, path)


def test_retrain_identity_codebook_roundtrips(spark, emb, tmp_path):
    """An index built with n_codes=None (identity codebook: every
    training row a codeword) must retrain back into an identity
    codebook by default — the manifest records the CONFIGURED
    n_codes alongside the realized width, and retrain defaults to the
    configured value, so geometry round-trips without the caller
    re-passing n_codes=None."""
    from parq_tools_spark.operators.ann_index import ann_index_retrain

    k = F.col("vec_id")
    path = str(tmp_path / "ident")
    ann_index_build(
        emb.filter(k % 2 == 0).select("vec_id", "embedding"), path,
        n_cells=8, m=8, n_codes=None, store_vectors=True,
    )
    st0 = ann_index_stats(spark, path)
    assert st0["params"]["n_codes_configured"] is None
    n_even = emb.filter(k % 2 == 0).count()
    assert st0["params"]["n_codes"] == n_even

    ann_index_add(emb.filter(k % 2 == 1).select("vec_id", "embedding"), path)
    ann_index_retrain(spark, path)
    st = ann_index_stats(spark, path)
    # identity preserved: realized width grew to the FULL corpus
    assert st["params"]["n_codes_configured"] is None
    assert st["params"]["n_codes"] == emb.count()

    # and the retrained index equals a fresh identity build
    fresh = str(tmp_path / "fresh_ident")
    ann_index_build(
        emb.select("vec_id", "embedding"), fresh,
        n_cells=8, m=8, n_codes=None, store_vectors=True,
    )
    qs = emb.filter(k < 3).select("vec_id", "embedding")
    a = _rows(
        ann_index_topk(spark, path, qs, k=5, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    b = _rows(
        ann_index_topk(spark, fresh, qs, k=5, nprobe=2)
        .select("query_id", "vec_id", "pq_score", "rank")
    )
    assert a == b


def test_auto_cell_task_splits_measures_skew(
    spark, emb, tmp_path, monkeypatch
):
    """cell_task_splits='auto' derives the salt factor from the
    batch's OWN hottest-cell row count (no guessing): with the
    per-task row budget pinned small, the skewed build resolves to
    >1 (multiple files in a hot cell= directory), serving stays
    bit-identical to the unsalted build, and the manifest stores the
    literal 'auto' so a later add RE-MEASURES its batch."""
    import glob

    from parq_tools_spark.operators import _index_common
    from parq_tools_spark.operators._index_common import (
        auto_task_splits,
    )

    # the resolver itself: uniform budget -> 1, tight budget -> >1
    cells2 = emb.select(
        "vec_id", (F.col("vec_id") % 2).alias("cell")
    )
    assert auto_task_splits(cells2, "cell", rows_per_task=10**9) == 1
    import math

    hot = cells2.groupBy("cell").count().agg(
        F.max("count")
    ).first()[0]
    assert auto_task_splits(
        cells2, "cell", rows_per_task=10
    ) == min(64, math.ceil(hot / 10))

    monkeypatch.setattr(_index_common, "AUTO_ROWS_PER_TASK", 50)
    k = F.col("vec_id")
    plain = str(tmp_path / "plain")
    autop = str(tmp_path / "auto")
    ann_index_build(emb.select("vec_id", "embedding"), plain,
                    n_cells=2, m=8, n_codes=16)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        ann_index_build(
            emb.select("vec_id", "embedding"), autop,
            n_cells=2, m=8, n_codes=16, cell_task_splits="auto",
        )
        st = ann_index_stats(spark, autop)
        assert st["params"]["cell_task_splits"] == "auto"
        cells = glob.glob(autop + "/seg-*/cell=*")
        assert cells and any(
            len(glob.glob(c + "/*.parquet")) > 1 for c in cells
        ), "auto did not split the hot cell"
        qs = emb.filter(k < 5).select("vec_id", "embedding")
        a = _rows(
            ann_index_topk(spark, plain, qs, k=5, nprobe=2)
            .select("query_id", "vec_id", "pq_score", "rank")
        )
        b = _rows(
            ann_index_topk(spark, autop, qs, k=5, nprobe=2)
            .select("query_id", "vec_id", "pq_score", "rank")
        )
        assert a == b
        # an add under the stored 'auto' re-measures ITS batch and
        # stays equivalent
        extra = emb.select((k + 10_000).alias("vec_id"), "embedding")
        ann_index_add(extra, autop)
        ann_index_add(extra, plain)
        a2 = _rows(
            ann_index_topk(spark, plain, qs, k=8, nprobe=2)
            .select("query_id", "vec_id", "pq_score", "rank")
        )
        b2 = _rows(
            ann_index_topk(spark, autop, qs, k=8, nprobe=2)
            .select("query_id", "vec_id", "pq_score", "rank")
        )
        assert a2 == b2
    finally:
        spark.conf.set(coalesce_key, prev)

    with pytest.raises(ValueError, match="cell_task_splits"):
        ann_index_build(
            emb.select("vec_id", "embedding"), str(tmp_path / "bad2"),
            cell_task_splits="many",
        )


def test_cached_for_auto_caches_only_auto(spark):
    """'auto' ingests measure skew AND write from one cached
    evaluation of the batch lineage (the encode/tokenize pass is the
    expensive part); an int split passes through uncached, and the
    cache never outlives the context."""
    from parq_tools_spark.operators._index_common import cached_for_auto

    df = spark.range(10)
    with cached_for_auto(df, "auto") as c:
        assert c is df
        assert df.storageLevel.useMemory or df.storageLevel.useDisk
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
    with cached_for_auto(df, 4) as c:
        assert c is df
        assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
