"""Similarity search tests (brute-force, LSH, IVF) on the embeddings table."""

import os

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicate_pairs,
    ivf_build,
    ivf_topk,
    lsh_topk,
    normalize_embeddings,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 3)


def test_brute_force_topk(embeddings, queries):
    out = brute_force_topk(embeddings, queries, k=5).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == {0, 1, 2}
    for qid, rows in by_query.items():
        assert len(rows) == 5
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        sims = [r.cosine_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != qid for r in rows)
        assert all(-1.0000001 <= r.cosine_sim <= 1.0000001 for r in rows)


def test_lsh_topk_recall_vs_brute(embeddings, queries):
    exact = brute_force_topk(embeddings, queries, k=5)
    approx = lsh_topk(embeddings, queries, k=5, n_planes=16, n_bands=8)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall_vs_brute(embeddings, queries):
    assigned, centroids = ivf_build(embeddings, n_cells=8)
    exact = brute_force_topk(embeddings, queries, k=5)
    approx = ivf_topk(assigned, centroids, queries, k=5, nprobe=4)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_normalize_embeddings(embeddings):
    normed = normalize_embeddings(embeddings.limit(10))
    norms = normed.select(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, v: acc + v * v
        ).alias("sq")
    ).collect()
    assert all(abs(r.sq - 1.0) < 1e-9 for r in norms)


def test_embedding_near_duplicate_pairs_finds_planted_dup(spark, embeddings):
    # plant an exact duplicate of vec 0 with id 9999
    dup = embeddings.filter("vec_id = 0").withColumn("vec_id", F.lit(9999).cast("long"))
    corpus = embeddings.unionByName(dup)
    pairs = embedding_near_duplicate_pairs(corpus, threshold=0.99)
    got = {(r.id1, r.id2) for r in pairs.collect()}
    assert (0, 9999) in got


def test_ivf_cell_layout_partition_pruning(spark, embeddings, tmp_path):
    """The IVF scale property the persisted ann index builds on: a
    cell-partitioned layout turns a probe's cell filter into
    PLANNING-time partition pruning (the former one-shot ivf_write
    layout — removed in favor of ann_index_build, see MIGRATION.md —
    asserted here directly on a partitionBy write)."""
    from parq_tools_spark.operators.similarity import ivf_build

    assigned, centroids = ivf_build(embeddings, n_cells=4)
    path = str(tmp_path / "ivf")
    assigned.write.partitionBy("cell").parquet(path)
    corpus = spark.read.parquet(path)
    assert corpus.count() == embeddings.count()
    probed = corpus.filter("cell IN (0, 1)")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # partition pruning reaches the scan: probing reads only those dirs
    assert "PartitionFilters" in plan and "cell" in plan


def test_ivf_rebalance_bounds_skewed_cells(spark, embeddings):
    """Property: on an adversarially skewed assignment (most of the
    corpus in one cell), rebalancing bounds every (cell, subcell)
    group near max_cell_rows, keeps cell membership bit-identical, and
    the split is deterministic (id-hash, not partitioning/RNG)."""
    from parq_tools_spark.operators.similarity import ivf_rebalance_subcells

    n = embeddings.count()
    # degenerate quantizer: ~90% of vectors land in cell 0
    skewed = embeddings.withColumn(
        "cell",
        F.when(F.col("vec_id") % 10 < 9, F.lit(0)).otherwise(F.lit(1)).cast("int"),
    )
    # cap above cell 1's ~10% share so only cell 0 is hot
    cap = max(1, n // 8)
    out = ivf_rebalance_subcells(skewed, max_cell_rows=cap)

    groups = out.groupBy("cell", "subcell").count().collect()
    biggest = max(r["count"] for r in groups)
    # hash split: strict in expectation, slack for hash variance
    assert biggest <= 1.5 * cap, f"sub-cell still skewed: {biggest} > 1.5*{cap}"
    # cold cell 1 keeps a single subcell 0
    assert {r["subcell"] for r in groups if r["cell"] == 1} == {0}
    # cell membership (search semantics) unchanged
    assert out.filter("cell = 0").count() == skewed.filter("cell = 0").count()
    # deterministic under re-partitioning
    a = {(r.vec_id, r.subcell) for r in out.collect()}
    b = {
        (r.vec_id, r.subcell)
        for r in ivf_rebalance_subcells(
            skewed.repartition(7), max_cell_rows=cap
        ).collect()
    }
    assert a == b


def test_rebalanced_layout_partitions_by_subcell(spark, embeddings, tmp_path):
    """A rebalanced frame writes (cell, subcell) directories; pruning
    on cell alone still reaches the scan — no skewed cell produces an
    unbounded directory while probes keep planning-time pruning."""
    from parq_tools_spark.operators.similarity import (
        ivf_build,
        ivf_rebalance_subcells,
    )

    assigned, centroids = ivf_build(embeddings, n_cells=4)
    n = assigned.count()
    rebal = ivf_rebalance_subcells(assigned, max_cell_rows=max(1, n // 8))
    path = str(tmp_path / "ivf_rebal")
    rebal.write.partitionBy("cell", "subcell").parquet(path)
    import glob

    assert glob.glob(path + "/cell=*/subcell=*"), "no subcell directories"
    corpus = spark.read.parquet(path)
    assert corpus.count() == n
    plan = (
        corpus.filter("cell IN (0, 1)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "cell" in plan


def test_dedupe_embedding_near_duplicates(spark, embeddings):
    from parq_tools_spark.operators.similarity import dedupe_embedding_near_duplicates

    dup = embeddings.filter("vec_id = 3").withColumn("vec_id", F.lit(77777).cast("long"))
    corpus = embeddings.unionByName(dup)
    out = dedupe_embedding_near_duplicates(corpus, threshold=0.999)
    ids = {r.vec_id for r in out.select("vec_id").collect()}
    assert 3 in ids and 77777 not in ids  # min id survives, planted dup dropped


def test_brute_force_pairs_blocked_matches_broadcast(embeddings):
    """The block-matrix all-pairs path must produce exactly the same
    (id1, id2, sim) set as the broadcast path, including with a block
    count small enough to force multi-block grid cells."""
    from parq_tools_spark.operators.similarity import (
        brute_force_pairs,
        brute_force_pairs_blocked,
    )

    # opt-in driver-broadcast fast path (max_driver_rows > 0)
    want = {
        (r.id1, r.id2, r.cosine_sim)
        for r in brute_force_pairs(
            embeddings, threshold=0.3, max_driver_rows=1_000_000
        ).collect()
    }
    got = {
        (r.id1, r.id2, r.cosine_sim)
        for r in brute_force_pairs_blocked(
            embeddings, threshold=0.3, n_blocks=4
        ).collect()
    }
    assert want == got
    assert len(got) > 0
    got1 = {
        (r.id1, r.id2, r.cosine_sim)
        for r in brute_force_pairs_blocked(
            embeddings, threshold=0.3, n_blocks=1
        ).collect()
    }
    assert want == got1


def test_brute_force_pairs_defaults_to_blocked(embeddings):
    """The default path must not collect the corpus to the driver: with
    no opt-in cap it routes to the blocked implementation; an opt-in
    cap smaller than the corpus also falls back to blocked. Both match
    the driver-broadcast fast path exactly."""
    from parq_tools_spark.operators.similarity import brute_force_pairs

    driver = {
        (r.id1, r.id2, r.cosine_sim)
        for r in brute_force_pairs(
            embeddings, threshold=0.3, max_driver_rows=1_000_000
        ).collect()
    }
    default = {
        (r.id1, r.id2, r.cosine_sim)
        for r in brute_force_pairs(embeddings, threshold=0.3).collect()
    }
    overflow = {
        (r.id1, r.id2, r.cosine_sim)
        for r in brute_force_pairs(
            embeddings, threshold=0.3, max_driver_rows=1
        ).collect()
    }
    assert default == driver
    assert overflow == driver


def test_ivf_hashseed_topk_deterministic_and_sane(embeddings):
    from parq_tools_spark.operators.similarity import (
        brute_force_topk,
        ivf_hashseed_topk,
    )

    queries = embeddings.filter("vec_id < 2")
    a = {(r.query_id, r.vec_id) for r in ivf_hashseed_topk(
        embeddings, queries, k=5, n_cells=4, nprobe=2).collect()}
    b = {(r.query_id, r.vec_id) for r in ivf_hashseed_topk(
        embeddings, queries, k=5, n_cells=4, nprobe=2).collect()}
    assert a == b and len(a) > 0  # deterministic, no RNG state
    # full probe == brute force exactly (candidate set = whole corpus)
    full = {(r.query_id, r.vec_id) for r in ivf_hashseed_topk(
        embeddings, queries, k=5, n_cells=4, nprobe=4).collect()}
    bf = {(r.query_id, r.vec_id) for r in brute_force_topk(
        embeddings, queries, k=5).collect()}
    assert full == bf


# ------------------------------------------------------------------- PQ
def test_pq_identity_codebook_equals_brute_force(embeddings, queries):
    from parq_tools_spark.operators.similarity import pq_build, pq_topk

    codes, cbs = pq_build(embeddings, m=8, n_codes=None)
    pq = pq_topk(codes, cbs, queries, k=5)
    bf = brute_force_topk(embeddings, queries, k=5)
    p = {(r.query_id, r.vec_id) for r in pq.collect()}
    b = {(r.query_id, r.vec_id) for r in bf.collect()}
    assert p == b
    # rounded ADC scores equal rounded cosine under lossless encoding
    import math

    pqs = {(r.query_id, r.vec_id): r.pq_score for r in pq.collect()}
    bfs = {
        (r.query_id, r.vec_id): math.floor(r.cosine_sim * 1e6 + 0.5) / 1e6
        for r in bf.collect()
    }
    assert pqs == bfs


def test_pq_codes_shape_and_determinism(embeddings):
    from parq_tools_spark.operators.similarity import pq_build

    codes1, cb1 = pq_build(embeddings, m=8, n_codes=16)
    codes2, cb2 = pq_build(embeddings, m=8, n_codes=16)
    assert cb1.shape == (8, 16, 8)
    assert (cb1 == cb2).all()
    r1 = {r.vec_id: tuple(r.codes) for r in codes1.collect()}
    r2 = {r.vec_id: tuple(r.codes) for r in codes2.collect()}
    assert r1 == r2
    assert all(len(c) == 8 for c in r1.values())
    assert all(0 <= x < 16 for c in r1.values() for x in c)


def test_pq_rejects_indivisible_dim(embeddings):
    from parq_tools_spark.operators.similarity import pq_build

    with pytest.raises(ValueError):
        pq_build(embeddings, m=7)


def test_pq_topk_k_bound(embeddings, queries):
    from parq_tools_spark.operators.similarity import pq_build, pq_topk

    codes, cbs = pq_build(embeddings, m=8, n_codes=16)
    out = pq_topk(codes, cbs, queries, k=3)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in counts)


# -------------------------------------------------------- semantic dedup
def test_semantic_dedupe_drop_rule(spark):
    from parq_tools_spark.operators.similarity import semantic_dedupe

    # two exact duplicates + one orthogonal vector; only the
    # lower-id duplicate survives
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(r.vec_id for r in semantic_dedupe(df, threshold=0.95, n_cells=2).collect())
    assert 0 in out and 1 not in out and 2 in out


def test_semantic_dedupe_threshold_monotone(embeddings):
    from parq_tools_spark.operators.similarity import semantic_dedupe

    n = embeddings.count()
    hi = semantic_dedupe(embeddings, threshold=0.99, n_cells=8).count()
    lo = semantic_dedupe(embeddings, threshold=0.30, n_cells=8).count()
    assert lo <= hi <= n
    # survivors are a subset of the corpus and keep full rows
    out = semantic_dedupe(embeddings, threshold=0.30, n_cells=8)
    assert out.columns == embeddings.columns


def test_ivf_pq_full_probe_identity_equals_brute_force(embeddings, queries):
    from parq_tools_spark.operators.similarity import ivf_pq_topk

    ivfpq = ivf_pq_topk(
        embeddings, queries, k=5, n_cells=8, nprobe=8, m=8, n_codes=None
    )
    bf = brute_force_topk(embeddings, queries, k=5)
    a = {(r.query_id, r.vec_id) for r in ivfpq.collect()}
    b = {(r.query_id, r.vec_id) for r in bf.collect()}
    assert a == b


def test_ivf_pq_prunes_to_probed_cells(embeddings, queries):
    from parq_tools_spark.operators.similarity import (
        _hashseed_rows,
        _with_centroid_cells,
        ivf_pq_topk,
    )
    from pyspark.sql import functions as F

    out = ivf_pq_topk(
        embeddings, queries, k=5, n_cells=8, nprobe=2, m=8, n_codes=16
    )
    counts = out.groupBy("query_id").count().collect()
    assert len(counts) == 3 and all(r["count"] == 5 for r in counts)
    # every hit must live in one of its query's 2 probed cells
    cents = _hashseed_rows(embeddings, 8, "vec_id", "embedding")
    assigned = _with_centroid_cells(
        embeddings.select("vec_id", "embedding"), cents, "embedding", 6, None, "cell"
    ).select("vec_id", "cell")
    probes = (
        _with_centroid_cells(
            embeddings.filter(F.col("vec_id") < 3).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("_qvec"),
            ),
            cents, "_qvec", 6, 2, "_probe",
        )
        .select("query_id", F.explode("_probe").alias("cell"))
    )
    bad = (
        out.join(assigned, "vec_id")
        .join(probes, ["query_id", "cell"], "left_semi")
        .count()
    )
    assert bad == out.count()


def test_lsh_signatures_rejects_null_and_ragged_vectors(spark):
    """Null or wrong-length embedding rows must fail with a clear
    error naming the offending rows, not an opaque np.stack crash."""
    from parq_tools_spark.operators.similarity import lsh_signatures

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, None), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="null or wrong-length"):
        lsh_signatures(df, "embedding", n_planes=8, dim=3).collect()

    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (7, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="null or wrong-length"):
        lsh_signatures(ragged, "embedding", n_planes=8, dim=3).collect()

    # clean input still works
    clean = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [-1.0, 0.5, 2.0])],
        "vec_id long, embedding array<double>",
    )
    out = lsh_signatures(clean, "embedding", n_planes=8, dim=3).collect()
    assert len(out) == 2 and all(r.lsh_sig is not None for r in out)


# ------------------------------------------------------------- OPQ
def _imbalanced_embeddings(spark, n=200, dim=16, seed=11):
    """Energy concentrated in the first PQ subspace: the case plain
    contiguous-split PQ handles worst and OPQ exists to fix."""
    import numpy as np

    rng = np.random.RandomState(seed)
    scales = np.ones(dim) * 0.05
    scales[: dim // 4] = 1.0  # first quarter holds ~all the variance
    mat = rng.randn(n, dim) * scales
    mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_opq_rotation_is_orthogonal_and_deterministic(spark):
    import numpy as np

    from parq_tools_spark.operators.similarity import opq_rotation

    emb = _imbalanced_embeddings(spark)
    r1 = opq_rotation(emb, m=4, sample=64)
    r2 = opq_rotation(emb, m=4, sample=64)
    np.testing.assert_array_equal(r1, r2)  # closed-form seeding
    np.testing.assert_allclose(r1 @ r1.T, np.eye(r1.shape[0]), atol=1e-9)


def test_opq_lossless_codebook_equals_brute_force(spark):
    """Any orthogonal rotation + identity codebook = exact scores:
    the invariant the ann_opq_exact_equiv registry gate runs on the
    real embeddings table, here on the adversarial fixture."""
    from parq_tools_spark.operators.similarity import (
        brute_force_topk,
        opq_rotation,
        pq_build,
        pq_topk,
    )

    emb = _imbalanced_embeddings(spark, n=60)
    rot = opq_rotation(emb, m=4, sample=32)
    codes, cbs = pq_build(emb, m=4, n_codes=None, rotation=rot)
    qs = emb.filter("vec_id < 3")
    pq = {
        (r.query_id, r.rank): r.vec_id
        for r in pq_topk(codes, cbs, qs, k=5, rotation=rot).collect()
    }
    bf = {
        (r.query_id, r.rank): r.vec_id
        for r in brute_force_topk(emb, qs, k=5).collect()
    }
    assert pq == bf and len(pq) == 15


def test_opq_composes_with_ivfpq(spark):
    """rotation= threads through the layered IVF-PQ index: degenerate
    configuration (full probe + lossless codebook) stays exactly equal
    to brute force under any orthogonal rotation (the
    ann_opq_ivfpq_equiv registry gate's invariant), and a REAL
    configuration still returns k well-formed rows per query."""
    from parq_tools_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_topk,
        opq_rotation,
    )

    emb = _imbalanced_embeddings(spark, n=60)
    rot = opq_rotation(emb, m=4, sample=32)
    qs = emb.filter("vec_id < 3")
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_pq_topk(
            emb, qs, k=5, n_cells=4, nprobe=4, m=4, n_codes=None,
            rotation=rot,
        ).collect()
    }
    bf = {
        (r.query_id, r.rank): r.vec_id
        for r in brute_force_topk(emb, qs, k=5).collect()
    }
    assert got == bf and len(got) == 15

    real = ivf_pq_topk(
        emb, qs, k=5, n_cells=4, nprobe=2, m=4, n_codes=8, rotation=rot
    ).collect()
    assert len(real) == 15
    assert all(r.pq_score is not None and r.rank <= 5 for r in real)


def test_opq_improves_recall_on_imbalanced_data(spark):
    """With a small real codebook on variance-concentrated data, the
    rotated quantizer must recall at least as many true neighbors as
    plain PQ — the reason OPQ exists (Ge et al. 2014)."""
    from parq_tools_spark.operators.similarity import (
        brute_force_topk,
        opq_rotation,
        pq_build,
        pq_topk,
    )

    emb = _imbalanced_embeddings(spark, n=200, dim=16)
    qs = emb.filter("vec_id < 8")
    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, qs, k=10).collect()
    }

    def recall(rotation):
        codes, cbs = pq_build(emb, m=4, n_codes=32, rotation=rotation)
        got = {
            (r.query_id, r.vec_id)
            for r in pq_topk(codes, cbs, qs, k=10, rotation=rotation).collect()
        }
        return len(got & truth) / len(truth)

    plain = recall(None)
    rotated = recall(opq_rotation(emb, m=4, sample=128))
    # measured: plain ~0.53, rotated ~0.84 — the allocation must beat
    # the unrotated split OUTRIGHT on the data it exists for (a
    # regression to contiguous fill shows up as rotated == plain-ish)
    assert rotated > plain
    assert rotated > 0.7


def test_pq_encode_with_cells_matches_separate_passes(spark, embeddings):
    """The fused encode+assign kernel (one mapInPandas pass, the ANN
    index's ingest shape) must be BIT-IDENTICAL to pq_encode joined
    with _with_centroid_cells — the shared-arithmetic contract that
    keeps the persisted index equal to the per-call scan paths. The
    fused plan reads the corpus once and contains no join."""
    from parq_tools_spark.operators.similarity import (
        _hashseed_rows,
        _with_centroid_cells,
        pq_codebooks,
        pq_encode,
        pq_encode_with_cells,
    )

    cents = _hashseed_rows(embeddings, 4, "vec_id", "embedding")
    cbs = pq_codebooks(embeddings, m=4, n_codes=8)
    fused = pq_encode_with_cells(
        embeddings, cents, cbs, id_col="vec_id", vec_col="embedding",
        keep_vec=True,
    )
    sep = pq_encode(embeddings, cbs, id_col="vec_id").join(
        _with_centroid_cells(
            embeddings.select("vec_id", "embedding"),
            cents,
            "embedding",
            6,
            None,
            "cell",
        ).select("vec_id", "cell"),
        on="vec_id",
    )
    got = sorted(
        (r.vec_id, tuple(r.codes), r.cell) for r in fused.collect()
    )
    want = sorted(
        (r.vec_id, tuple(r.codes), r.cell) for r in sep.collect()
    )
    assert got == want and len(got) == embeddings.count()
    # stored vectors round-trip exactly
    one = fused.first()
    src = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in embeddings.collect()
    }
    assert one.vec == src[one.vec_id]

    import re

    plan = fused._sc._jvm.PythonSQLUtils.explainString(
        fused._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan
    # exactly one leaf source in the plan TREE (node ids are unique;
    # the details section repeats names, so count tree nodes)
    leaves = re.findall(
        r"(?:Scan parquet|InMemoryTableScan) \(\d+\)", plan
    )
    assert len(set(leaves)) == 1, leaves
