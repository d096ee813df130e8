"""Deterministic sampling/split tests."""

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
)


def test_sample_is_deterministic_and_partition_independent(spark):
    df1 = spark.range(0, 10_000, 1, 2).withColumn("k", F.col("id").cast("string"))
    df32 = spark.range(0, 10_000, 1, 32).withColumn("k", F.col("id").cast("string"))
    s1 = sorted(r.id for r in deterministic_sample(df1, "k", 0.2).collect())
    s32 = sorted(r.id for r in deterministic_sample(df32, "k", 0.2).collect())
    assert s1 == s32  # same rows regardless of partitioning
    assert 0.15 < len(s1) / 10_000 < 0.25  # ~20%


def test_sample_fraction_bounds(spark):
    df = spark.range(10).withColumn("k", F.col("id").cast("string"))
    assert deterministic_sample(df, "k", 0.0).count() == 0
    assert deterministic_sample(df, "k", 1.0).count() == 10
    with pytest.raises(ValueError):
        deterministic_sample(df, "k", 1.5)


def test_hash_split_covers_all_rows_once(spark):
    df = spark.range(0, 5_000).withColumn("k", F.col("id").cast("string"))
    out = hash_split(df, "k", [0.7, 0.2, 0.1], names=["train", "val", "test"])
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 5_000
    assert 0.6 < counts["train"] / 5_000 < 0.8
    assert 0.14 < counts["val"] / 5_000 < 0.26
    assert 0.05 < counts["test"] / 5_000 < 0.16


def test_hash_split_same_key_same_split(spark):
    # duplicated keys must co-locate (no train/test leakage)
    df = spark.createDataFrame(
        [(i % 100, i) for i in range(1000)], "k int, row int"
    )
    out = hash_split(df, "k", [0.5, 0.5], names=["a", "b"])
    n_splits = (
        out.groupBy("k").agg(F.countDistinct("split").alias("n")).agg(F.max("n"))
    ).collect()[0][0]
    assert n_splits == 1


def test_hash_split_validation(spark):
    df = spark.range(10).withColumn("k", F.col("id").cast("string"))
    with pytest.raises(ValueError):
        hash_split(df, "k", [0.9, 0.9])
    with pytest.raises(ValueError):
        hash_split(df, "k", [0.5, 0.5], names=["only_one"])


def test_hash_bucket_matches_duckdb(spark):
    import duckdb

    df = spark.range(0, 50).withColumn("b", hash_bucket(F.col("id").cast("string")))
    got = {r.id: r.b for r in df.collect()}
    con = duckdb.connect()
    rows = con.execute(
        "SELECT i, CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) "
        "FROM range(50) t(i)"
    ).fetchall()
    assert got == {i: b for i, b in rows}


def test_null_keys_assigned_deterministically(spark):
    df = spark.createDataFrame([(None,), ("a",), ("b",)], "k string")
    out = hash_split(df, "k", [0.5, 0.5], names=["x", "y"])
    null_split = [r.split for r in out.collect() if r.k is None]
    assert len(null_split) == 1  # null row not dropped
    # sample keeps or drops the null row deterministically, never errors
    n1 = deterministic_sample(df, "k", 1.0).count()
    assert n1 == 3


def test_stratified_sample(spark, sf_dir):
    import os as _os

    from parq_tools_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang"
    )
    out = stratified_sample(
        docs, "lang", {"en": 0.5, "fr": 1.0}, key="doc_id"
    )
    pdf = out.toPandas()
    # unlisted strata are dropped entirely
    assert set(pdf.lang) <= {"en", "fr"}
    n_fr_total = docs.filter("lang = 'fr'").count()
    assert (pdf.lang == "fr").sum() == n_fr_total  # fraction 1.0 keeps all
    n_en_total = docs.filter("lang = 'en'").count()
    kept_en = (pdf.lang == "en").sum()
    assert 0 < kept_en < n_en_total
    # deterministic: same selection every run
    again = stratified_sample(docs, "lang", {"en": 0.5, "fr": 1.0}, key="doc_id")
    assert sorted(pdf.doc_id) == sorted(again.toPandas().doc_id)
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", {"en": 1.5}, key="doc_id")


def test_pack_token_shards(spark):
    from parq_tools_spark.operators.sampling import pack_token_shards

    df = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 250), (4, 10), (5, 90), (6, 40)],
        "doc_id long, n long",
    )
    got = {
        r.doc_id: r.shard
        for r in pack_token_shards(df, "n", budget=100).collect()
    }
    # exclusive prefix sums: 0, 60, 110, 360, 370, 460
    assert got == {1: 0, 2: 0, 3: 1, 4: 3, 5: 3, 6: 4}
    # order contract, not physical order: shuffling partitions is a no-op
    got2 = {
        r.doc_id: r.shard
        for r in pack_token_shards(
            df.repartition(5), "n", budget=100
        ).collect()
    }
    assert got2 == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        pack_token_shards(df, "n", budget=0)


def test_pack_token_shards_distributed_prefix_matches_local(spark):
    """The two-pass distributed prefix sum (range partitions + offset
    join) must equal a single-threaded local pack over many partitions
    worth of rows."""
    from parq_tools_spark.operators.sampling import pack_token_shards

    rows = [(i, (i * 37) % 90 + 10) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(13)
    got = {
        r.doc_id: r.shard
        for r in pack_token_shards(df, "n", budget=500).collect()
    }
    cum, want = 0, {}
    for i, n in rows:  # already in doc_id order
        want[i] = cum // 500
        cum += n
    assert got == want


def test_pack_token_shards_rejects_scratch_collisions(spark):
    from parq_tools_spark.operators.sampling import pack_token_shards

    df = spark.createDataFrame([(1, 5, 0)], "doc_id long, n long, __pts_pid int")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        pack_token_shards(df, "n", budget=10)


def test_pack_token_shards_validate_order_catches_ties(spark):
    """order_by must be a total order for the pack to be deterministic;
    validate_order=True fails fast on a duplicated key instead of
    assigning tied rows nondeterministically."""
    from parq_tools_spark.operators.sampling import pack_token_shards

    import pytest as _pytest

    tied = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "doc_id long, n long"
    )
    with _pytest.raises(ValueError, match="not a total order"):
        pack_token_shards(tied, "n", budget=100, validate_order=True)

    unique = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n long")
    got = {
        r.doc_id: r.shard
        for r in pack_token_shards(
            unique, "n", budget=100, validate_order=True
        ).collect()
    }
    assert got == {1: 0, 2: 0}


def test_mixture_sample_matches_target_proportions(spark):
    from parq_tools_spark.operators.sampling import mixture_sample

    rows = (
        [(i, "web") for i in range(1000)]
        + [(1000 + i, "books") for i in range(200)]
        + [(1200 + i, "code") for i in range(500)]
        + [(1700 + i, "junk") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_sample(
        df, "source", {"web": 0.5, "books": 0.3, "code": 0.2}, key="doc_id"
    )
    counts = {r["source"]: r["cnt"] for r in
              out.groupBy("source").agg(__import__("pyspark").sql.functions
                                        .count("*").alias("cnt")).collect()}
    # books binds: 200/0.3 -> scale 666.67; targets 333/200/133
    assert counts["books"] == 200  # binding source kept whole
    assert abs(counts["web"] - 333) < 40  # hash-sampling tolerance
    assert abs(counts["code"] - 133) < 30
    assert "junk" not in counts  # unweighted source dropped
    # deterministic: identical second run
    again = mixture_sample(
        df, "source", {"web": 0.5, "books": 0.3, "code": 0.2}, key="doc_id"
    )
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in out.collect()
    )


def test_mixture_sample_validation(spark):
    import pytest as _pytest

    from parq_tools_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {}, key="doc_id")
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {"a": -0.1}, key="doc_id")
    with _pytest.raises(ValueError):
        mixture_sample(df, "source", {"absent": 1.0}, key="doc_id")


def test_weighted_sample_matches_reference_and_is_stable(spark):
    """Exact agreement with a numpy reference of the exponential-race
    formula; stability under repartitioning; without-replacement."""
    import hashlib
    import math as m

    import numpy as np

    from parq_tools_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def ref_score(key, w):
        bucket = int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)
        u = (bucket + 0.5) / 2**32
        return m.floor((-m.log(u) / w) * 1e9 + 0.5) / 1e9

    exp = sorted(((ref_score(i, w), i) for i, w in rows))[:25]
    got = [
        (r.sample_score, r.doc_id)
        for r in weighted_sample(df, "doc_id", "w", 25)
        .orderBy("sample_score", "doc_id")
        .collect()
    ]
    assert got == exp
    assert len({i for _, i in got}) == 25  # without replacement
    # partitioning-independent
    got2 = [
        (r.sample_score, r.doc_id)
        for r in weighted_sample(df.repartition(13), "doc_id", "w", 25)
        .orderBy("sample_score", "doc_id")
        .collect()
    ]
    assert got2 == got


def test_weighted_sample_weight_semantics(spark):
    """Proportionality direction: a huge-weight row virtually always
    wins; zero/NULL weights are excluded; n validation."""
    import pytest as _pytest

    from parq_tools_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0) for i in range(100)] + [
        (1000, 1e9),
        (1001, 0.0),
        (1002, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    picked = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    assert 1000 in picked  # weight 1e9 vs 1: p(miss) ~ 0
    assert 1001 not in picked and 1002 not in picked
    with _pytest.raises(ValueError, match="n must be positive"):
        weighted_sample(df, "doc_id", "w", 0)
