"""Persisted SimHash band index (operators/simhash_index.py): batch-
path equivalence, the shared versioned-manifest lifecycle (add /
delete / upsert / CDC / compact / time-travel), and validation."""

import os

import pytest
from pyspark.sql import functions as F

from parq_tools_spark.operators.simhash_index import (
    simhash_index_add,
    simhash_index_apply_cdc,
    simhash_index_compact,
    simhash_index_delete,
    simhash_index_query,
    simhash_index_stats,
    simhash_index_upsert,
    simhash_index_write,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .cache()
    )


def _pairs(df):
    return sorted(
        (r.id_indexed, r.id_new, r.hamming) for r in df.collect()
    )


def test_index_query_equals_batch_path(spark, docs, tmp_path):
    """The gate: index-served cross pairs EQUAL hamming_pairs over
    the union restricted to (corpus, batch) pairs — same fingerprints,
    same bands, same verification."""
    from parq_tools_spark.operators.dedup import hamming_pairs, simhash

    corpus = docs.filter("doc_id % 2 = 0")
    batch = docs.filter("doc_id % 2 = 1")
    path = str(tmp_path / "shidx")
    simhash_index_write(corpus, path)
    got = _pairs(simhash_index_query(spark, path, batch, max_hamming=3))

    fps = simhash(docs, "doc_id", "text")
    all_pairs = hamming_pairs(fps, "simhash", "doc_id", max_hamming=3)
    want = sorted(
        [
            (r.id1, r.id2, r.hamming)
            if r.id1 % 2 == 0
            else (r.id2, r.id1, r.hamming)
            for r in all_pairs.collect()
            if (r.id1 % 2) != (r.id2 % 2)
        ]
    )
    assert got == want


def test_lifecycle_add_delete_upsert_compact(spark, tmp_path):
    base = [(i, f"alpha beta gamma delta token{i}") for i in range(6)]
    near = "alpha beta gamma delta token0"  # ~doc 0's text
    spark_docs = spark.createDataFrame(base, "doc_id long, text string")
    path = str(tmp_path / "shidx")
    # keep_versions=4: the time-travel read below needs the
    # pre-delete version to survive the maintenance sweeps
    simhash_index_write(spark_docs, path, n_bands=8, keep_versions=4)

    probe = spark.createDataFrame(
        [(100, near)], "doc_id long, text string"
    )
    hits = simhash_index_query(spark, path, probe, max_hamming=4)
    assert 0 in {r.id_indexed for r in hits.collect()}

    # add a batch; its docs become visible
    extra = spark.createDataFrame(
        [(10, near)], "doc_id long, text string"
    )
    simhash_index_add(extra, path)
    assert 10 in {
        r.id_indexed
        for r in simhash_index_query(
            spark, path, probe, max_hamming=4
        ).collect()
    }

    # delete doc 0: its band rows disappear from serving; time-travel
    # still sees them
    v_before = simhash_index_stats(spark, path)["version"]
    simhash_index_delete(spark, path, [0])
    now = {
        r.id_indexed
        for r in simhash_index_query(
            spark, path, probe, max_hamming=4
        ).collect()
    }
    assert 0 not in now and 10 in now
    with pytest.raises(ValueError, match="not visible"):
        simhash_index_delete(spark, path, [0])
    old = {
        r.id_indexed
        for r in simhash_index_query(
            spark, path, probe, max_hamming=4, version=v_before
        ).collect()
    }
    assert 0 in old

    # upsert: replace doc 10's text; re-add tombstoned id 0
    res = simhash_index_upsert(
        spark.createDataFrame(
            [(10, "totally different content here now"), (0, near)],
            "doc_id long, text string",
        ),
        path,
    )
    assert res["updated"] == 1 and res["inserted"] == 1
    after = {
        r.id_indexed
        for r in simhash_index_query(
            spark, path, probe, max_hamming=4
        ).collect()
    }
    assert 0 in after and 10 not in after

    # compaction folds tombstones; results bit-identical
    pre = _pairs(simhash_index_query(spark, path, probe, max_hamming=4))
    simhash_index_compact(spark, path, min_files_per_band=1)
    assert (
        simhash_index_stats(spark, path)["pending_delete_batches"] == 0
    )
    post = _pairs(simhash_index_query(spark, path, probe, max_hamming=4))
    assert post == pre


def test_apply_cdc(spark, tmp_path):
    txt = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(1, txt), (2, "unrelated words entirely")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "shidx")
    simhash_index_write(docs, path, n_bands=8)
    changes = spark.createDataFrame(
        [
            (1, "D", None),
            (3, "I", txt),
            (99, "D", None),  # no-op: never indexed
        ],
        "doc_id long, op string, text string",
    )
    res = simhash_index_apply_cdc(spark, path, changes)
    assert res["deleted"] == 1 and res["delete_noops"] == 1
    assert res["inserted"] == 1
    probe = spark.createDataFrame([(100, txt)], "doc_id long, text string")
    hits = {
        r.id_indexed
        for r in simhash_index_query(
            spark, path, probe, max_hamming=4
        ).collect()
    }
    assert hits == {3}


def test_validation(spark, docs, tmp_path):
    path = str(tmp_path / "shidx")
    with pytest.raises(ValueError, match="no committed simhash index"):
        simhash_index_query(spark, path, docs)
    simhash_index_write(docs.limit(10), path, n_bands=4)
    with pytest.raises(ValueError, match="max_hamming.*n_bands"):
        simhash_index_query(spark, path, docs, max_hamming=4)
    with pytest.raises(ValueError, match="keep_versions"):
        simhash_index_write(docs, str(tmp_path / "x"), keep_versions=0)


def test_band_param_validation(spark, docs, tmp_path):
    """n_bands beyond the fingerprint width would make the high
    bands constant-zero keys (every doc pairs with every doc) and
    the pigeonhole check vacuous — rejected at write time."""
    for bad in ({"n_bands": 64}, {"n_bands": 0}, {"bits": 0},
                {"bits": 64}, {"bits": 8, "n_bands": 9}):
        with pytest.raises(ValueError):
            simhash_index_write(
                docs.limit(5), str(tmp_path / "bad"), **bad
            )


def test_exclude_same_id_type_guard(spark, docs, tmp_path):
    """A string-id batch against a long-id index must fail loudly up
    front (the predicate would otherwise null-drop every candidate
    under non-ANSI or throw mid-job under ANSI)."""
    path = str(tmp_path / "shidx")
    simhash_index_write(docs.limit(10), path, n_bands=4)
    stringy = docs.limit(5).withColumn(
        "doc_id", F.format_string("d%s", F.col("doc_id"))
    )
    with pytest.raises(ValueError, match="exclude_same_id"):
        simhash_index_query(spark, path, stringy)
    # disabling the exclusion skips the incompatible predicate
    simhash_index_query(
        spark, path, stringy, exclude_same_id=False
    ).collect()
