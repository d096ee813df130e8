"""StateFS (sources/statefs.py): the Hadoop-FileSystem-backed
primitives every state protocol (rollups, CDC, MinHash index,
streaming markers) commits through. Exercised via the ``file:``
scheme — the same code path resolves ``hdfs:``/``s3a:`` on a cluster.
"""

import os

import pytest
from pyspark.sql import functions as F

from parq_tools_spark.sources.statefs import StateFS


def test_roundtrip_and_qualify(spark, tmp_path):
    d = str(tmp_path)
    fs = StateFS(spark, d)
    assert fs.scheme == "file" and not fs.is_object_store
    assert fs.qualify(d).startswith("file:")
    fs.write_text(f"{d}/m.json", '{"v": 1}')
    assert fs.read_text(f"{d}/m.json") == '{"v": 1}'
    # overwrite goes through tmp+rename: no partial state, new content
    fs.write_text(f"{d}/m.json", '{"v": 2}')
    assert fs.read_text(f"{d}/m.json") == '{"v": 2}'
    # no tmp litter left behind
    assert [n for n, _, _ in fs.list_status(d)] == ["m.json"]


def test_list_files_skips_hidden_and_is_relative(spark, tmp_path):
    d = str(tmp_path)
    fs = StateFS(spark, d)
    spark.range(3).coalesce(1).write.parquet(f"{d}/sub/t")
    fs.write_text(f"{d}/_manifest.json", "{}")
    fs.write_text(f"{d}/.marker", "x")
    files = fs.list_files(d)
    assert files and all(f.startswith("sub/t/") for f in files)
    assert all(f.endswith(".parquet") for f in files)
    # _SUCCESS, _manifest.json, .marker, .crc: all hidden to discovery
    assert not any("_" in f.split("/")[-1][:1] for f in files)


def test_rename_and_delete_semantics(spark, tmp_path):
    d = str(tmp_path)
    fs = StateFS(spark, d)
    fs.mkdirs(f"{d}/a/deep")
    fs.write_text(f"{d}/a/deep/f.txt", "x")
    fs.rename(f"{d}/a", f"{d}/b")
    assert fs.exists(f"{d}/b/deep/f.txt") and not fs.exists(f"{d}/a")
    # Hadoop signals rename failure by returning false -> we raise
    with pytest.raises(IOError, match="rename failed"):
        fs.rename(f"{d}/missing", f"{d}/c")
    assert fs.delete(f"{d}/b") is True  # recursive
    assert fs.delete(f"{d}/b") is False  # already gone
    assert not fs.exists(f"{d}/b")


def test_create_exclusive_enforces_single_writer(spark, tmp_path):
    """Two writers racing to create the same file: exactly one wins;
    the loser raises FileExistsError and the winner's content is
    untouched (the mutual-exclusion primitive VersionedState commits
    through)."""
    d = str(tmp_path)
    fs = StateFS(spark, d)
    p = f"{d}/commit.marker"
    fs.create_exclusive(p, "winner")
    with pytest.raises(FileExistsError, match="exists"):
        fs.create_exclusive(p, "loser")
    assert fs.read_text(p) == "winner"


def test_versioned_commit_is_exclusive(spark, tmp_path):
    """Committing an already-committed version fails loudly instead of
    silently replacing the winner's marker."""
    from parq_tools_spark.sources.statefs import VersionedState

    vs = VersionedState(spark, str(tmp_path / "state"), "_m.json")
    vs.fs.mkdirs(vs.version_dir(1))
    vs.commit(1, '{"who": "A"}')
    with pytest.raises(FileExistsError):
        vs.commit(1, '{"who": "B"}')
    assert vs.current() == 1
    assert vs.read_marker(1) == '{"who": "A"}'


def test_concurrent_folds_exactly_one_commits(spark, tmp_path):
    """Interleave two incremental_aggregate folds of the SAME new
    batch: the one that commits second raises FileExistsError (no
    silent fold loss), the surviving state equals one flat GROUP BY,
    and a retry of the loser is a clean no-op on the winner's state."""
    import json

    import parq_tools_spark.sources.statefs as sfs
    from parq_tools_spark.operators.incremental_agg import (
        incremental_aggregate,
    )

    inp = str(tmp_path / "in")
    state_path = str(tmp_path / "state")
    keys, measures = ["k"], [("sum", "v")]
    df = spark.range(100).selectExpr("id % 7 AS k", "id AS v")
    df.filter("v % 2 = 0").write.parquet(f"{inp}/b0")
    incremental_aggregate(spark, inp, state_path, keys, measures)
    df.filter("v % 2 = 1").write.parquet(f"{inp}/b1")

    real_commit = sfs.VersionedState.commit
    fired = []

    def racing_commit(self, n, text):
        if not fired and n == 2:
            fired.append(n)
            # the competing fold of the same files wins the race first
            incremental_aggregate(spark, inp, state_path, keys, measures)
        return real_commit(self, n, text)

    sfs.VersionedState.commit = racing_commit
    try:
        with pytest.raises(FileExistsError):
            incremental_aggregate(spark, inp, state_path, keys, measures)
    finally:
        sfs.VersionedState.commit = real_commit

    # winner's state == flat GROUP BY over everything ever ingested
    got = {
        (r["k"], r["v_sum"], r["n_rows"])
        for r in incremental_aggregate(
            spark, inp, state_path, keys, measures
        ).collect()
    }
    want = {
        (r["k"], r["v_sum"], r["n_rows"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("v_sum"), F.count("*").alias("n_rows"))
        .collect()
    }
    assert got == want
    # the winner's manifest names every input part file exactly once
    vs = sfs.VersionedState(spark, state_path, "_manifest.json")
    m = json.loads(vs.read_marker(vs.current()))
    on_disk = sfs.StateFS(spark, inp).list_files(inp)
    assert sorted(m["files"]) == sorted(on_disk)
    assert len(m["files"]) == len(set(m["files"]))


def test_write_text_survives_concurrent_read_of_old(spark, tmp_path):
    """The committed file is replaced in one rename: a reader holding
    the old content sees it in full; the path never dangles for a
    reader that re-opens (modulo the instant of rename itself)."""
    d = str(tmp_path)
    fs = StateFS(spark, d)
    p = f"{d}/state.json"
    fs.write_text(p, "old")
    before = open(p).read()
    fs.write_text(p, "new")
    assert before == "old" and open(p).read() == "new"
    assert os.path.exists(p)
