"""StateFS (sources/statefs.py): the Hadoop-FileSystem-backed
primitives every state protocol (rollups, CDC, MinHash index,
streaming markers) commits through. Exercised via the ``file:``
scheme — the same code path resolves ``hdfs:``/``s3a:`` on a cluster.
"""

import os

import pytest

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
