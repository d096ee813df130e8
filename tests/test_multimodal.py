"""Multimodal plumbing tests (schema, partitioning, UDF batch shapes)."""

import pytest

from pyspark.sql import functions as F

from parq_tools_spark.operators.multimodal import (
    attach_media_metadata,
    decode_stub,
    extract_features,
    repartition_by_bytes,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [(i, bytes([i % 256]) * (100 * (i + 1))) for i in range(10)]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    return attach_media_metadata(df, modality="video").withColumn(
        "meta",
        F.col("meta").withField("duration_ms", F.lit(3000).cast("long")),
    )


def test_metadata_struct(media):
    row = media.filter("media_id = 4").collect()[0]
    assert row.meta.modality == "video"
    assert row.meta.n_bytes == 500
    assert row.meta.width is None


def test_metadata_filter_prunes_before_decode(media):
    small = media.filter(F.col("meta.n_bytes") < 300)
    assert small.count() == 2


def test_extract_features_deterministic(media):
    out = extract_features(media).collect()
    assert len(out) == 10
    by_id = {r.media_id: r for r in out}
    assert by_id[3].n_bytes == 400
    # deterministic stub: same blob -> same features, stable across runs
    blob = bytes([3 % 256]) * 400
    assert by_id[3].features == pytest.approx(decode_stub(blob)[:8].tolist())
    assert all(len(r.features) == 8 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r.features)


def test_sample_frames_fan_out(media):
    frames = sample_frames(media, every_ms=1000)
    out = frames.collect()
    # 3000ms / 1000ms = 3 frames per video, 10 videos
    assert len(out) == 30
    one = [r for r in out if r.media_id == 2]
    assert [r.frame_idx for r in sorted(one, key=lambda r: r.frame_idx)] == [0, 1, 2]
    assert [r.ts_ms for r in sorted(one, key=lambda r: r.frame_idx)] == [0, 1000, 2000]
    assert all(len(r.frame_blob) == 16 for r in out)


def test_repartition_by_bytes(media):
    # in-memory frame: no parquet lineage -> aggregation-scan fallback
    out = repartition_by_bytes(media, target_bytes_per_partition=1000)
    # total bytes = 100*(1+..+10) = 5500 -> ~6 partitions
    assert out.rdd.getNumPartitions() >= 5


def test_repartition_by_bytes_uses_footer_metadata(spark, media, tmp_path):
    """Parquet-backed frames must size partitions from footer stats
    (no data scan), and the footer total must drive the count."""
    from parq_tools_spark.operators.multimodal import _blob_bytes_from_footers

    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    df = spark.read.parquet(path)

    footer_total = _blob_bytes_from_footers(df, "blob")
    assert footer_total is not None
    # footer uncompressed size covers the 5500 payload bytes (+ page
    # framing overhead, which only rounds the partition count up)
    assert footer_total >= 5500

    out = repartition_by_bytes(df, target_bytes_per_partition=1000)
    expect = max(1, footer_total // 1000 + 1)
    assert out.rdd.getNumPartitions() == expect

    # no parquet lineage after a non-file source -> footer probe is None
    assert _blob_bytes_from_footers(media, "blob") is None


def test_sample_frames_empty_blob_raises_cleanly(spark):
    df = spark.createDataFrame([(1, b"")], "media_id long, blob binary")
    df = attach_media_metadata(df, modality="video").withColumn(
        "meta", F.col("meta").withField("duration_ms", F.lit(1000).cast("long"))
    )
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_frames(df).collect()


def test_resize_media_plumbing(spark):
    import hashlib

    from parq_tools_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, b"imagebytes"), (2, b""), (3, None)], "media_id long, blob binary"
    )
    out = {r.media_id: r for r in resize_media(df, 64, 32).collect()}
    for mid, src in [(1, b"imagebytes"), (2, b""), (3, b"")]:
        want = hashlib.md5(src + b":64x32").hexdigest().encode()
        assert bytes(out[mid].blob) == want
        assert out[mid].width == 64 and out[mid].height == 32
        assert out[mid].n_bytes == 32

    # custom resize_fn is honored
    custom = resize_media(
        df, 8, 8, resize_fn=lambda b, w, h: (b or b"")[: w]
    ).collect()
    assert {bytes(r.blob) for r in custom} == {b"imagebyt", b""}
