"""Multimodal (image/audio/video) column plumbing (beyond-reference).

Media travels as an opaque ``binary`` column plus a typed metadata
struct — the schema, partition discipline, Arrow batch shapes and UDF
signatures are real and tested. The decode step resolves per blob at
runtime (``operators/codecs.py``): PIL/ffmpeg when importable, else
the pure-numpy PNG/BMP/WAV/GIF/JPEG (baseline AND progressive) and
video-container (AVI MJPEG/DIB, Y4M — ``operators/video.py``)
decoders (always available), else the deterministic sha256 stub for
formats nothing here can decode (inter-frame codecs like H.264/VP9 —
ffmpeg genuinely required). Swap ``decode_fn`` for your own decoder
and nothing else changes.

Design for 100 TB of media:

- blobs stay in executor space end-to-end (``mapInPandas`` streams
  Arrow batches; nothing collects to the driver);
- metadata filters (modality/size/dims) prune *before* any decode —
  they are plain columns, so pushdown applies;
- decode parallelism = partitions; ``repartition`` by byte-size
  budget, not row count, for even work (helper below).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_metadata_schema",
    "attach_media_metadata",
    "repartition_by_bytes",
    "extract_features",
    "resize_media",
    "sample_frames",
    "decode_stub",
    "with_image_phash",
    "image_near_duplicate_pairs",
    "resample_audio",
]

media_metadata_schema = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png, wav, mp4, ...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType()),
        T.StructField("meta", media_metadata_schema),
    ]
)


def attach_media_metadata(
    df: DataFrame,
    blob_col: str = "blob",
    modality: str = "image",
    fmt: str = "bin",
    probe: bool = False,
) -> DataFrame:
    """Build the typed metadata struct from the blob.

    Default: n_bytes real, dims/duration null (zero decode cost, pure
    column exprs). ``probe=True`` parses each blob's HEADER in a
    ``mapInPandas`` pass — magic bytes, PNG IHDR / BMP header / WAV
    fmt chunk, a few dozen bytes per blob, no pixel decode — and
    fills modality/format/width/height/duration_ms with real values
    (falling back to the passed defaults for unknown formats).
    """
    if not probe:
        return df.withColumn(
            "meta",
            F.struct(
                F.lit(modality).alias("modality"),
                F.lit(fmt).alias("format"),
                F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        )

    cols = df.columns
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("meta", media_metadata_schema)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parq_tools_spark.operators.codecs import probe_media_header

        for pdf in batches:
            metas = []
            for blob in pdf[blob_col]:
                h = probe_media_header(blob)
                metas.append(
                    {
                        "modality": h["modality"] if h else modality,
                        "format": h["format"] if h else fmt,
                        "n_bytes": len(blob or b""),
                        "width": h["width"] if h else None,
                        "height": h["height"] if h else None,
                        "duration_ms": h["duration_ms"] if h else None,
                    }
                )
            out = pdf[cols].copy()
            out["meta"] = metas
            yield out

    return df.mapInPandas(run, schema=out_schema)


def repartition_by_bytes(
    df: DataFrame,
    target_bytes_per_partition: int = 128 << 20,
    blob_col: str = "blob",
    selectivity: float = 1.0,
    total_bytes: Optional[int] = None,
) -> DataFrame:
    """Partition media so each task decodes ~equal bytes, not rows.

    Media rows are wildly skewed in size; row-count partitioning gives
    straggler tasks. Total blob bytes come from Parquet footer
    row-group statistics over the frame's input files (O(#files)
    metadata reads — no data scan; at 100 TB a full pass over every
    blob byte just to pick a partition count would double the job).

    The footer total covers the FULL input files, so with a filtered
    frame it is an upper bound — harmless for a mild filter (AQE
    coalesces modest excess), but a 1% filter over 100 TB would
    provision ~100x the partitions needed. Two escape hatches:
    ``selectivity`` scales the footer estimate by the caller's known
    keep-fraction, and ``total_bytes`` skips estimation entirely when
    the caller already knows the byte total. Frames with no parquet
    lineage (in-memory test data) fall back to one aggregation scan
    (exact, so ``selectivity`` does not apply to it).
    """
    if not 0.0 < selectivity <= 1.0:
        raise ValueError("selectivity must be in (0, 1]")
    if total_bytes is None:
        total_bytes = _blob_bytes_from_footers(df, blob_col)
        if total_bytes is not None:
            total_bytes = int(total_bytes * selectivity)
    if total_bytes is None:
        total_bytes = df.agg(F.sum(F.length(F.col(blob_col)))).collect()[0][0] or 0
    n = max(1, int(total_bytes // target_bytes_per_partition) + 1)
    return df.repartition(n)


def _blob_bytes_from_footers(df: DataFrame, blob_col: str):
    """Uncompressed byte total of ``blob_col`` from the footers of the
    frame's input files; None when the frame has no parquet lineage or
    the footers don't carry the column (then the caller must scan)."""
    from parq_tools_spark.operators.memory import compressed_column_sizes

    files = [f for f in df.inputFiles() if f.endswith(".parquet")]
    if not files:
        return None
    try:
        sizes = compressed_column_sizes(files)
    except Exception:
        return None
    entry = sizes.get(blob_col)
    return entry["uncompressed_bytes"] if entry else None


def decode_stub(blob: bytes) -> np.ndarray:
    """Deterministic fake decoder: blob -> 8-dim float feature.

    The LAST-RESORT tier of the decode ladder (after PIL and the pure
    PNG/BMP/WAV decoders in ``operators/codecs.py``), used for blobs
    nothing in the environment can decode. Derives features from the
    sha256 digest so results are stable across runs/engines.
    """
    digest = hashlib.sha256(blob or b"").digest()
    return np.frombuffer(digest[:32], dtype=np.uint32).astype(np.float64) / 2**32


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "media_id",
    decode_fn: Optional[Callable[[bytes], np.ndarray]] = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (Arrow-batched).

    The UDF signature — iterator of pandas batches in, iterator out —
    is the real production shape: per-batch vectorized work, constant
    memory, no driver involvement. ``decode_fn=None`` resolves per
    blob: REAL decoded features for formats the environment can decode
    (PIL when installed; the built-in pure PNG/BMP/WAV decoders
    always — see ``operators/codecs.py``), the deterministic sha256
    stub for everything else.
    """
    if decode_fn is None:
        fdim = feature_dim

        def decode_fn(blob: bytes) -> np.ndarray:
            # stub fallback defined by value in the closure; the real
            # path imports codecs lazily on the executor (and degrades
            # to the stub if this package isn't importable there)
            try:
                from parq_tools_spark.operators.codecs import media_features

                feats = media_features(blob, fdim)
                if feats is not None:
                    return feats
            except ImportError:
                pass
            digest = hashlib.sha256(blob or b"").digest()
            return np.frombuffer(digest[:32], dtype=np.uint32).astype(np.float64) / 2**32

    decode = decode_fn
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b)[:feature_dim].tolist() for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "features": feats,
                    "n_bytes": [len(b or b"") for b in pdf[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(featurize, schema=out_schema)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    blob_col: str = "blob",
    id_col: str = "media_id",
    resize_fn: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Resize plumbing via ``mapInPandas`` (Arrow-batched).

    Same production shape as :func:`extract_features`: iterator of
    pandas batches in/out, constant memory, blobs never leave the
    executors. ``resize_fn=None`` resolves per blob: decodable images
    (PNG/BMP built-in; more with PIL) are REALLY resampled
    (nearest-neighbour) and re-encoded as PNG; undecodable blobs get
    the deterministic md5 stand-in — stable across runs and
    SQL-recomputable, so the batch plumbing stays oracle-checkable
    end-to-end. Swap in your own ``resize_fn(blob, w, h) -> bytes``
    for production (e.g. PIL Lanczos).
    """
    if resize_fn is None:

        def resize_fn(blob: bytes, w: int, h: int) -> bytes:
            try:
                from parq_tools_spark.operators.codecs import (
                    decode_media,
                    encode_png,
                    resize_nearest,
                )

                m = decode_media(blob)
                if m is not None and m["modality"] == "image":
                    return encode_png(resize_nearest(m["array"], w, h))
            except ImportError:
                pass
            key = (blob or b"") + f":{w}x{h}".encode()
            return hashlib.md5(key).hexdigest().encode()

    resize = resize_fn
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize(b, width, height) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "blob": out,
                    "width": [width] * len(out),
                    "height": [height] * len(out),
                    "n_bytes": [len(b) for b in out],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    blob_col: str = "blob",
    id_col: str = "media_id",
    frame_decoder: Optional[Callable[[bytes, int], bytes]] = None,
) -> DataFrame:
    """Video -> frame rows (media_id, frame_idx, ts_ms, frame_blob).

    With ``frame_decoder=None`` the frame blob resolves per format:
    every container the codec tier can open WITHOUT ffmpeg — animated
    GIF, AVI (MJPEG via the repo JPEG codec, incl. DHT-less
    spec-classic MJPEG, or raw DIB) and Y4M — yields the REAL frame
    covering each sample timestamp, re-encoded as PNG; containers
    needing an inter-frame codec (mp4/webm — genuinely ffmpeg
    territory) get a deterministic byte-slice stand-in so the
    explode/partition plumbing still runs. Each blob decodes ONCE per
    row (not once per sampled frame); one input row fans out to its
    frames inside the executor — classic flatMap shape via
    ``mapInPandas``.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_blob", T.BinaryType()),
        ]
    )

    def slice_standin(blob: bytes, idx: int) -> bytes:
        # deterministic fake: rotate the blob by idx bytes, take 16
        off = (idx * 16) % max(1, len(blob))
        return (blob[off:] + blob[:off])[:16]

    def decoded_frames(blob: bytes):
        """[(delay_ms, array)] for containers decodable here, else
        None (-> stand-in tier). Corrupt containers also degrade.

        GIF goes through decode_gif DIRECTLY, not decode_media: with
        PIL installed decode_media prefers PIL's decode_image, which
        returns only the FIRST frame of an animation — every sampled
        timestamp would silently get frame 0."""
        from parq_tools_spark.operators.codecs import (
            decode_gif,
            decode_media,
            sniff_format,
        )

        fmt = sniff_format(blob)
        if fmt not in ("gif", "avi", "y4m"):
            return None
        try:
            if fmt == "gif":
                return decode_gif(bytes(blob)) or None
            m = decode_media(bytes(blob))
        except Exception:
            return None
        if m is None:
            return None
        if m["modality"] == "video":
            return m["frames"]
        return None

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parq_tools_spark.operators.codecs import encode_png

        for pdf in batches:
            rows = {k: [] for k in (id_col, "frame_idx", "ts_ms", "frame_blob")}
            for mid, blob, dur in zip(
                pdf[id_col], pdf[blob_col], pdf["duration_ms"]
            ):
                # a null duration arrives as NaN (truthy!), not None
                dur = 0 if dur is None or pd.isna(dur) else int(dur)
                n_frames = max(1, dur // every_ms)
                decoded = None
                png_cache: dict = {}  # frame index -> encoded bytes
                if frame_decoder is None:
                    if not blob:
                        raise NotImplementedError(
                            "real frame decode requires ffmpeg; "
                            "provide frame_decoder"
                        )
                    decoded = decoded_frames(blob)
                for i in range(n_frames):
                    ts = i * every_ms
                    if frame_decoder is not None:
                        fb = frame_decoder(blob, i)
                    elif decoded is not None:
                        elapsed = 0
                        chosen = len(decoded) - 1
                        for fi, (delay, _) in enumerate(decoded):
                            elapsed += delay
                            if ts < elapsed:
                                chosen = fi
                                break
                        # one encode per DISTINCT frame, however many
                        # sample timestamps resolve to it
                        if chosen not in png_cache:
                            png_cache[chosen] = encode_png(decoded[chosen][1])
                        fb = png_cache[chosen]
                    else:
                        fb = slice_standin(blob, i)
                    rows[id_col].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(ts)
                    rows["frame_blob"].append(fb)
            yield pd.DataFrame(rows)

    src = df.select(
        id_col, blob_col, F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(frames, schema=out_schema)


def with_image_phash(
    df: DataFrame,
    blob_col: str = "blob",
    out_col: str = "phash",
) -> DataFrame:
    """Append a 63-bit perceptual-hash column (NULL for blobs no
    decoder handles): grayscale 32x32 DCT thresholded against the
    low-frequency median — the image analogue of text SimHash.
    Map-only ``mapInPandas``; blobs never leave the executors.
    """
    cols = df.columns
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parq_tools_spark.operators.codecs import perceptual_hash

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = pd.array(
                [perceptual_hash(b) for b in pdf[blob_col]], dtype="Int64"
            )
            yield out

    return df.mapInPandas(run, schema=out_schema)


def image_near_duplicate_pairs(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "media_id",
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """Near-duplicate IMAGE pairs ``(id1, id2, hamming)`` by banded
    perceptual-hash Hamming distance — recompressed, mildly-noised or
    slightly-edited copies collide; unrelated images do not.

    Rides the same pigeonhole banding as text SimHash
    (``dedup.hamming_pairs``): one shuffle keyed by (band, value),
    never all-pairs, so a billion-image corpus dedupes at the cost of
    its band join. Undecodable blobs (NULL phash) are excluded rather
    than colliding in a NULL bucket. ``max_hamming`` must stay below
    ``n_bands`` for the banding recall guarantee.
    """
    from parq_tools_spark.operators.dedup import hamming_pairs

    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands > max_hamming "
            f"(got {n_bands}) for the pigeonhole guarantee"
        )
    hashed = with_image_phash(df, blob_col=blob_col).filter(
        F.col("phash").isNotNull()
    )
    return hamming_pairs(
        hashed.select(id_col, "phash"),
        "phash",
        id_col,
        max_hamming=max_hamming,
        n_bands=n_bands,
    )


def resample_audio(
    df: DataFrame,
    target_rate: int,
    blob_col: str = "blob",
    id_col: str = "media_id",
) -> DataFrame:
    """Resample decodable audio blobs (PCM / IEEE-float WAV) to
    ``target_rate`` — REAL linear-interpolation resampling re-encoded
    as 16-bit PCM WAV; non-audio blobs pass through with a NULL blob
    and ``resampled=false`` so the pipeline can route them.

    Returns (id, blob, sample_rate, n_frames, resampled). Same
    map-only ``mapInPandas`` shape as :func:`resize_media` — audio
    bytes never leave the executors, parallelism = partitions (pair
    with :func:`repartition_by_bytes`).
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("blob", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("resampled", T.BooleanType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from parq_tools_spark.operators.codecs import (
            decode_wav,
            encode_wav,
            resample_linear,
            sniff_format,
        )

        for pdf in batches:
            rows = {k: [] for k in (id_col, "blob", "sample_rate", "n_frames", "resampled")}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                rows[id_col].append(mid)
                ok = False
                if sniff_format(blob) == "wav":
                    try:
                        samples, rate = decode_wav(bytes(blob))
                        out = resample_linear(samples, rate, target_rate)
                        rows["blob"].append(encode_wav(out, target_rate))
                        rows["sample_rate"].append(target_rate)
                        rows["n_frames"].append(out.shape[0])
                        rows["resampled"].append(True)
                        ok = True
                    except Exception:
                        ok = False  # corrupt container: route, don't crash
                if not ok:
                    rows["blob"].append(None)
                    rows["sample_rate"].append(None)
                    rows["n_frames"].append(None)
                    rows["resampled"].append(False)
            pdf_out = pd.DataFrame(rows)
            pdf_out["sample_rate"] = pdf_out["sample_rate"].astype("Int32")
            pdf_out["n_frames"] = pdf_out["n_frames"].astype("Int64")
            yield pdf_out

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)
