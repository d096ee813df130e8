"""Real media decode in the multimodal pipeline (round 6).

Rounds 1-5 shipped the multimodal PLUMBING (binary columns, typed
metadata, byte-budget partitioning, mapInPandas batch shapes) with a
stubbed codec. Round 6 makes the decode real without any third-party
codec: pure-numpy PNG/BMP/WAV decoders (operators/codecs.py), with
PIL picked up automatically when installed. This example builds a
small mixed-media table in memory, probes header metadata, extracts
REAL features, and really resizes the images.

Run: python examples/13_multimodal_media.py
"""
import io
import os
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from parq_tools_spark import get_spark
from parq_tools_spark.operators.codecs import decode_media, encode_bmp, encode_png
from parq_tools_spark.operators.multimodal import (
    attach_media_metadata,
    extract_features,
    repartition_by_bytes,
    resize_media,
)

spark = get_spark("example_13")

# ---- craft a mixed corpus: PNGs, a BMP, a WAV tone, one opaque blob
rng = np.random.RandomState(0)
rows = []
for i in range(4):
    img = rng.randint(0, 256, size=(32 + 8 * i, 48, 3), dtype=np.uint8)
    rows.append((i, bytearray(encode_png(img))))
rows.append((4, bytearray(encode_bmp(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)))))

buf = io.BytesIO()
with wave.open(buf, "wb") as wf:
    wf.setnchannels(1)
    wf.setsampwidth(2)
    wf.setframerate(8000)
    t = np.arange(8000)
    wf.writeframes((np.sin(2 * np.pi * 220 * t / 8000) * 20000).astype("<i2").tobytes())
rows.append((5, bytearray(buf.getvalue())))
rows.append((6, bytearray(b"no magic bytes here - falls back to the stub")))

# baseline JPEG (pure-numpy codec, operators/jpeg.py)
from parq_tools_spark.operators.jpeg import encode_jpeg

rows.append((7, bytearray(encode_jpeg(rng.randint(0, 256, (24, 36, 3), dtype=np.uint8), quality=90))))

# animated GIF: the video-like modality decodable without ffmpeg
from parq_tools_spark.operators.codecs import encode_gif

gif_frames = [np.full((12, 12), v, dtype=np.uint8) for v in (0, 80, 160, 240)]
rows.append((8, bytearray(encode_gif(gif_frames, delays_ms=[500] * 4))))

media = spark.createDataFrame(rows, "media_id long, blob binary")

# ---- header-only metadata probe (a few dozen bytes per blob, no decode)
probed = attach_media_metadata(media, probe=True)
print("== probed metadata (header-only parse) ==")
probed.select("media_id", "meta.*").show(truncate=False)

# ---- partition by byte budget (decode work ~ bytes, not rows),
#      then REAL feature extraction: width/height/channels/pixel stats
#      for images, frames/rate/zero-crossings for audio
feats = extract_features(repartition_by_bytes(media, 1 << 20))
print("== extracted features (real decode; media 6 = sha256 stub) ==")
feats.show(truncate=False)

# ---- real nearest-neighbour resize, re-encoded as PNG
resized = resize_media(media.filter("media_id < 5 or media_id = 7"), width=8, height=8)
out = {r.media_id: bytes(r.blob) for r in resized.collect()}
m = decode_media(out[0])
print(f"resized media 0 -> {m['width']}x{m['height']} PNG, {len(out[0])} bytes")
assert (m["width"], m["height"]) == (8, 8)
assert decode_media(out[7])["width"] == 8  # JPEG went through the real path too

# ---- real frame sampling from the animated GIF (no ffmpeg needed)
from parq_tools_spark.operators.multimodal import sample_frames

# sample_frames reads meta.duration_ms, so feed the probed frame
frames_df = sample_frames(probed.filter("media_id = 8"), every_ms=500)
sampled = sorted(
    (r.frame_idx, r.ts_ms, decode_media(bytes(r.frame_blob))["array"][0, 0, 0])
    for r in frames_df.collect()
)
print("== sampled GIF frames (idx, ts_ms, pixel value) ==")
print(sampled)
assert [v for _, _, v in sampled] == [0, 80, 160, 240]
spark.stop()
print("ok")

# ---- restart a session for the round-6 additions below
spark = get_spark("example_13b")

# ---- image near-duplicate detection: perceptual hash + banded Hamming
from parq_tools_spark.operators.multimodal import image_near_duplicate_pairs

base = rng.randint(0, 256, (48, 48, 3), dtype=np.uint8)
base[8:40, 8:40] = (200, 40, 40)  # structure, not pure noise
noisy = np.clip(base.astype(np.int16) + rng.randint(-6, 7, base.shape), 0, 255).astype(np.uint8)
unrelated = rng.randint(0, 256, (48, 48, 3), dtype=np.uint8)
unrelated[:24] = (10, 220, 10)

images = spark.createDataFrame(
    [
        (100, bytearray(encode_png(base))),
        (101, bytearray(encode_jpeg(base, quality=85))),   # recompressed copy
        (102, bytearray(encode_png(noisy))),               # noised copy
        (103, bytearray(encode_png(unrelated))),
        (104, bytearray(b"opaque")),
    ],
    "media_id long, blob binary",
)
pairs = image_near_duplicate_pairs(images, max_hamming=6)
got = sorted((r.id1, r.id2, r.hamming) for r in pairs.collect())
print("== image near-duplicates (pHash, banded Hamming) ==")
print(got)
assert {(a, b) for a, b, _ in got} == {(100, 101), (100, 102), (101, 102)}

# ---- real audio resampling (8 kHz tone -> 16 kHz)
from parq_tools_spark.operators.codecs import decode_wav
from parq_tools_spark.operators.multimodal import resample_audio

audio = spark.createDataFrame([(5, rows[5][1])], "media_id long, blob binary")
res = resample_audio(audio, 16000).collect()[0]
samples, rate = decode_wav(bytes(res.blob))
print(f"resampled: {rate} Hz, {samples.shape[0]} frames")
assert rate == 16000 and samples.shape[0] == 16000  # 1 s of audio

spark.stop()
print("round-6 additions ok")

# ---- real video containers (late round 6): AVI + Y4M without ffmpeg
spark = get_spark("example_13c")
from parq_tools_spark.operators.codecs import decode_png
from parq_tools_spark.operators.multimodal import sample_frames
from parq_tools_spark.operators.video import encode_avi, encode_y4m

vid_frames = []
for i in range(6):
    yy, xx = np.mgrid[0:24, 0:32]
    vid_frames.append(
        np.stack(
            [(xx * 4 + i * 25) % 256, (yy * 6) % 256, ((xx + yy) * 3) % 256],
            axis=2,
        ).astype(np.uint8)
    )
vids = spark.createDataFrame(
    [
        # spec-classic MJPEG: frames omit Huffman tables; the decoder
        # injects Annex K per the MJPEG convention
        (300, bytearray(encode_avi(vid_frames, fps=2, codec="mjpeg",
                                   omit_huffman=True))),
        (301, bytearray(encode_avi(vid_frames, fps=2, codec="dib"))),
        (302, bytearray(encode_y4m(vid_frames, fps=(2, 1)))),
    ],
    "media_id long, blob binary",
)
vmedia = attach_media_metadata(vids, probe=True)
print("== video containers probed (header-only) ==")
vmedia.select("media_id", "meta.format", "meta.width", "meta.height",
              "meta.duration_ms").show()
vsampled = sample_frames(vmedia, every_ms=1000).collect()
for r in sorted(vsampled, key=lambda r: (r.media_id, r.frame_idx))[:6]:
    arr = decode_png(bytes(r.frame_blob))
    print(f"media {r.media_id} frame {r.frame_idx} @ {r.ts_ms}ms -> "
          f"REAL {arr.shape[1]}x{arr.shape[0]} frame")
print("video containers ok")
