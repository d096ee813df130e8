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
resized = resize_media(media.filter("media_id < 5"), width=8, height=8)
out = {r.media_id: bytes(r.blob) for r in resized.collect()}
m = decode_media(out[0])
print(f"resized media 0 -> {m['width']}x{m['height']} PNG, {len(out[0])} bytes")
assert (m["width"], m["height"]) == (8, 8)
spark.stop()
print("ok")
