"""Archive extraction (reference examples/07_archive_extraction.py).

zip via ``zipfile``, tar(.gz/.bz2/.xz) via ``tarfile`` — atomic output
(the directory appears only if extraction completed). The reference's
7-Zip subprocess fallback is a documented divergence (no 7z binary).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
import zipfile
from pathlib import Path

from parq_tools_spark.sources.file_utils import extract_archive

tmp = Path(tempfile.mkdtemp(prefix="pts_archive_"))
payload = tmp / "payload.txt"
payload.write_text("hello from the archive")
arch = tmp / "demo.zip"
with zipfile.ZipFile(arch, "w") as zf:
    zf.write(payload, arcname="payload.txt")

out = extract_archive(arch, tmp / "extracted")
print((out / "payload.txt").read_text())
