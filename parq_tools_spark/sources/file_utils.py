"""Driver-side file utilities (SURVEY §2.1 S5-S10).

These are deliberately plain Python: they operate on local files from
the driver and have no distributed component (the reference's
``file_utils.py`` / ``hash_utils.py`` / ``archive_utils.py`` surface).
Data-level equality at scale lives in
:mod:`parq_tools_spark.operators.compare` instead.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import zipfile
from contextlib import contextmanager
from pathlib import Path

__all__ = [
    "atomic_output_file",
    "atomic_output_dir",
    "file_hash",
    "fast_file_check",
    "files_match",
    "atomic_file_copy",
    "extract_archive",
]

_CHUNK = 1 << 20  # 1 MiB, matching the reference's copy/hash chunk


@contextmanager
def atomic_output_file(final_path: str | Path):
    """Write to ``<name>.tmp``; rename on success, delete on error
    (``file_utils.py:15-42``). For Spark *job* outputs the Hadoop
    commit protocol already provides this; use here for driver-side
    sidecar/report files."""
    final_path = Path(final_path)
    tmp = final_path.with_name(final_path.name + ".tmp")
    try:
        yield tmp
        os.replace(tmp, final_path)
    except Exception:
        if tmp.exists():
            tmp.unlink()
        raise


@contextmanager
def atomic_output_dir(final_path: str | Path):
    """Directory variant (``file_utils.py:45-77``)."""
    final_path = Path(final_path)
    tmp = Path(tempfile.mkdtemp(prefix=final_path.name + ".", dir=final_path.parent))
    try:
        yield tmp
        if final_path.exists():
            shutil.rmtree(final_path)
        os.replace(tmp, final_path)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def file_hash(path: str | Path, method: str = "sha256") -> str:
    """Full-content hash (``hash_utils.py:5-22``)."""
    h = hashlib.new(method)
    with open(path, "rb") as f:
        while chunk := f.read(_CHUNK):
            h.update(chunk)
    return h.hexdigest()


def fast_file_check(path1: str | Path, path2: str | Path) -> bool:
    """Size + 3-point content sample equality (``hash_utils.py:25-40``).

    Cheap screen before a full hash; can false-positive on files that
    differ only outside the sampled windows — use :func:`files_match`
    for certainty.
    """
    s1, s2 = os.stat(path1), os.stat(path2)
    if s1.st_size != s2.st_size:
        return False
    size = s1.st_size
    offsets = {0, max(0, size // 2 - 2048), max(0, size - 4096)}
    with open(path1, "rb") as f1, open(path2, "rb") as f2:
        for off in sorted(offsets):
            f1.seek(off)
            f2.seek(off)
            if f1.read(4096) != f2.read(4096):
                return False
    return True


def files_match(
    path1: str | Path, path2: str | Path, method: str = "sha256"
) -> bool:
    """Exact content equality via full hash (``hash_utils.py:58-69``)."""
    if os.stat(path1).st_size != os.stat(path2).st_size:
        return False
    return file_hash(path1, method) == file_hash(path2, method)


def atomic_file_copy(
    src: str | Path,
    dst: str | Path,
    hash_method: str = "sha256",
    force: bool = False,
) -> Path:
    """Chunked copy + hash verify + skip-if-identical (``file_utils.py:80-154``)."""
    src, dst = Path(src), Path(dst)
    if dst.is_dir():
        dst = dst / src.name
    if dst.exists() and not force and files_match(src, dst, hash_method):
        return dst
    src_hash = file_hash(src, hash_method)
    with atomic_output_file(dst) as tmp:
        with open(src, "rb") as fin, open(tmp, "wb") as fout:
            while chunk := fin.read(_CHUNK):
                fout.write(chunk)
        if file_hash(tmp, hash_method) != src_hash:
            raise IOError(f"Copy verification failed for {src} -> {dst}")
    return dst


def extract_archive(archive_path: str | Path, output_dir: str | Path) -> Path:
    """Zip/tar/7z extraction with atomic output (``archive_utils.py:12-54``).

    zip via ``zipfile``; tar (+gz/bz2/xz) via ``tarfile`` with the
    ``data`` filter (no absolute paths / traversal / devices). Other
    formats follow the reference's 7-Zip fallback
    (``archive_utils.py:57-113``): the optional ``py7zr`` module if
    importable, else a ``7z`` binary on PATH; when neither is present
    (e.g. this container) the error spells out the divergence.
    """
    import tarfile

    archive_path, output_dir = Path(archive_path), Path(output_dir)
    is_zip = zipfile.is_zipfile(archive_path)
    is_tar = not is_zip and tarfile.is_tarfile(archive_path)
    if not (is_zip or is_tar):
        return _extract_archive_7z(archive_path, output_dir)
    output_dir.parent.mkdir(parents=True, exist_ok=True)
    with atomic_output_dir(output_dir) as tmp:
        if is_zip:
            with zipfile.ZipFile(archive_path) as zf:
                zf.extractall(tmp)
        else:
            with tarfile.open(archive_path) as tf:
                tf.extractall(tmp, filter="data")
    return output_dir


def _reject_escaping_entries(names, archive_path: Path) -> None:
    """Refuse archives whose entries would land outside the output dir
    (absolute paths or ``..`` components) — the same protection
    ``tarfile``'s ``data`` filter gives the tar path."""
    import posixpath

    for name in names:
        clean = name.replace("\\", "/")
        if posixpath.isabs(clean) or ".." in clean.split("/"):
            raise ValueError(
                f"Archive {archive_path} entry {name!r} escapes the "
                "output directory (absolute path or '..'); refusing to "
                "extract"
            )


def _extract_archive_7z(archive_path: Path, output_dir: Path) -> Path:
    """7-Zip fallback for non-zip/tar archives: ``py7zr`` if installed,
    else the ``7z`` executable; otherwise raise naming the divergence.
    Entry names are vetted for path traversal BEFORE extraction (older
    py7zr releases and the raw binary don't sanitize them)."""
    import shutil as _shutil
    import subprocess

    try:
        import py7zr  # optional dependency
    except ImportError:
        py7zr = None

    if py7zr is not None and py7zr.is_7zfile(archive_path):
        output_dir.parent.mkdir(parents=True, exist_ok=True)
        with atomic_output_dir(output_dir) as tmp:
            with py7zr.SevenZipFile(archive_path) as zf:
                _reject_escaping_entries(zf.getnames(), archive_path)
                zf.extractall(tmp)
        return output_dir

    seven_zip = _shutil.which("7z") or _shutil.which("7za")
    if seven_zip:
        listing = subprocess.run(
            [seven_zip, "l", "-ba", "-slt", str(archive_path)],
            check=True,
            capture_output=True,
            text=True,
        )
        names = [
            line[len("Path = "):]
            for line in listing.stdout.splitlines()
            if line.startswith("Path = ")
        ]
        _reject_escaping_entries(names, archive_path)
        output_dir.parent.mkdir(parents=True, exist_ok=True)
        with atomic_output_dir(output_dir) as tmp:
            subprocess.run(
                [seven_zip, "x", "-y", f"-o{tmp}", str(archive_path)],
                check=True,
                capture_output=True,
            )
        return output_dir

    raise ValueError(
        f"Not a zip or tar archive: {archive_path}. Other formats need "
        "the 7-Zip fallback (install py7zr or put a 7z binary on PATH); "
        "neither is available here, so only zip and tar(.gz/.bz2/.xz) "
        "are supported (known divergence)."
    )
