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
    """Refuse archives whose entry NAMES would land outside the output
    dir (absolute paths or ``..`` components). This is only one of the
    checks ``tarfile``'s ``data`` filter performs — symlink vetting for
    the 7z paths lives in :func:`_reject_link_entries` (pre-extraction,
    from the listing) and :func:`_reject_outward_links`
    (post-extraction walk of the atomic tmp dir)."""
    import posixpath

    for name in names:
        clean = name.replace("\\", "/")
        if posixpath.isabs(clean) or ".." in clean.split("/"):
            raise ValueError(
                f"Archive {archive_path} entry {name!r} escapes the "
                "output directory (absolute path or '..'); refusing to "
                "extract"
            )


_S_IFMT, _S_IFLNK = 0o170000, 0o120000
# 7z stores a unix st_mode in the high 16 attribute bits behind
# FILE_ATTRIBUTE_UNIX_EXTENSION (0x8000)
_UNIX_EXT = 0x8000


def _reject_link_entries(entries, archive_path: Path) -> None:
    """Refuse 7z archives whose LISTING marks any entry as a symlink.

    This must run BEFORE extraction: an extractor that first creates a
    symlink pointing outside the output dir and then extracts a file
    through it has already escaped by the time a post-hoc walk runs.
    ``entries`` are py7zr ``FileInfo``-likes (``attributes`` int).
    """
    for e in entries:
        attrs = getattr(e, "attributes", None) or 0
        if attrs & _UNIX_EXT and (attrs >> 16) & _S_IFMT == _S_IFLNK:
            raise ValueError(
                f"Archive {archive_path} entry {getattr(e, 'filename', '?')!r} "
                "is a symlink; refusing to extract (links can redirect "
                "writes outside the output directory)"
            )


def _reject_outward_links(tmp: Path, archive_path: Path) -> None:
    """Walk the freshly-extracted tmp dir and refuse to publish it if
    any entry is a symlink resolving outside the tmp dir, or a special
    file (FIFO/device). Runs INSIDE the atomic-output context, so a
    rejection discards the tmp dir and nothing reaches the final path.
    Belt to :func:`_reject_link_entries`'s braces — catches extractors
    whose listings hide link attributes."""
    root = tmp.resolve()
    for dirpath, dirnames, filenames in os.walk(tmp):
        for name in (*dirnames, *filenames):
            p = Path(dirpath) / name
            if p.is_symlink():
                resolved = p.resolve()
                if resolved != root and root not in resolved.parents:
                    raise ValueError(
                        f"Archive {archive_path} produced symlink {name!r} "
                        f"resolving outside the output directory "
                        f"({resolved}); refusing to extract"
                    )
            elif not (p.is_file() or p.is_dir()):
                raise ValueError(
                    f"Archive {archive_path} produced special file "
                    f"{name!r}; refusing to extract"
                )


def _extract_archive_7z(archive_path: Path, output_dir: Path) -> Path:
    """7-Zip fallback for non-zip/tar archives: ``py7zr`` if installed,
    else the ``7z`` executable; otherwise raise naming the divergence.
    Entry names AND link attributes are vetted from the listing BEFORE
    extraction (older py7zr releases and the raw binary don't sanitize
    them), and the extracted tmp dir is walked for outward-resolving
    symlinks / special files before the atomic rename publishes it."""
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
                lister = getattr(zf, "list", None)
                if callable(lister):
                    _reject_link_entries(lister(), archive_path)
                zf.extractall(tmp)
            _reject_outward_links(tmp, archive_path)
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
        # -slt prints one "Attributes = ..." per entry; a unix mode
        # string starting with 'l' (or an explicit Symbolic Link field)
        # marks a symlink — refuse BEFORE extraction, a link can
        # redirect later writes outside the tmp dir
        for line in listing.stdout.splitlines():
            if line.startswith("Symbolic Link = ") and line.split(" = ", 1)[1]:
                raise ValueError(
                    f"Archive {archive_path} contains a symlink entry; "
                    "refusing to extract"
                )
            if line.startswith("Attributes = "):
                mode = line.rsplit(" ", 1)[-1]
                if mode.startswith("l") and len(mode) == 10:
                    raise ValueError(
                        f"Archive {archive_path} contains a symlink entry "
                        f"({line.strip()}); refusing to extract"
                    )
        output_dir.parent.mkdir(parents=True, exist_ok=True)
        with atomic_output_dir(output_dir) as tmp:
            subprocess.run(
                [seven_zip, "x", "-y", f"-o{tmp}", str(archive_path)],
                check=True,
                capture_output=True,
            )
            _reject_outward_links(tmp, archive_path)
        return output_dir

    raise ValueError(
        f"Not a zip or tar archive: {archive_path}. Other formats need "
        "the 7-Zip fallback (install py7zr or put a 7z binary on PATH); "
        "neither is available here, so only zip and tar(.gz/.bz2/.xz) "
        "are supported (known divergence)."
    )
