"""Filesystem primitives for state-directory protocols, routed
through the JVM Hadoop ``FileSystem`` API (beyond-reference; the
reference is a single-machine tool whose state — if any — is plain
local files, `parq_tools/utils` passim).

Why not ``os`` / ``glob`` / ``shutil``: the incremental-maintenance
features (rollup state, CDC snapshots, the MinHash index, streaming
markers) must hold on the storage a 1000-executor cluster actually
uses — HDFS and object stores (``s3a:``, ``abfs:``, ``gs:``) — where
the Python stdlib never reaches. Every listing, read, write, rename
and delete here goes through ``Path.getFileSystem(hadoopConf)``, the
same connector stack Spark's own reads use, so one code path covers
``file:`` (tests), ``hdfs:`` and object stores alike.

Atomicity is SCHEME-DEPENDENT, and the protocols built on this module
pick primitives accordingly:

- ``file:`` / ``hdfs:`` — ``rename`` is atomic (file and directory);
  object stores emulate rename as copy+delete (non-atomic, O(data)).
- object stores — single-object PUT is atomic: a file written via
  ``create`` + ``close`` appears fully-formed or not at all. Directory
  content is only eventually consistent relative to listings on some
  stores.

Therefore: **commit = the appearance of one small immutable marker
file** (a manifest), never a directory rename. Writing that marker is
``tmp + rename`` where rename is atomic and a direct create-PUT where
it is not (:meth:`StateFS.write_text`); both end with the marker
either fully present or absent. Directory renames remain available
(:meth:`StateFS.rename`) for protocols that are optimization-only
(e.g. index compaction) and document their non-atomic window on
object stores.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

from pyspark.sql import SparkSession

__all__ = ["StateFS", "VersionedState"]

#: Schemes where rename is copy+delete (non-atomic) but single-object
#: PUT is atomic.
_OBJECT_STORE_SCHEMES = {
    "s3", "s3a", "s3n", "gs", "oss", "cos", "cosn",
    "wasb", "wasbs", "abfs", "abfss", "swift",
}


class StateFS:
    """Hadoop-FileSystem-backed file operations rooted at one path.

    One instance wraps the ``FileSystem`` owning ``base`` (Hadoop
    caches these per scheme+authority, so construction is cheap) and
    exposes the handful of primitives the state protocols need. All
    paths are strings; relative semantics follow Hadoop ``Path``.
    """

    def __init__(self, spark: SparkSession, base: str):
        jvm = spark._jvm
        self._jPath = jvm.org.apache.hadoop.fs.Path
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._fs = self._jPath(base).getFileSystem(conf)
        self._ioutils = jvm.org.apache.commons.io.IOUtils

    # ---------------------------------------------------- basics
    def _p(self, path: str):
        return self._jPath(path)

    @property
    def scheme(self) -> str:
        return self._fs.getScheme()

    @property
    def is_object_store(self) -> bool:
        """True when rename is non-atomic copy+delete and the atomic
        primitive is single-object PUT instead."""
        return self.scheme in _OBJECT_STORE_SCHEMES

    def qualify(self, path: str) -> str:
        """The fully-qualified URI of ``path`` on this filesystem —
        the scheme-stable identity to persist (``os.path.abspath``
        only makes sense for ``file:``)."""
        return self._fs.makeQualified(self._p(path)).toString()

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str) -> bool:
        """Recursive delete; False if the path didn't exist."""
        return self._fs.delete(self._p(path), True)

    def rename(self, src: str, dst: str) -> None:
        """Rename, raising IOError on failure (Hadoop signals failure
        inconsistently per filesystem — False return OR an exception;
        both normalize here). Atomic on ``file:``/``hdfs:``;
        copy+delete on object stores."""
        try:
            ok = self._fs.rename(self._p(src), self._p(dst))
        except Exception as e:  # Py4JJavaError et al.
            raise IOError(f"rename failed: {src} -> {dst}: {e}") from e
        if not ok:
            raise IOError(f"rename failed: {src} -> {dst}")

    # ---------------------------------------------------- listing
    def list_status(self, path: str) -> List[Tuple[str, bool, int]]:
        """One-level listing: ``(name, is_dir, byte_len)`` per child,
        sorted by name. Empty for a missing path."""
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        out = []
        for st in self._fs.listStatus(p):
            out.append(
                (st.getPath().getName(), st.isDirectory(), st.getLen())
            )
        return sorted(out)

    def list_files(
        self, path: str, suffix: Optional[str] = ".parquet"
    ) -> List[str]:
        """Recursive file listing as sorted paths RELATIVE to
        ``path``, skipping hidden (``.``/``_``-prefixed) segments —
        the discovery primitive the manifest diff keys on. One
        ``listFiles`` scan (object stores serve this from the flat
        key namespace: no per-directory round trips)."""
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        base = self._fs.makeQualified(p).toUri().getPath().rstrip("/")
        it = self._fs.listFiles(p, True)
        out = []
        while it.hasNext():
            fp = it.next().getPath()
            if suffix and not fp.getName().endswith(suffix):
                continue
            rel = fp.toUri().getPath()[len(base):].lstrip("/")
            if any(s.startswith((".", "_")) for s in rel.split("/")):
                continue
            out.append(rel)
        return sorted(out)

    # ---------------------------------------------------- small files
    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            data = self._ioutils.toByteArray(stream)
        finally:
            stream.close()
        return bytes(data).decode("utf-8")

    def write_text(self, path: str, text: str) -> None:
        """Write a small file so it appears fully-formed or not at
        all: ``create`` + ``close`` on object stores (atomic PUT),
        ``tmp`` + rename elsewhere (readers of a half-written
        local/HDFS file are otherwise possible). The rename is tried
        FIRST — on POSIX local filesystems it atomically replaces an
        existing destination, so an overwrite never has a
        no-file-visible window; only where rename refuses an existing
        destination (HDFS) does the delete+rename fallback run, whose
        brief absent-marker window readers must treat as "not
        committed" (which every protocol here does)."""
        if self.is_object_store:
            self._create(path, text)
            return
        tmp = f"{path}.tmp-{os.getpid()}"
        self._create(tmp, text)
        try:
            self.rename(tmp, path)
        except IOError:
            self._fs.delete(self._p(path), False)
            self.rename(tmp, path)

    def _create(self, path: str, text: str) -> None:
        out = self._fs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def create_exclusive(self, path: str, text: str) -> None:
        """Create ``path`` with ``text``, FAILING (``FileExistsError``)
        if it already exists — ``FileSystem.create(overwrite=false)``,
        the one conditional primitive every Hadoop filesystem offers.
        This is the mutual-exclusion point for single-writer
        protocols: of two concurrent writers racing to create the same
        commit marker, exactly one succeeds and the loser fails
        LOUDLY instead of silently clobbering the winner.

        Exclusivity is ATOMIC on ``file:`` and ``hdfs:`` (the
        namenode/kernel arbitrates the create). On object stores the
        s3a/abfs connectors implement ``overwrite=false`` as an
        existence probe followed by a PUT, so two writers passing the
        probe simultaneously can both "succeed" — the guarantee
        degrades to best-effort there (the race narrows to the probe
        window but is not closed; hard serialization on S3-class
        stores needs a conditional-PUT-aware connector or an external
        lock service, the same limitation Delta's LogStore documents).
        Still strictly better than unconditional write: the common
        misuse (a second committer arriving AFTER a completed commit)
        always fails loudly on every scheme.

        Unlike :meth:`write_text` there is no tmp+rename hop (a POSIX
        rename overwrites an existing destination, so it cannot
        enforce exclusivity) — the file is briefly visible before its
        content lands. A concurrent reader in that window sees a
        present-but-empty/partial marker and RAISES on parse (the
        strict-marker convention), never a silent wrong read.
        """
        try:
            out = self._fs.create(self._p(path), False)
        except Exception as e:  # Py4JJavaError
            jexc = getattr(e, "java_exception", None)
            name = jexc.getClass().getName() if jexc is not None else ""
            msg = str(jexc) if jexc is not None else str(e)
            if "AlreadyExists" in name or "already exists" in msg:
                raise FileExistsError(
                    f"exclusive create failed, path exists: {path}"
                ) from e
            raise IOError(
                f"exclusive create failed: {path}: {e}"
            ) from e
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()


class VersionedState:
    """The versioned-manifest commit protocol shared by the rollup
    state (``operators/incremental_agg.py``) and CDC snapshots
    (``streaming/cdc.py``) — ONE implementation so the on-disk
    protocol cannot fork between them.

    Layout: ``root/v=<n>/...`` version directories; a version is
    committed iff its marker file (``marker_name``) exists inside it.
    Writers build ``v=<n+1>`` fully, then write the marker LAST via
    :meth:`StateFS.create_exclusive` — its appearance is the commit
    point. Readers resolve the highest committed version; uncommitted
    directories are invisible. :meth:`clean_stale` sweeps aborted
    versions and versions older than the current one (the previous
    version survives until the NEXT cycle, so in-flight readers get a
    full cycle to finish).

    Single writer ENFORCED at the commit point: the marker is created
    conditionally (``create(overwrite=false)``), so two concurrent
    folds that both built ``v=n+1`` cannot both commit — the loser
    raises ``FileExistsError`` instead of silently replacing the
    winner's marker (which would drop the winner's fold from history
    while its data directory still carried the winner's files). The
    loser's correct move is to re-resolve the current version and
    retry its fold on top of the winner's commit.

    Marker reads are STRICT: a transient storage error on a committed
    marker propagates instead of reading as "absent" — treating it as
    absent would silently re-process history (double counts) or
    re-apply batches.
    """

    _V_RE = re.compile(r"^v=(\d+)$")

    def __init__(self, spark: SparkSession, root: str, marker_name: str):
        self.fs = StateFS(spark, root)
        self.root = root
        self.marker_name = marker_name

    def version_dir(self, n: int) -> str:
        return f"{self.root}/v={n}"

    def marker_path(self, n: int) -> str:
        return f"{self.version_dir(n)}/{self.marker_name}"

    def versions(self) -> List[Tuple[int, bool]]:
        """Sorted ``(n, committed)`` for every ``v=<n>`` child."""
        out = []
        for name, is_dir, _ in self.fs.list_status(self.root):
            m = self._V_RE.match(name)
            if m and is_dir:
                n = int(m.group(1))
                out.append((n, self.fs.exists(self.marker_path(n))))
        return sorted(out)

    def current(self) -> Optional[int]:
        committed = [n for n, ok in self.versions() if ok]
        return max(committed) if committed else None

    def read_marker(self, n: int) -> str:
        """The committed marker's content. Strict: errors propagate."""
        return self.fs.read_text(self.marker_path(n))

    def commit(self, n: int, marker_text: str) -> None:
        """Commit version ``n`` by creating its marker (create LAST,
        after the version directory's data is fully materialized).
        The create is EXCLUSIVE: committing an already-committed
        version raises ``FileExistsError`` — the enforced
        single-writer invariant (a lost concurrent fold fails loudly
        here rather than vanishing)."""
        self.fs.create_exclusive(self.marker_path(n), marker_text)

    def clean_stale(
        self,
        current: Optional[int],
        sweep_root_files: bool = False,
        keep_versions: int = 1,
    ) -> None:
        """Sweep aborted versions (uncommitted) and committed versions
        older than the newest ``keep_versions`` (counted back from
        ``current``) — ``keep_versions=1`` keeps only the current
        commit (plus the implicit one-cycle grace the sweep timing
        gives its predecessor); larger values retain history for
        version-travel reads and rollback. With
        ``sweep_root_files=True``, loose non-hidden files at the root
        (a plain-parquet bootstrap = "version 0") are swept once two
        real versions exist."""
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        for n, committed in self.versions():
            if (not committed and n != current) or (
                committed
                and current is not None
                and n <= current - keep_versions
            ):
                self.fs.delete(self.version_dir(n))
        if sweep_root_files and current is not None and current >= 2:
            for name, is_dir, _ in self.fs.list_status(self.root):
                if not is_dir and not name.startswith((".", "_")):
                    self.fs.delete(f"{self.root}/{name}")
