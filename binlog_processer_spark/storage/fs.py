"""Filesystem shim for snapshot-table metadata I/O.

The DATA path (parquet/orc read+write) already goes through Spark, which
speaks every Hadoop-supported scheme. This module gives the METADATA path
(manifests, ``_current`` pointer, commit-time inventory listing) the same
reach: plain paths use ``os``/``open``; ``scheme://`` paths route through the
JVM's ``org.apache.hadoop.fs.FileSystem`` — the exact FS layer Spark itself
writes through, so any scheme the data can reach, the manifests can too
(HdfsStorage.java:40-104 is the reference's native habitat; its temp→rename
commit at 98-116 is the same protocol ``write_text_atomic`` uses here).

Atomicity note: ``rename`` is atomic on local and HDFS; object stores
(S3A) emulate it as copy+delete, so concurrent committers there need a
catalog/lock service above this layer — identical to Iceberg's
HadoopCatalog caveat, documented rather than hidden.
"""

from __future__ import annotations

import os
import re
from typing import Protocol

_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*://")


def is_uri(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def join(base: str, *parts: str) -> str:
    """Path join that never mangles URI schemes (os.path.normpath would
    collapse ``hdfs://`` to ``hdfs:/``)."""
    out = base.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def _uri_parts(p: str) -> tuple[str, str, str]:
    """(scheme, authority, path) — normalizes ``file:/x`` vs ``file:///x``
    (Hadoop renders authority-less URIs with a single slash)."""
    from urllib.parse import urlparse

    u = urlparse(p)
    return (u.scheme, u.netloc, u.path.rstrip("/"))


def rel_to(path: str, base: str) -> str:
    """Root-relative form of ``path`` under ``base`` (URI-safe relpath)."""
    if is_uri(path) or is_uri(base):
        ps, pa, pp = _uri_parts(path)
        bs, ba, bp = _uri_parts(base)
        if (ps, pa) == (bs, ba) and pp.startswith(bp + "/"):
            return pp[len(bp) + 1:]
        raise ValueError(f"{path} is not under {base}")
    return os.path.relpath(path, base)


class FS(Protocol):
    #: True when ``rename`` is a single atomic metadata operation (POSIX,
    #: HDFS). Object stores emulate it as copy+delete — two writers racing
    #: a stale-lock break can then BOTH succeed, so ``commit_lock`` refuses
    #: TTL breaks when this is False (the Iceberg HadoopCatalog caveat,
    #: enforced instead of documented).
    rename_is_atomic: bool

    def read_text(self, path: str) -> str: ...
    def write_text_atomic(self, path: str, text: str) -> None: ...
    def create_exclusive(self, path: str, text: str) -> bool: ...
    def rename(self, src: str, dst: str) -> bool: ...
    def mkdirs(self, path: str) -> None: ...
    def list_files(self, base: str, ext: str) -> list[str]: ...
    def list_sizes(self, base: str, ext: str) -> dict[str, int]: ...
    def size(self, path: str) -> int: ...
    def delete_file(self, path: str) -> None: ...
    def delete_dir(self, path: str) -> None: ...
    def list_dirs(self, base: str) -> list[str]: ...


class LocalFS:
    rename_is_atomic = True  # POSIX rename(2)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)

    def create_exclusive(self, path: str, text: str) -> bool:
        """Create-if-absent, atomically (O_EXCL — the POSIX mutex
        primitive). True iff this caller created the file."""
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, text.encode("utf-8"))
        finally:
            os.close(fd)
        return True

    def rename(self, src: str, dst: str) -> bool:
        """Atomic rename; False if src vanished (someone else moved it)."""
        try:
            os.rename(src, dst)
            return True
        except FileNotFoundError:
            return False

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def list_files(self, base: str, ext: str) -> list[str]:
        out = []
        for dirpath, _, files in os.walk(base):
            for f in files:
                if f.endswith(ext):
                    out.append(os.path.join(dirpath, f))
        return sorted(out)

    def list_sizes(self, base: str, ext: str) -> dict[str, int]:
        return {p: os.path.getsize(p) for p in self.list_files(base, ext)}

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def delete_file(self, path: str) -> None:
        os.remove(path)

    def delete_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    def list_dirs(self, base: str) -> list[str]:
        if not os.path.isdir(base):
            return []
        return sorted(
            d for d in os.listdir(base)
            if os.path.isdir(os.path.join(base, d))
        )


class HadoopFS:
    """Hadoop FileSystem bridge (py4j). Needs an active SparkSession — the
    same requirement as every data read/write on a remote table."""

    # schemes whose rename is one atomic namespace operation; everything
    # else (s3a/s3/s3n/gs/oss/wasb/abfs/swift...) emulates rename as
    # copy+delete and must not be trusted for stale-lock breaking
    _ATOMIC_RENAME_SCHEMES = frozenset(
        {"file", "hdfs", "viewfs", "webhdfs", "har", "local"}
    )

    def __init__(self, uri: str):
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"remote table {uri}: metadata I/O needs an active "
                "SparkSession (its Hadoop configuration selects the "
                "filesystem implementation and credentials)"
            )
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create(uri), hconf
        )
        scheme = (self._fs.getUri().getScheme() or "file").lower()
        self.rename_is_atomic = scheme in self._ATOMIC_RENAME_SCHEMES

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def read_text(self, path: str) -> str:
        fs = self._fs
        p = self._path(path)
        if not fs.exists(p):
            raise FileNotFoundError(path)
        stream = fs.open(p)
        # copy server-side: py4j passes byte[] arguments BY VALUE, so a
        # Python-side read(buf) loop would see an unmodified buffer — only
        # byte[] RETURN values cross the bridge correctly
        sink = self._jvm.java.io.ByteArrayOutputStream()
        self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
            stream, sink, 65536, True
        )
        return bytes(sink.toByteArray()).decode("utf-8")

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = self._path(path + f".tmp-{os.getpid()}")
        stream = self._fs.create(tmp, True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        dst = self._path(path)
        # HDFS rename won't clobber; the pointer flip must, so remove first —
        # the one-committer-at-a-time caveat from the module docstring
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        if not self._fs.rename(tmp, dst):
            raise OSError(f"rename {tmp} -> {path} failed")

    def create_exclusive(self, path: str, text: str) -> bool:
        """create(overwrite=False) — atomic create-if-absent on HDFS (the
        NameNode arbitrates); object stores without atomic create degrade
        to best-effort, the module docstring's known caveat."""
        p = self._path(path)
        try:
            stream = self._fs.create(p, False)
        except Exception:  # Py4JJavaError: FileAlreadyExistsException
            return False
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        return True

    def rename(self, src: str, dst: str) -> bool:
        try:
            return bool(self._fs.rename(self._path(src), self._path(dst)))
        except Exception:
            return False

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def list_files(self, base: str, ext: str) -> list[str]:
        return sorted(self.list_sizes(base, ext))

    def list_sizes(self, base: str, ext: str) -> dict[str, int]:
        # one recursive listing RPC: the returned statuses already carry
        # lengths, so sizes cost nothing extra over list_files
        fs = self._fs
        p = self._path(base)
        if not fs.exists(p):
            return {}
        it = fs.listFiles(p, True)  # recursive
        out: dict[str, int] = {}
        while it.hasNext():
            st = it.next()
            uri = st.getPath().toString()
            if uri.endswith(ext):
                out[uri] = st.getLen()
        return out

    def size(self, path: str) -> int:
        p = self._path(path)
        # a Java FileNotFoundException surfaces as an opaque Py4JJavaError,
        # not a Python FileNotFoundError — callers (expire_snapshots on
        # shared-dir candidates) rely on the Python exception contract
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        return self._fs.getFileStatus(p).getLen()

    def delete_file(self, path: str) -> None:
        self._fs.delete(self._path(path), False)

    def delete_dir(self, path: str) -> None:
        self._fs.delete(self._path(path), True)

    def list_dirs(self, base: str) -> list[str]:
        p = self._path(base)
        if not self._fs.exists(p):
            return []
        return sorted(
            st.getPath().getName()
            for st in self._fs.listStatus(p)
            if st.isDirectory()
        )


def fs_for(root: str) -> FS:
    return HadoopFS(root) if is_uri(root) else LocalFS()


@__import__("contextlib").contextmanager
def commit_lock(fs: FS, lock_path: str, ttl_s: float = 60.0):
    """Exclusive commit lock with race-free stale-lock breaking.

    Acquire = atomic create-if-absent. A lock older than ``ttl_s``
    (crashed committer) is broken by RENAMING it to a unique name first —
    rename is atomic, so when several writers see the same stale lock
    exactly ONE wins the rename (and deletes the moved file); the losers'
    renames fail and they re-contend on create. Deleting the stale lock
    directly would let two writers both "break" it and both enter the
    critical section — the lost-update the lock exists to prevent.

    Raises :class:`LockHeld` when the lock is live. Callers catch it and
    surface their own conflict type.
    """
    import json as _json
    import time as _time

    token = _json.dumps({"ts": _time.time(), "pid": os.getpid()})
    if not fs.create_exclusive(lock_path, token):
        try:
            held = _json.loads(fs.read_text(lock_path))
            stale = _time.time() - held.get("ts", 0) > ttl_s
        except (FileNotFoundError, ValueError):
            stale = False  # vanished mid-read: owner released; re-contend
        if stale:
            if not getattr(fs, "rename_is_atomic", True):
                # copy+delete rename (S3A-style): two breakers racing the
                # same stale lock can BOTH "win" and double-commit. Fail
                # loudly — clearing a crashed committer's lock on such a
                # store is an operator action (or a conditional-put
                # catalog's job), never an automatic TTL break.
                raise LockHeld(
                    f"{lock_path}: stale (> {ttl_s}s) but this filesystem's "
                    "rename is copy+delete, so an automatic break could "
                    "double-commit; remove the lock manually or commit "
                    "through a catalog with conditional puts"
                )
            moved = f"{lock_path}.broken-{os.getpid()}-{_time.time_ns()}"
            if fs.rename(lock_path, moved):  # exactly one breaker wins
                try:
                    fs.delete_file(moved)
                except (FileNotFoundError, OSError):
                    pass
        if not fs.create_exclusive(lock_path, token):
            raise LockHeld(lock_path)
    try:
        yield
    finally:
        try:
            fs.delete_file(lock_path)
        except (FileNotFoundError, OSError):
            pass


class LockHeld(RuntimeError):
    """The commit lock is held by a live writer."""
