"""Filesystem abstraction for LakeTable control-plane I/O.

Data-plane reads/writes (the parquet segments themselves) always go through
Spark, which already speaks every Hadoop-compatible filesystem. What needs
an explicit abstraction is the *control plane*: manifest listing/reading,
the atomic commit, hive-dir enumeration, vacuum deletes, and the
driver-side pyarrow appends for KB-sized system rows.

Two implementations:

* ``LocalFS`` — plain ``os`` calls; the commit CAS is create-via-hard-link
  (``os.link`` fails with EEXIST if the version file already exists), which
  is atomic on POSIX filesystems.
* ``HadoopFS`` — the JVM Hadoop ``FileSystem`` API through the active
  SparkSession, so any filesystem Spark can read (hdfs://, s3a://,
  abfss://, file://) works without new Python dependencies. The commit CAS
  is ``FileSystem.create(path, overwrite=false)``:

  - HDFS / ABFS: atomic create-if-absent — a true CAS.
  - S3A: create-if-absent is check-then-put and NOT atomic on older
    Hadoop/S3; on Hadoop 3.4.1+ enable S3 conditional writes
    (``fs.s3a.create.conditional.enabled``) to make it a real
    conditional-put, or front the commit with a coordination service the
    way Delta's S3 LogStore does. The manifest protocol itself is the
    same one Delta/Iceberg use (one immutable file per version, loser of
    the race must retry), so swapping the primitive is localized here.

``fs_for_path`` picks the implementation from the path: URIs with a scheme
go to HadoopFS, bare paths to LocalFS.
"""

from __future__ import annotations

import io
import os
import re
import shutil
import uuid

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


class LocalFS:
    """Driver-local POSIX filesystem (the test/sandbox default)."""

    def listdir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []
        return sorted(os.listdir(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def read_text(self, path: str) -> str:
        with open(path, "r") as fh:
            return fh.read()

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def put_bytes(self, path: str, data: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(data)

    def create_exclusive(self, path: str, text: str) -> None:
        """Atomic create-if-absent: write a temp file, hard-link it to the
        final name (fails with FileExistsError if present), drop the temp."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(text)
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def mtime(self, path: str) -> float:
        """Last-modification unix time of a file or directory."""
        return os.path.getmtime(path)

    def delete_tree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def delete_file(self, path: str) -> None:
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


def _is_java_fnf(exc) -> bool:
    """True if a Py4JJavaError wraps java.io.FileNotFoundException anywhere
    in its cause chain (HDFS surfaces it directly; S3A/ABFS sometimes nest
    it under a RemoteException / wrapped IOException)."""
    je = getattr(exc, "java_exception", None)
    for _ in range(8):  # cause chains are short; bound against cycles
        if je is None:
            return False
        if "FileNotFoundException" in je.getClass().getName():
            return True
        je = je.getCause()
    return False


class HadoopFS:
    """Hadoop FileSystem API via the active SparkSession's JVM — one
    implementation for every scheme Spark itself supports. Control-plane
    calls are a handful per run, so py4j round-trip cost is irrelevant.

    Missing-path errors are translated to the same Python semantics LocalFS
    has (FileNotFoundError from read_bytes, [] from listdir, False from
    isdir): WatermarkStore.latest()'s re-read retry and _compact's
    concurrent-fold guard key on FileNotFoundError, so an untranslated
    Py4JJavaError from a concurrently-compacted segment would resurrect the
    read-vs-compaction race on scheme-qualified roots."""

    def __init__(self, spark, base_uri: str) -> None:
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(base_uri).getFileSystem(self._conf)

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def listdir(self, path: str) -> list[str]:
        from py4j.protocol import Py4JJavaError

        p = self._path(path)
        try:
            if not self._fs.exists(p):
                return []
            return sorted(st.getPath().getName() for st in self._fs.listStatus(p))
        except Py4JJavaError as e:
            if _is_java_fnf(e):  # deleted between exists() and listStatus()
                return []
            raise

    def isdir(self, path: str) -> bool:
        from py4j.protocol import Py4JJavaError

        p = self._path(path)
        try:
            return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())
        except Py4JJavaError as e:
            if _is_java_fnf(e):  # deleted between exists() and getFileStatus()
                return False
            raise

    def read_bytes(self, path: str) -> bytes:
        from py4j.protocol import Py4JJavaError

        try:
            stream = self._fs.open(self._path(path))
        except Py4JJavaError as e:
            if _is_java_fnf(e):
                raise FileNotFoundError(path) from None
            raise
        out = self._jvm.java.io.ByteArrayOutputStream()
        self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, True)
        return bytes(out.toByteArray())

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def put_bytes(self, path: str, data: bytes) -> None:
        st = self._fs.create(self._path(path), True)
        st.write(bytearray(data))
        st.close()

    def create_exclusive(self, path: str, text: str) -> None:
        from py4j.protocol import Py4JJavaError

        try:
            st = self._fs.create(self._path(path), False)
        except Py4JJavaError as e:  # FileAlreadyExistsException -> CAS loss
            name = e.java_exception.getClass().getName()
            if "AlreadyExists" in name or "FileAlreadyExists" in name:
                raise FileExistsError(path) from None
            raise
        st.write(bytearray(text.encode("utf-8")))
        st.close()

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._path(path))

    def mtime(self, path: str) -> float:
        """Last-modification unix time (Hadoop reports millis)."""
        return self._fs.getFileStatus(self._path(path)).getModificationTime() / 1000.0

    def delete_tree(self, path: str) -> None:
        self._fs.delete(self._path(path), True)

    def delete_file(self, path: str) -> None:
        self._fs.delete(self._path(path), False)


def fs_for_path(spark, path: str):
    """HadoopFS for scheme-qualified URIs (hdfs://, s3a://, file://, ...),
    LocalFS for bare paths."""
    if _SCHEME_RE.match(path):
        return HadoopFS(spark, path)
    return LocalFS()
