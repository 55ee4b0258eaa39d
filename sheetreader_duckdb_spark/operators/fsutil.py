"""Directory operations that work on any Hadoop-supported filesystem.

The corpus-lifecycle operators (merge, export recovery) need a handful of
metadata operations — exists / rename / delete / glob — on the directories
Spark just wrote. ``os`` / ``shutil`` only reach the driver's local disk;
a 100 TB corpus lives on HDFS or object storage. These helpers route every
path that carries a URI scheme (``file:``, ``hdfs:``, ``s3a:``, ...)
through the JVM's ``org.apache.hadoop.fs.FileSystem`` — the same API
Spark's own committers use — and keep plain ``os`` calls as the fast path
for scheme-less local paths.

Semantics notes (they differ between the two backends and matter to
callers):

* ``rename(src, dst)`` here REQUIRES that ``dst`` not exist and raises if
  it does. Hadoop's ``FileSystem.rename`` would otherwise move ``src``
  INSIDE an existing ``dst`` directory (POSIX ``mv`` semantics), while
  ``os.replace`` would clobber it — the precondition makes both backends
  agree and forces callers into an explicit rename-away-then-rename-in
  protocol (see operators/merge.py's shard swap).
* Object stores without native rename (S3) implement ``rename`` as
  copy+delete — not atomic, but the merge swap protocol only relies on
  each individual rename completing, never on atomicity across shards.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import shutil

from pyspark.sql import SparkSession

__all__ = [
    "has_scheme",
    "exists",
    "rename",
    "delete",
    "glob_dirs",
    "write_text",
    "read_text",
]

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def has_scheme(path: str) -> bool:
    """True when ``path`` is a URI (``file:/...``, ``s3a://...``) that must
    go through the Hadoop FileSystem API rather than ``os``."""
    return bool(_SCHEME_RE.match(path))


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def exists(spark: SparkSession, path: str) -> bool:
    if not has_scheme(path):
        return os.path.exists(path)
    fs, jpath, _ = _fs(spark, path)
    return bool(fs.exists(jpath))


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """Move ``src`` to ``dst``. ``dst`` must not already exist (raises
    ``FileExistsError``); raises ``OSError`` if the move fails."""
    if exists(spark, dst):
        raise FileExistsError(f"rename target already exists: {dst}")
    if not has_scheme(src) and not has_scheme(dst):
        os.replace(src, dst)
        return
    fs, jsrc, jvm = _fs(spark, src)
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(jsrc, jdst):
        raise OSError(f"Hadoop FileSystem rename failed: {src} -> {dst}")


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    """Remove ``path`` (missing path is a no-op). Returns True if removed."""
    if not has_scheme(path):
        if not os.path.exists(path):
            return False
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
        return True
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file with publish-by-rename visibility.

    The content lands at ``<path>.writing`` first and is renamed into
    place, so a reader never observes a half-written ``path``: single-FILE
    rename is atomic on POSIX and HDFS, and on S3-like stores the final
    object appears with a single PUT-copy. Used for intent/journal markers
    (streaming/corpus.py compaction plan) — crash mid-write leaves only
    the ``.writing`` scratch, which ``read_text`` never looks at.

    Overwrite caveat: on the local fast path the publish is an atomic
    clobber (``os.replace``), so a reader of an EXISTING path always sees
    old-or-new content. On the Hadoop-API path, overwrite is
    delete-then-rename — a crash in between leaves the path briefly
    missing (old content gone, new copy still in scratch). The compaction
    journal never overwrites a live plan, so that window is unreachable
    there; callers that rewrite markers on object stores should treat
    absent-after-crash as "retry from scratch".
    """
    scratch = f"{path}.writing"
    if not has_scheme(path):
        with open(scratch, "w", encoding="utf-8") as f:
            f.write(text)
        os.replace(scratch, path)
        return
    fs, jscratch, jvm = _fs(spark, scratch)
    out = fs.create(jscratch, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    delete(spark, path)
    rename(spark, scratch, path)


def read_text(spark: SparkSession, path: str) -> str | None:
    """Content of a small text file, or None if it does not exist."""
    if not exists(spark, path):
        return None
    if not has_scheme(path):
        with open(path, encoding="utf-8") as f:
            return f.read()
    fs, jpath, jvm = _fs(spark, path)
    stream = fs.open(jpath)
    try:
        # One JVM-side drain (InputStream.read() per byte would be one
        # py4j round trip per byte).
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, False)
        return bytes(baos.toByteArray()).decode("utf-8")
    finally:
        stream.close()


def glob_dirs(spark: SparkSession, pattern: str) -> list[str]:
    """Paths matching a glob ``pattern`` (one directory level of ``*``),
    as strings in the same form (local path or URI) as the pattern."""
    if not has_scheme(pattern):
        return sorted(_glob.glob(pattern))
    fs, jpat, _ = _fs(spark, pattern)
    statuses = fs.globStatus(jpat)
    if statuses is None:
        return []
    return sorted(s.getPath().toString() for s in statuses)
