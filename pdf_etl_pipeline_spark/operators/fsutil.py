"""Hadoop-FileSystem helpers for maintenance operators.

Every layout-maintenance path (index compaction, small-files compaction,
forget-keys partition drops) must run wherever the table lives — local
disk in tests, HDFS or an object store (s3a/gs/abfs) on a cluster. POSIX
`os.walk`/`os.rename`/`shutil.rmtree` only work on the first of those, and
object stores don't even HAVE an atomic directory rename, so any design
that relies on one is wrong at scale by construction.

These helpers route through `org.apache.hadoop.fs.FileSystem` (the same
abstraction Spark's own committers use): the scheme of the path picks the
implementation, so `file:/...`, `hdfs://...` and `s3a://...` all behave.
Listing happens driver-side — exactly like Spark's own file-index listing
— and is bounded by directory fan-out, not data volume.

Design rule for the callers: no renames, ever. Maintenance rewrites are
**append-then-prune** — write replacement files alongside the old ones
(through the normal committer), then delete the old files individually.
A crash between the two steps leaves DUPLICATE rows, which every consumer
of these layouts tolerates by construction (dedup-style semantics), never
missing or half-written data. A table format's transactional commit
subsumes this at cluster scale; append-then-prune is its portable,
format-free shadow.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _require_spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("fsutil requires an active SparkSession (Hadoop FS access)")
    return s


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) pair for ``path`` — scheme-dispatched."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _is_hidden(name: str) -> bool:
    # Spark's file-index convention: _ and . prefixed entries are metadata
    # (_SUCCESS, ._committed, .crc) and never data.
    return name.startswith(("_", "."))


def list_data_files(path: str, spark: SparkSession | None = None) -> list[tuple[str, int]]:
    """Recursive ``[(uri, length)]`` of the data files under ``path``
    (hidden/metadata entries skipped at every level). Empty when the
    directory does not exist."""
    spark = _require_spark(spark)
    fs, jpath = _fs_path(spark, path)
    if not fs.exists(jpath):
        return []
    out: list[tuple[str, int]] = []
    stack = [jpath]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            name = st.getPath().getName()
            if _is_hidden(name):
                continue
            if st.isDirectory():
                stack.append(st.getPath())
            else:
                out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def list_subdirs(path: str, spark: SparkSession | None = None) -> list[str]:
    """Immediate non-hidden subdirectory URIs of ``path`` (e.g. the
    ``band=K`` partition directories of a partitioned layout)."""
    spark = _require_spark(spark)
    fs, jpath = _fs_path(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(
        st.getPath().toString()
        for st in fs.listStatus(jpath)
        if st.isDirectory() and not _is_hidden(st.getPath().getName())
    )


def exists(path: str, spark: SparkSession | None = None) -> bool:
    spark = _require_spark(spark)
    fs, jpath = _fs_path(spark, path)
    return bool(fs.exists(jpath))


def delete(path: str, recursive: bool = False, spark: SparkSession | None = None) -> bool:
    """Delete a file (or, with ``recursive``, a directory tree). On object
    stores this is the cheap primitive — unlike rename, which is a
    copy+delete there. Returns False when the path was already gone."""
    spark = _require_spark(spark)
    fs, jpath = _fs_path(spark, path)
    return bool(fs.delete(jpath, recursive))


def write_text(
    path: str,
    text: str,
    spark: SparkSession | None = None,
    overwrite: bool = False,
) -> None:
    """Write a small text file (a manifest, a marker) through the Hadoop
    FS — scheme-portable like everything else here. Not atomic across
    bytes on every store; callers must treat the file as write-once
    (create at layout birth, never mutate) or guard with their own
    commit ordering."""
    spark = _require_spark(spark)
    fs, jpath = _fs_path(spark, path)
    out = fs.create(jpath, overwrite)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(path: str, spark: SparkSession | None = None) -> str:
    spark = _require_spark(spark)
    fs, jpath = _fs_path(spark, path)
    stream = fs.open(jpath)
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def data_file_count(path: str, spark: SparkSession | None = None) -> int:
    """Number of data files under ``path`` (the fragmentation metric the
    compaction thresholds are written against)."""
    return len(list_data_files(path, spark))


def dir_bytes(path: str, spark: SparkSession | None = None) -> int:
    """Total data bytes under ``path`` — drives target output-file counts
    (``ceil(bytes / target_bytes)``), measured, not guessed."""
    return sum(length for _, length in list_data_files(path, spark))
