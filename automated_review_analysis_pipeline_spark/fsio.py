"""FS-agnostic sidecar I/O for persisted stores.

Every persisted store in this engine (simjoin index, IVF-PQ index,
sorted_export layout, training-shard delivery) writes its DATA parts
through ``spark.read``/``spark.write`` -- which route through the
Hadoop ``FileSystem`` abstraction and therefore work unchanged on
``file:``, ``hdfs://``, ``s3a://``, ``gs://``, ``abfs://``, ...  The
small JSON *sidecars* (``meta.json`` / ``manifest.json``) used to go
through POSIX ``open()``, which hard-crashes the moment ``store_dir``
is anything but a bare local path -- the only place a 100-TB index can
actually live.  This module gives the sidecars the same portability as
the data: all bytes go through the JVM Hadoop ``FileSystem`` API
resolved from the session's ``hadoopConfiguration``, so whatever
filesystems the cluster's Spark build can read parquet from, it can
read and write sidecars on.

Write discipline: sidecars are written to a ``<name>.__tmp__`` sibling
first and then renamed into place, and every store writes its sidecar
*last*, after all data parts have committed.  A build that crashes
midway therefore leaves NO sidecar, and every reader's first touch is
the sidecar -- so a half-written store fails fast with a clear
"missing meta.json" error instead of serving partial data.  (Hadoop
``rename`` is atomic on HDFS and a plain ``mv`` on the local FS;
object stores degrade to copy+delete, which is still
last-step-visible.)
"""
from __future__ import annotations

from pyspark.sql import SparkSession

_COPY_BUF = 65536


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for *path* under the session's Hadoop conf.

    Client-side CRC sidecars are disabled: the local ChecksumFileSystem
    would otherwise shadow every sidecar with a ``.name.crc`` file, and
    any EXTERNAL edit of the JSON (a user hand-fixing a manifest, a
    test corrupting one on purpose) would then fail reads with
    ChecksumException instead of the store's own validation error.
    Sidecars are tiny and validated at the application layer
    (shard fingerprints, schema checks); HDFS keeps its server-side
    block checksums regardless."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.setWriteChecksum(False)
    fs.setVerifyChecksum(False)
    return fs, jpath, jvm


def exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _fs_path(spark, path)
    return bool(fs.exists(jpath))


def write_bytes(spark: SparkSession, path: str, data: bytes) -> None:
    """Atomically (temp + rename) write *data* to *path* on whatever
    filesystem the path's scheme resolves to."""
    fs, jpath, jvm = _fs_path(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".__tmp__")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if fs.exists(jpath):
        fs.delete(jpath, False)
    if not fs.rename(tmp, jpath):
        raise IOError(f"rename {path}.__tmp__ -> {path} failed")


def read_bytes(spark: SparkSession, path: str) -> bytes:
    fs, jpath, jvm = _fs_path(spark, path)
    inp = fs.open(jpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    # copyBytes(close=True) closes BOTH streams, even on error
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(inp, baos, _COPY_BUF, True)
    return bytes(baos.toByteArray())


def write_text(spark: SparkSession, path: str, text: str) -> None:
    write_bytes(spark, path, text.encode("utf-8"))


def read_text(spark: SparkSession, path: str) -> str:
    return read_bytes(spark, path).decode("utf-8")


def write_json(spark: SparkSession, path: str, obj, **kw) -> None:
    import json

    write_text(spark, path, json.dumps(obj, **kw))


def read_json(spark: SparkSession, path: str):
    import json

    return json.loads(read_text(spark, path))


def join(base: str, name: str) -> str:
    """Scheme-preserving path join (os.path.join would mangle
    ``s3a://bucket/dir`` on Windows and is semantically wrong for
    URIs; Hadoop Path treats '/' uniformly)."""
    return base.rstrip("/") + "/" + name
