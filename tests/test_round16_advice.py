"""Round-16 ADVICE fixes:

* the no-fork local FS shim (fs.file.impl + extraClassPath) and the
  FileSystem-based checkpoint manager are injected ONLY when the
  resolved master is local -- a cluster master keeps Spark's defaults
  (executors would lack the driver-local classpath; FileContext's
  atomic rename matters on HDFS/S3A checkpoint volumes);
* NoForkRawLocalFileSystem.setPermission falls back to stock Hadoop
  for modes carrying setuid/setgid/sticky bits (no PosixFilePermission
  mapping -- the java.nio path would silently drop them);
* build_simjoin_index's empty-corpus path ranks the (empty) prefix
  against the in-plan dfreq frame instead of re-reading the
  just-written empty parquet (an engine-version assumption about
  zero-partition writes emitting a schema-bearing file).
"""
from __future__ import annotations

import os
import stat

from pyspark.sql import functions as F

from automated_review_analysis_pipeline_spark import fsio, session
from automated_review_analysis_pipeline_spark.operators import dedup
from automated_review_analysis_pipeline_spark.sources.tables import load_table

CKPT_KEY = "spark.sql.streaming.checkpointFileManagerClass"


def test_local_master_gets_local_fs_defaults():
    confs = session.resolve_confs("local[4]")
    assert confs[CKPT_KEY] == session._FS_CKPT_MGR
    # the shim classes are committed (and compiled) in this repo, so
    # the local resolution wires fs.file.impl + both classpaths
    assert confs.get("spark.hadoop.fs.file.impl") \
        == session._NOFORK_FS_CLASS
    assert confs.get("spark.driver.extraClassPath")


def test_cluster_master_keeps_spark_defaults():
    for master in ("spark://host:7077", "yarn", "k8s://https://api:6443"):
        confs = session.resolve_confs(master)
        # "" means get_spark skips the key -> Spark's own default
        assert confs[CKPT_KEY] == ""
        assert "spark.hadoop.fs.file.impl" not in confs
        assert "spark.driver.extraClassPath" not in confs
        assert "spark.executor.extraClassPath" not in confs


def test_env_overrides_beat_the_master_gate(monkeypatch):
    # explicit opt-OUT locally
    monkeypatch.setenv("SPARK_GRAFT_CKPT_MGR", "")
    assert session.resolve_confs("local[2]")[CKPT_KEY] == ""
    # explicit opt-IN on a cluster master
    monkeypatch.setenv("SPARK_GRAFT_CKPT_MGR", "com.example.Mgr")
    assert session.resolve_confs("yarn")[CKPT_KEY] == "com.example.Mgr"
    monkeypatch.delenv("SPARK_GRAFT_CKPT_MGR")
    monkeypatch.setenv("SPARK_GRAFT_NOFORK_FS", "")
    assert "spark.hadoop.fs.file.impl" \
        not in session.resolve_confs("local[2]")


def test_nofork_shim_preserves_non_rwx_bits(spark, tmp_path):
    """A mode with the sticky bit set must reach the file -- the
    java.nio lane cannot express it, so the shim defers to stock
    Hadoop (chmod) for any mode with bits above 0777."""
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName("arapshim.NoForkRawLocalFileSystem")
    except Exception:
        import pytest

        pytest.skip("shim not on this JVM's classpath")
    fs = jvm.arapshim.NoForkRawLocalFileSystem()
    fs.initialize(jvm.java.net.URI("file:///"),
                  spark.sparkContext._jsc.hadoopConfiguration())
    target = tmp_path / "sticky_dir"
    target.mkdir()
    jpath = jvm.org.apache.hadoop.fs.Path(str(target))
    perm = jvm.org.apache.hadoop.fs.permission.FsPermission.valueOf(
        "drwxrwxrwt")  # 1777: sticky bit + rwx for all
    fs.setPermission(jpath, perm)
    mode = os.stat(target).st_mode
    assert mode & stat.S_ISVTX, "sticky bit was dropped"
    assert stat.S_IMODE(mode) & 0o777 == 0o777
    # and the plain-rwx lane still applies exact bits in-process
    perm2 = jvm.org.apache.hadoop.fs.permission.FsPermission.valueOf(
        "drwxr-x---")
    fs.setPermission(jpath, perm2)
    assert stat.S_IMODE(os.stat(target).st_mode) == 0o750


def test_empty_build_then_append_equals_one_shot(spark, sf_dir, tmp_path):
    """The stream-start shape: build an EMPTY store (zero-partition
    typed writes, prefix ranked against the in-plan dfreq frame), then
    append the whole corpus -- pairs equal the one-shot join."""
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").where(F.col("doc_id") < 120)
    store = str(tmp_path / "sj_empty")
    dedup.build_simjoin_index(docs.limit(0), store, threshold=0.5,
                              n_buckets=4)
    meta = fsio.read_json(spark, store + "/meta.json")
    assert "tok" in meta["prefix_cols"] and "sz" in meta["prefix_cols"]
    dedup.simjoin_append(spark, store, docs, batch_id=0)
    want = sorted(
        tuple(r) for r in
        dedup.set_similarity_join(docs, threshold=0.5).collect())
    got = sorted(
        tuple(r) for r in
        spark.read.parquet(store + "/pairs")
        .select("a_id", "b_id", "n_common", "jaccard").collect())
    assert got == want
