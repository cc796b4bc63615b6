"""Hadoop-FS helper behavior (qfilter_spark.fsutil)."""

import os
import time

from qfilter_spark import fsutil


def test_exists_isdir_delete_roundtrip(spark, tmp_path):
    d = tmp_path / "adir"
    d.mkdir()
    (d / "f.txt").write_text("x")
    p = str(d)
    assert fsutil.exists(spark, p) and fsutil.is_dir(spark, p)
    assert not fsutil.is_dir(spark, str(d / "f.txt"))
    assert fsutil.delete(spark, p)          # recursive
    assert not fsutil.exists(spark, p)
    assert fsutil.delete(spark, p)          # already gone -> True, no raise


def test_list_entries(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "file.bin").write_bytes(b"abc")
    entries = {name: (mtime, isdir)
               for name, mtime, isdir in fsutil.list_entries(spark, str(tmp_path))}
    assert entries["sub"][1] is True
    assert entries["file.bin"][1] is False
    assert abs(entries["file.bin"][0] - time.time()) < 3600
    assert fsutil.list_entries(spark, str(tmp_path / "nope")) == []


def test_content_stamp_tracks_rewrites(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).write.parquet(p)
    files = spark.read.parquet(p).inputFiles()
    s1 = fsutil.content_stamp(spark, files)
    assert fsutil.content_stamp(spark, files) == s1      # stable
    spark.range(20).write.mode("overwrite").parquet(p)
    files2 = spark.read.parquet(p).inputFiles()
    s2 = fsutil.content_stamp(spark, files2)
    assert s2 != s1                                      # rewrite seen
    # same file set, touched mtime -> stamp moves even with equal names
    target = [f for f in files2 if f.endswith(".parquet")][0]
    local = target[len("file:"):] if target.startswith("file:") else target
    future = time.time() + 10
    os.utime(local, (future, future))
    assert fsutil.content_stamp(spark, files2) != s2


def test_content_stamp_empty_and_degraded(spark, tmp_path):
    assert fsutil.content_stamp(spark, []) == fsutil.content_stamp(spark, [])
    # beyond max_dirs the stamp degrades to the path list (documented)
    fake = [f"/nope/dir{i}/part-{i}.parquet" for i in range(5)]
    a = fsutil.content_stamp(spark, fake, max_dirs=2)
    assert a == fsutil.content_stamp(spark, fake, max_dirs=2)


def test_child_join():
    assert fsutil.child("s3a://b/x", "y") == "s3a://b/x/y"
    assert fsutil.child("s3a://b/x/", "y") == "s3a://b/x/y"


def test_content_stamp_per_directory_names(spark, tmp_path):
    """Round-5 review: an unrelated file in dir A sharing a basename with
    an input file from dir B must not perturb the stamp."""
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(); db.mkdir()
    (da / "part-0.parquet").write_bytes(b"x")
    (db / "part-1.parquet").write_bytes(b"y")
    files = [f"file:{da}/part-0.parquet", f"file:{db}/part-1.parquet"]
    s1 = fsutil.content_stamp(spark, files)
    # unrelated file in da named like db's input
    (da / "part-1.parquet").write_bytes(b"unrelated")
    assert fsutil.content_stamp(spark, files) == s1
    # touching a REAL input still moves the stamp
    future = time.time() + 10
    os.utime(da / "part-0.parquet", (future, future))
    assert fsutil.content_stamp(spark, files) != s1
