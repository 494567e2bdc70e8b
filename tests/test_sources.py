

"""Source-layer tests: worker package shipping."""

from __future__ import annotations

import os


def test_ensure_package_concurrent_builds_valid_zip():
    """ADVICE r3/r4 latent: parallel drivers rebuilding the worker zip
    must each write a private tmp (pid+monotonic suffix) and os.replace
    it in — concurrent rebuilds always leave one valid, complete zip and
    no stray tmp files. Races the zip BUILD only (the latent's subject);
    addPyFile itself is per-driver-process in real parallel sessions."""
    import threading
    import zipfile

    from oracle_duckdb_sync_spark.sources import testdata as TD

    pkg_dir = os.path.dirname(os.path.abspath(TD.__file__))
    repo_root = os.path.dirname(os.path.dirname(pkg_dir))
    zip_path = os.path.join(repo_root, ".pkg", "oracle_duckdb_sync_spark.zip")

    errs = []

    def rebuild():
        try:
            # force the rebuild branch each time (stale zip mtime)
            if os.path.exists(zip_path):
                os.utime(zip_path, (0, 0))
            TD._ensure_pkg_zip()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=rebuild) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    with zipfile.ZipFile(zip_path) as zf:
        assert zf.testzip() is None
        assert any(n.endswith("sources/testdata.py") for n in zf.namelist())
    stray = [f for f in os.listdir(os.path.dirname(zip_path)) if ".tmp-" in f]
    assert stray == []


def test_fs_probes_local_and_hadoop_branches(spark, tmp_path):
    """fs.py existence probes: local fast path, file: URI handling, the
    parquet-dir predicate (empty dir is not a table), and the JVM
    Hadoop branch itself driven through a file:// URI."""
    from oracle_duckdb_sync_spark.sources import fs

    d = tmp_path / "t"
    d.mkdir()
    # empty dir: exists, but not a parquet table
    assert fs.fs_exists(spark, str(d))
    assert not fs.parquet_dir_exists(spark, str(d))
    (d / "part-000.parquet").write_bytes(b"")
    assert fs.parquet_dir_exists(spark, str(d))
    assert fs.parquet_dir_exists(spark, "file:" + str(d))
    assert not fs.fs_exists(spark, str(tmp_path / "missing"))
    # remote-looking URIs route through Hadoop; file:// exercises the
    # same JVM code path s3a/hdfs would take
    hfs, jpath = fs._hadoop_fs(spark, "file://" + str(d))
    assert hfs.exists(jpath)
    assert fs._looks_remote("s3a://bucket/corpus")
    assert fs._looks_remote("hdfs://nn/corpus")
    assert not fs._looks_remote("/local/path")
    assert not fs._looks_remote("file:///local/path")
