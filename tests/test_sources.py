

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
