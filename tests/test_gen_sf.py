"""Generator-fidelity gate for tools/gen_sf.py.

The self-run sf1 differential is only meaningful if the generated data
exercises the same filter paths as the driver's testdata — round 7
found that `p_name = 'part N'` and a 1..120-day ship delay made q9's
'%widget%', q20's 'cold%', and q21's 1000-day-lateness contracts
select ZERO rows at self-generated SFs (a 0=0 "match" that verifies
nothing). These tests pin the recipe properties those contracts
depend on, on a tiny in-process generation (no Spark needed).
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gensf") / "sf0.002")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_sf.py"), "0.002", out],
        check=True,
        capture_output=True,
    )
    return out


def _q(gen_dir, sql):
    con = duckdb.connect()
    for t in ("part", "orders", "lineitem", "supplier"):
        p = f"{gen_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con.sql(sql).fetchall()


def test_part_names_use_driver_vocabulary(gen_dir):
    rows = _q(
        gen_dir,
        "SELECT count(*) FILTER (p_name LIKE '%widget%'),"
        "       count(*) FILTER (p_name LIKE 'cold%'), count(*) FROM part",
    )
    widget, cold, total = rows[0]
    assert widget > 0 and cold > 0
    # adjective-noun pairs only: every name is two known words
    bad = _q(
        gen_dir,
        "SELECT count(*) FROM part WHERE len(string_split(p_name, ' ')) <> 2",
    )
    assert bad[0][0] == 0 and total > 0


def test_multifile_layout_roundtrip(tmp_path):
    """VERDICT r12 #1: tables past the threshold are written as a
    DIRECTORY of part files with bounded row groups (so a scan
    parallelizes like a production table), and the layout change is
    lossless — the globbed read returns exactly the original rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_sf

    n = 600_000
    tbl = pa.table({"a": np.arange(n, dtype=np.int64)})
    p = str(tmp_path / "t.parquet")
    n_parts = gen_sf._write(tbl, p)
    assert n_parts == gen_sf._N_FILES and os.path.isdir(p)
    files = sorted(os.listdir(p))
    assert len(files) == gen_sf._N_FILES
    for f in files:
        md = pq.ParquetFile(os.path.join(p, f)).metadata
        assert md.num_row_groups >= 1
        for i in range(md.num_row_groups):
            assert md.row_group(i).num_rows <= gen_sf._ROWS_PER_GROUP
    got = duckdb.sql(
        f"SELECT count(*), sum(a), min(a), max(a) "
        f"FROM read_parquet('{p}/*.parquet')"
    ).fetchone()
    assert got == (n, n * (n - 1) // 2, 0, n - 1)
    # a small table stays a single file with bounded row groups
    small = pa.table({"a": np.arange(200_000, dtype=np.int64)})
    sp = str(tmp_path / "s.parquet")
    assert gen_sf._write(small, sp) == 1 and os.path.isfile(sp)
    md = pq.ParquetFile(sp).metadata
    assert md.num_row_groups == 2  # 200k rows / 131072-row groups


def test_write_layout_transitions(tmp_path):
    """ADVICE r13: re-running the generator over a previous run's output
    must be clean in BOTH directions — a table shrinking below the
    multi-file threshold replaces its old DIRECTORY with a file, and a
    re-written directory carries no stale part files from a prior
    (differently-split) run."""
    import numpy as np
    import pyarrow as pa

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_sf

    p = str(tmp_path / "t.parquet")
    big = pa.table({"a": np.arange(600_000, dtype=np.int64)})
    gen_sf._write(big, p)
    assert os.path.isdir(p)
    # dir → file: shrink below the threshold
    small = pa.table({"a": np.arange(1_000, dtype=np.int64)})
    assert gen_sf._write(small, p) == 1 and os.path.isfile(p)
    got = duckdb.sql(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()
    assert got == (1_000,)
    # file → dir again, then re-write with a stale extra part present:
    # the glob must see only the fresh parts
    gen_sf._write(big, p)
    stale = os.path.join(p, "part-00099.parquet")
    pq_small = pa.table({"a": np.arange(5, dtype=np.int64)})
    import pyarrow.parquet as pq

    pq.write_table(pq_small, stale)
    gen_sf._write(big, p)
    assert not os.path.exists(stale)
    got = duckdb.sql(
        f"SELECT count(*), sum(a) FROM read_parquet('{p}/*.parquet')"
    ).fetchone()
    assert got == (600_000, 600_000 * 599_999 // 2)


def test_order_status_three_valued(gen_dir):
    statuses = {r[0] for r in _q(gen_dir, "SELECT DISTINCT o_orderstatus FROM orders")}
    assert statuses == {"F", "O", "P"}


def test_shipdate_independent_with_late_tail(gen_dir):
    # the q21 predicate (1000-day delay on an F order) must select rows,
    # and delays must include negatives (independent draw, like the
    # driver's) — a +1..120-day additive delay fails both
    late, neg, n = _q(
        gen_dir,
        "SELECT count(*) FILTER (epoch_us(l_shipdate) - epoch_us(o_orderdate)"
        "                        >= 86400000000000::BIGINT"
        "                        AND o_orderstatus = 'F'),"
        "       count(*) FILTER (l_shipdate < o_orderdate), count(*)"
        " FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey",
    )[0]
    assert late > 0
    assert neg > 0
    # midnight-aligned shipdates (driver convention)
    off = _q(
        gen_dir,
        "SELECT count(*) FROM lineitem WHERE epoch_us(l_shipdate) % 86400000000 <> 0",
    )
    assert off[0][0] == 0 and n > 0
