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
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{gen_dir}/{t}.parquet')"
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
