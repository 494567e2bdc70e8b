#!/usr/bin/env python
"""Generate builder-owned synthetic tables with the same schema/recipe
shape as the driver's /root/testdata (TESTDATA.md), at an arbitrary
scale factor — used for the self-run sf1 differential (SCALE.md).

NEVER writes to /root/testdata; default output is
/root/repo/.localdata/sf{SF}/ (gitignored).

Usage: python tools/gen_sf.py [sf] [outdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# recipe constants mirrored from the driver's testdata distributions
EVENT_TYPES = np.array(["click", "error", "purchase", "signup", "view"])
MKTSEGMENTS = np.array(
    ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
)
ORDERSTATUS = np.array(["F", "O", "P"])
# p_name mirrors the driver's adjective-noun vocabulary (64 distinct
# names) so name-prefix/substring contracts (q9 '%widget%', q20 'cold%')
# stay non-degenerate at self-generated SFs
PNAME_ADJ = np.array(["blue", "old", "small", "new", "large", "hot", "cold", "red"])
PNAME_NOUN = np.array(
    ["widget", "anvil", "ring", "gear", "gizmo", "bolt", "rod", "plate"]
)
PTYPES = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"])
PRIORITIES = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
RETURNFLAGS = np.array(["A", "N", "R"])
LINESTATUS = np.array(["F", "O"])
LANGS = np.array(["en", "de", "es", "fr", "zh"])
LANG_P = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
VOCAB = (
    "spark table query scan filter join group agg sort hash key value "
    "column row batch stream part order line customer vector fast slow "
    "small large index cache merge split count sum"
).split()


def _ts_us(lo: str, hi: str, n: int, rng) -> np.ndarray:
    a = np.datetime64(lo).astype("datetime64[us]").astype(np.int64)
    b = np.datetime64(hi).astype("datetime64[us]").astype(np.int64)
    return rng.integers(a, b, n)


def gen_events(n: int, n_users: int, rng) -> pa.Table:
    ts = np.sort(_ts_us("2024-01-01", "2024-01-31", n, rng))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, n)),
            "event_type": pa.array(rng.choice(EVENT_TYPES, n)),
            "value": pa.array(
                np.round(np.abs(rng.normal(50, 30, n)) + rng.random(n) * 0.01, 2)
            ),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]
            ),
        }
    )


def gen_orders_lineitem(n_orders: int, n_cust: int, n_part: int, n_supp: int, rng):
    odate = _ts_us("1995-01-01", "2001-08-02", n_orders, rng)
    odate = (odate // 86_400_000_000) * 86_400_000_000  # midnight-aligned
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n_orders, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_orders)),
            "o_orderstatus": pa.array(rng.choice(ORDERSTATUS, n_orders)),
            "o_totalprice": pa.array(
                np.round(rng.uniform(1000, 400000, n_orders), 2)
            ),
            "o_orderdate": pa.array(odate, type=pa.timestamp("us")),
            "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_orders)),
        }
    )
    # ~4 lines per order, 1..7
    nlines = rng.integers(1, 8, n_orders)
    okey = np.repeat(np.arange(n_orders, dtype=np.int64), nlines)
    n = okey.size
    linenum = (
        np.arange(n, dtype=np.int64)
        - np.repeat(np.cumsum(nlines) - nlines, nlines)
        + 1
    )
    # shipdate is an INDEPENDENT midnight-aligned draw over its own
    # window, like the driver's recipe (corr(ship, order) ~ 0 in the
    # driver data; delays span roughly -1250..+2160 days) — so the
    # lateness-predicate contracts (q12's 21-day, q21's 1000-day
    # threshold) see the same tail mass at self-generated SFs
    ship = _ts_us("1995-01-02", "2001-11-04", n, rng)
    ship = (ship // 86_400_000_000) * 86_400_000_000
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(okey),
            "l_partkey": pa.array(rng.integers(0, n_part, n)),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n)),
            "l_linenumber": pa.array(linenum.astype(np.int32)),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n), 2)),
            "l_discount": pa.array(np.round(rng.integers(0, 11, n) * 0.01, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, n) * 0.01, 2)),
            "l_returnflag": pa.array(rng.choice(RETURNFLAGS, n)),
            "l_linestatus": pa.array(rng.choice(LINESTATUS, n)),
            "l_shipdate": pa.array(ship, type=pa.timestamp("us")),
        }
    )
    return orders, lineitem


def gen_documents(n: int, rng) -> pa.Table:
    # word-soup docs over a fixed vocab; ~8% are near-duplicate mutations
    # of an earlier doc (swap one token) so the near-dup pipelines have
    # real positives to find, like the driver's recipe.
    lens = rng.integers(10, 60, n)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n):
        words = rng.choice(vocab, lens[i])
        texts.append(" ".join(words))
    n_dup = n * 8 // 100
    dup_src = rng.integers(0, n, n_dup)
    dup_dst = rng.integers(0, n, n_dup)
    for s, d in zip(dup_src, dup_dst):
        if s == d:
            continue
        w = texts[s].split()
        w[int(rng.integers(0, len(w)))] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[d] = " ".join(w)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(LANGS, n, p=LANG_P)),
            "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_embeddings(n: int, dim: int, rng) -> pa.Table:
    # many small clusters with wide spread: near-dup density stays
    # realistic as n grows (8 tight clusters at 20k vectors made the
    # true near-dup pair count quadratic — millions of output rows)
    n_centers = max(8, n // 64)
    labels = rng.integers(0, n_centers, n).astype(np.int32)
    centers = rng.normal(0, 1, (n_centers, dim))
    vecs = (centers[labels] + rng.normal(0, 0.45, (n, dim))).astype(np.float32)
    labels = (labels % 8).astype(np.int32)  # keep the public 8-way label
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels),
        }
    )


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".localdata", f"sf{sf:g}")
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_embed = int(20_000 * sf)

    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
            ),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
            "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
            "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
            "c_mktsegment": pa.array(rng.choice(MKTSEGMENTS, n_cust)),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
            "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
        }
    )
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
            "p_name": pa.array(
                [
                    f"{a} {b}"
                    for a, b in zip(
                        rng.choice(PNAME_ADJ, n_part), rng.choice(PNAME_NOUN, n_part)
                    )
                ]
            ),
            # domains mirror the driver's recipe exactly (Brand#1..25,
            # the six word types) so brand/type-filtered contracts stay
            # non-degenerate at self-generated SFs
            "p_brand": pa.array([f"Brand#{i % 25 + 1}" for i in range(n_part)]),
            "p_type": pa.array(PTYPES[np.arange(n_part) % len(PTYPES)]),
            "p_size": pa.array((rng.integers(1, 51, n_part)).astype(np.int32)),
            "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2)),
        }
    )
    orders, lineitem = gen_orders_lineitem(n_orders, n_cust, n_part, n_supp, rng)
    tables = {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
        "events": gen_events(n_events, int(15_000 * sf), rng),
        "documents": gen_documents(n_docs, rng),
        "embeddings": gen_embeddings(n_embed, 64, rng),
    }
    for name, tbl in tables.items():
        path = os.path.join(out, f"{name}.parquet")
        n_parts = _write(tbl, path)
        print(
            f"{name}: {tbl.num_rows} rows -> {path}"
            + (f" ({n_parts} files)" if n_parts > 1 else "")
        )


# realistic file/row-group layout (VERDICT r12 #1): the original
# single-file single-row-group tables made every sf1 scan ONE task on 32
# cores, so the sweep under-measured scan parallelism and manufactured
# artifact offender lines. Production tables arrive as many files with
# bounded row groups; mirror that — big tables become a DIRECTORY named
# `{table}.parquet/` of part files (Spark reads it natively; DuckDB via
# the `/*.parquet` glob the readers apply), small ones stay single-file
# but still get bounded row groups. Data is byte-identical either way
# (same rng stream, sliced); only the layout changes.
_ROWS_PER_GROUP = 131_072  # ~10-40 MB per group across these schemas
_MULTIFILE_MIN_ROWS = 500_000
_N_FILES = 12


def _write(tbl: pa.Table, path: str) -> int:
    # both layout transitions must be clean (ADVICE r13): a leftover
    # {table}.parquet/ DIRECTORY would make the single-file write raise
    # (and a shrunk multi-file run would keep stale part files the
    # readers' glob still picks up), a leftover FILE blocks makedirs.
    if tbl.num_rows < _MULTIFILE_MIN_ROWS:
        if os.path.isdir(path):
            shutil.rmtree(path)  # directory leftover from a larger run
        pq.write_table(tbl, path, row_group_size=_ROWS_PER_GROUP)
        return 1
    if os.path.isfile(path):
        os.remove(path)  # single-file leftover from the old layout
    elif os.path.isdir(path):
        shutil.rmtree(path)  # drop stale parts from a different split
    os.makedirs(path, exist_ok=True)
    step = -(-tbl.num_rows // _N_FILES)
    for k in range(_N_FILES):
        part = tbl.slice(k * step, step)
        if not part.num_rows:
            break
        pq.write_table(
            part,
            os.path.join(path, f"part-{k:05d}.parquet"),
            row_group_size=_ROWS_PER_GROUP,
        )
    return _N_FILES


if __name__ == "__main__":
    main()
