#!/usr/bin/env python3
"""Strict cell-level differ: Spark Verify dump vs DuckDB oracle replay.

Unlike localverify.py (forgiving pandas string canon), this compares with
exact type-aware semantics, closer to the driver's hash: decimals as exact
Decimal values (scale included), doubles bit-for-bit, dates/timestamps as
ISO micros, and reports dtype mismatches per column.

Usage: python3 tools/strictdiff.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, os, glob, struct
from decimal import Decimal
import duckdb
import pandas as pd
import numpy as np


def cell_key(v):
    """Canonical, strict representation of one cell."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if np.isnan(v):
            return "NULL"
        return "f64:" + struct.pack(">d", v).hex()
    if isinstance(v, Decimal):
        return "dec:" + str(v)  # keeps scale: 1.50 != 1.5
    if isinstance(v, (np.integer, int)):
        return "i:" + str(int(v))
    if isinstance(v, pd.Timestamp):
        return "ts:" + v.isoformat()
    if isinstance(v, np.datetime64):
        return "ts:" + pd.Timestamp(v).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "bin:" + bytes(v).hex()
    if isinstance(v, (list, np.ndarray)):
        return "arr:[" + ",".join(cell_key(x) for x in v) + "]"
    return "s:" + str(v)


def frame_rows(cur):
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(cell_key(t[i]) for i in order) for t in cur.fetchall()]
    rows.sort()
    return cols, rows


def diff_one(con, name, sql, out_dir):
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        print(f"{name}: NO SPARK OUTPUT")
        return False
    # fetchall (not .df()) so DECIMAL columns stay decimal.Decimal with
    # scale preserved -- pandas conversion would flatten them to float64.
    # Each cursor is drained before the next execute (one connection ==
    # one pending result set in duckdb).
    gc, grows = frame_rows(con.execute(f"SELECT * FROM read_parquet({spark_files!r})"))
    wc, wrows = frame_rows(con.execute(sql))
    # dtype report via duckdb DESCRIBE
    gt = con.execute(f"DESCRIBE SELECT * FROM read_parquet({spark_files!r})").df()
    wt = con.execute(f"DESCRIBE ({sql})").df()
    gtypes = dict(zip(gt.column_name, gt.column_type))
    wtypes = dict(zip(wt.column_name, wt.column_type))
    ok = True
    for c in sorted(set(gtypes) | set(wtypes)):
        if gtypes.get(c) != wtypes.get(c):
            print(f"{name}: TYPE col {c}: spark={gtypes.get(c)} oracle={wtypes.get(c)}")
            ok = False
    if gc != wc:
        print(f"{name}: COLS spark={gc} oracle={wc}")
        return False
    if len(grows) != len(wrows):
        # positional pairing misaligns after one inserted/missing row:
        # diff as multisets and show rows unique to each side instead
        print(f"{name}: ROWS spark={len(grows)} oracle={len(wrows)}")
        from collections import Counter
        gset, wset = Counter(grows), Counter(wrows)
        for r in list((gset - wset).elements())[:3]:
            print(f"{name}: spark-only row: {r}")
        for r in list((wset - gset).elements())[:3]:
            print(f"{name}: oracle-only row: {r}")
        return False
    ndiff = 0
    for i, (g, w) in enumerate(zip(grows, wrows)):
        if g != w:
            ndiff += 1
            if ndiff <= 5:
                for j, cname in enumerate(gc):
                    if g[j] != w[j]:
                        print(f"{name}: row {i} col {cname}: spark={g[j]} oracle={w[j]}")
            ok = False
    if ndiff:
        print(f"{name}: {ndiff} differing rows / {len(grows)}")
    if ok:
        print(f"{name}: STRICT OK ({len(grows)} rows)")
    return ok


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = only or sorted(oracles)
    bad = 0
    for n in names:
        if n not in oracles:
            print(f"{n}: no oracle sql")
            continue
        try:
            if not diff_one(con, n, oracles[n], out_dir):
                bad += 1
        except Exception as e:
            print(f"{n}: ERROR {e}")
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
