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


def frame_rows(df):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(cell_key(v) for v in t))
    rows.sort()
    return cols, rows


def diff_one(con, name, sql, out_dir):
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        print(f"{name}: NO SPARK OUTPUT")
        return False
    got_rel = con.execute(f"SELECT * FROM read_parquet({spark_files!r})")
    got = got_rel.df()
    got_types = dict(zip(got_rel.description and [d[0] for d in con.execute(f'SELECT * FROM read_parquet({spark_files!r}) LIMIT 0').description], []))
    want = con.execute(sql).df()
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
    gc, grows = frame_rows(got)
    wc, wrows = frame_rows(want)
    if gc != wc:
        print(f"{name}: COLS spark={gc} oracle={wc}")
        return False
    if len(grows) != len(wrows):
        print(f"{name}: ROWS spark={len(grows)} oracle={len(wrows)}")
        ok = False
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
