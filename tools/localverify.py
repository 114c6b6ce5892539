#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark; this script just replays oracle SQL in
DuckDB and diffs against the Verify.scala parquet dumps).

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, os, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: timestamps -> iso strings, categorical -> str
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_bad += 1; continue
        eq = got.equals(want)
        if not eq:
            # pinpoint first differing cell
            diff_cols = [c for c in got.columns if not got[c].equals(want[c])]
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = got[c] != want[c]
                idx = neq[neq].index[:3]
                for i in idx:
                    print(f"   row {i} col {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)"); n_ok += 1
    extra = set(d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))) - set(oracles)
    for name in sorted(extra):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if files:
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
        else:
            print(f"FAIL {name}: no spark output (no oracle)"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed, {len(extra)} rows-only")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
