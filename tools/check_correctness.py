#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (builder tooling only —
not part of the Scala library). Reads the Verify output dir, runs each oracle
SQL in DuckDB over the same sf tables, canonicalizes both sides (columns
sorted by name, rows sorted, floats rounded), and diffs.

Usage: python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        try:
            mine = canon(con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf())
            oracle = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(oracle.columns)}"); n_fail += 1; continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}"); n_fail += 1; continue
        # Strict dtype-kind check: the driver's hash stringifies values, so an
        # int64 Spark column vs a HUGEINT/float oracle column ("8" vs "8.0")
        # hash-fails even when the tolerant pandas compare passes. Flag any
        # int-vs-float kind drift where neither side has nulls (nullable ints
        # legitimately surface as float64 in pandas on both sides).
        kind_bad = [c for c in mine.columns
                    if {mine[c].dtype.kind, oracle[c].dtype.kind} == {"i", "f"}
                    and not mine[c].isna().any() and not oracle[c].isna().any()]
        if kind_bad:
            print(f"FAIL {name}: dtype-kind drift (int vs float) in {kind_bad} "
                  f"spark={[str(mine[c].dtype) for c in kind_bad]} oracle={[str(oracle[c].dtype) for c in kind_bad]}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}"); n_fail += 1
    # queries without oracle → rows-only
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracles:
            files = glob.glob(os.path.join(p, "*.parquet"))
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else -1
            print(f"INFO {name}: rows-only ({n} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
