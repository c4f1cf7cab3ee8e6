#!/usr/bin/env python3
"""Local replica of the driver's t2 oracle compare (dev tool, driver-side
python only — not part of the Scala library).

Usage: check_oracle.py <sfDir> <verifyOutDir> [onlyPrefixes]
Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf tables, sorts columns
by name and rows by value, and diffs. The optional third arg is a
comma-separated list of query names or name prefixes (e.g. "q34,q44,q10")
to check just a subset — resuming an interrupted long run, or spot-checking
one query, without re-paying the full board. A prefix matches on a name
boundary: "q10" selects q10 and q10_foo but NOT q100 — pass the exact
name (or the longer prefix) to reach q100+."""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir, only=None):
    prefixes = only.split(",") if only else None
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        if prefixes and not any(
                name == p or name.startswith(p + "_") for p in prefixes):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        want = canon(con.sql(oracle[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"  ok {name} ({len(got)} rows)")
            n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
            diff = got.compare(want) if got.shape == want.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
