#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder-side test tool only;
the shipped library is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, loads the matching Spark result parquet, then
compares after sorting columns by name and rows by all columns — approximating
the driver's hash-match. Exits nonzero on any mismatch.
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(lambda v: str(v))
        elif "datetime" in str(s.dtype):
            # date-at-midnight and plain date compare equal (duckdb DATE
            # comes back as datetime64; spark DATE as datetime.date objects)
            df[c] = s.astype("datetime64[us]").map(
                lambda v: str(v).removesuffix(" 00:00:00"))
        elif s.dtype.kind == "f":
            df[c] = s.astype("float64")
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name, got, exp):
    if sorted(got.columns) != sorted(exp.columns):
        return f"column mismatch: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        return f"row count mismatch: spark={len(g)} oracle={len(e)}"
    for c in g.columns:
        if g[c].dtype.kind == "f":
            bad = 0
            worst = 0.0
            for a, b in zip(g[c], e[c]):
                if (isinstance(a, float) and math.isnan(a)) and (isinstance(b, float) and math.isnan(b)):
                    continue
                d = abs(a - b)
                if d != 0.0:
                    bad += 1
                    worst = max(worst, d)
            if bad:
                return f"col {c}: {bad} float diffs, max abs diff {worst:.3e}"
        else:
            neq = (g[c] != e[c])
            if neq.any():
                i = neq.idxmax()
                return f"col {c}: {neq.sum()} diffs, first at row {i}: spark={g[c][i]!r} oracle={e[c][i]!r}"
    return None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {outdir}/{name}")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            failures += 1
            continue
        err = compare(name, got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"PASS {name}: {len(got)} rows x {len(got.columns)} cols")
    print(f"{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
