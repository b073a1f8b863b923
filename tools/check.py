#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the
library): run `graft.Verify` first, then compare each query's parquet
output against its DuckDB oracle on the same testdata.

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json
import sys

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {e}")
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            failed.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            continue
        if len(g) != len(w):
            failed.append(name)
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            continue
        if not g.equals(w):
            failed.append(name)
            # find first differing cell for diagnostics
            diff = (g != w) & ~(g.isna() & w.isna())
            cells = diff.to_numpy().nonzero()
            if len(cells[0]) == 0:
                dt = [(c, g[c].dtype, w[c].dtype) for c in g.columns
                      if g[c].dtype != w[c].dtype]
                print(f"FAIL {name}: values equal but dtypes differ: {dt}")
                continue
            r, c = cells[0][0], cells[1][0]
            cn = g.columns[c]
            print(f"FAIL {name}: {diff.to_numpy().sum()} cells differ; "
                  f"first at row {r} col {cn}: got={g.iloc[r, c]!r} want={w.iloc[r, c]!r} "
                  f"(dtypes got={g[cn].dtype} want={w[cn].dtype})")
            continue
        print(f"ok   {name}: {len(g)} rows, {len(g.columns)} cols "
              f"(dtypes match: {list(g.dtypes) == list(w.dtypes)})")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
