#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query...]

Reads each <out>/<name> parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf_dir tables, then
compares row count, column names, and values (sorted columns, sorted
rows) with exact equality so any float drift surfaces here before the
driver sees it.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0 (engines disagree on zero sign)
        return v
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: ERROR {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1
            continue
        # canonical: reorder columns by name, then sort rows
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        g = sorted([tuple(norm(r[i]) for i in gi) for r in got],
                   key=lambda r: tuple(str(x) for x in r))
        w = sorted([tuple(norm(r[i]) for i in wi) for r in want],
                   key=lambda r: tuple(str(x) for x in r))
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(g, w) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
