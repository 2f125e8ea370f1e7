#!/usr/bin/env python3
"""Full local gate → driver-style CORRECTNESS json.

Usage: python3 tools/gate_json.py <verify_out_dir> <sf_dir> <out_json>

Same comparison as tools/check.py (sorted columns, sorted rows, exact
values after -0.0/NaN normalization) but emits one JSON object keyed by
query name with the driver's row shape:
  {rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}
so multi-scale-factor gate runs can be committed as artifacts
(CORRECTNESS_LOCAL_sf*.json — the round-10 second-seed overfit guard).
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
            return 0.0
        return v
    return v


def main():
    out_dir, sf_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # GATE_SKIP: comma-separated names whose ORACLE is infeasible at this
    # scale. Currently empty at every gate SF: the one historical user
    # (q189's k-core oracle, >79 GB DuckDB spill at sf0.1) was fixed by
    # MATERIALIZED peel CTEs; the escape hatch stays for future oracles.
    skip = set(x for x in
               __import__("os").environ.get("GATE_SKIP", "").split(",") if x)
    out = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if name in skip:
            out[name] = {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": None,
                         "oracle_rows": None,
                         "err": "SKIPPED: oracle infeasible at this sf"}
            continue
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
            rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
            rec["schema_match"] = sorted(got_cols) == sorted(want_cols)
            rec["rows_match"] = len(got) == len(want)
            if rec["schema_match"] and rec["rows_match"]:
                gi = [got_cols.index(c) for c in sorted(got_cols)]
                wi = [want_cols.index(c) for c in sorted(want_cols)]
                g = sorted([tuple(norm(r[i]) for i in gi) for r in got],
                           key=lambda r: tuple(str(x) for x in r))
                w = sorted([tuple(norm(r[i]) for i in wi) for r in want],
                           key=lambda r: tuple(str(x) for x in r))
                rec["hash_match"] = g == w
        except Exception as e:
            rec["err"] = str(e).splitlines()[0][:200]
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        n_pass += ok
        n_fail += not ok
        if not ok:
            print(f"FAIL {name}: {rec['err'] or 'mismatch'}")
        out[name] = rec
    with open(out_json, "w") as f:
        json.dump(out, f, indent=0)
    print(f"== {n_pass} pass, {n_fail} fail -> {out_json} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
