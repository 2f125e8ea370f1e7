#!/usr/bin/env python3
"""Sweep every oracle SQL for latent DuckDB type hazards.

Usage: python3 tools/oracle_types.py <oracle_sql.json> <sf_dir>

The driver's hasher is sensitive to the PHYSICAL type of each column,
not just its value: tools/check.py compares Python values (so an INT128
and an int64 with equal values both pass), but the driver serializes
types. DuckDB silently widens in ways Spark does not:

  - sum(BIGINT) -> HUGEINT (including WINDOW sums — the q197/q215 trap)
  - integer division/avg corner cases -> DECIMAL
  - unsigned parquet logical types -> UTINYINT/.../UBIGINT

This tool DESCRIBEs each oracle query (binder only, nothing executed)
over the sf tables and fails on any column whose type Spark cannot emit
from a parquet write. Allowed: BOOLEAN, INTEGER, BIGINT, FLOAT, DOUBLE,
VARCHAR, DATE, TIMESTAMP[_*], and LIST/STRUCT compositions thereof.

Exit 0 = clean; exit 1 = at least one hazardous column (each printed).
OracleTypesSpec runs this under sbt test so a regression can never
reach the driver gate again.
"""
import json
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Leaf types Spark writes to parquet (DuckDB names). Anything else —
# HUGEINT, DECIMAL(p,s), TINYINT/SMALLINT, unsigned ints, INTERVAL,
# TIME, UUID, ENUM — hashes differently driver-side even when values
# match, so it is banned.
ALLOWED_LEAF = re.compile(
    r"^(BOOLEAN|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR|DATE|"
    r"TIMESTAMP(_NS|_MS|_S)?( WITH TIME ZONE)?)$")


def leaf_types(t: str):
    """Decompose LIST/ARRAY/STRUCT/MAP types into leaf scalar types."""
    t = t.strip()
    if t.endswith("[]"):
        yield from leaf_types(t[:-2])
        return
    m = re.match(r"^(LIST|ARRAY)\((.*)\)$", t)
    if m:
        yield from leaf_types(m.group(2))
        return
    m = re.match(r"^(STRUCT|MAP)\((.*)\)$", t)
    if m:
        # split on top-level commas, strip field names
        body, depth, cur, parts = m.group(2), 0, "", []
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                cur += ch
        parts.append(cur)
        for p in parts:
            # field is `name TYPE` (STRUCT) or bare TYPE (MAP sides)
            fm = re.match(r'^\s*(?:"[^"]*"|\S+)\s+(.+)$', p.strip())
            yield from leaf_types(fm.group(1) if fm else p.strip())
        return
    yield t


def main():
    oracle_path, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error "
                  f"{str(e).splitlines()[0][:200]}")
            n_bad += 1
            continue
        for col, typ in [(r[0], r[1]) for r in desc]:
            bad = [lt for lt in leaf_types(typ)
                   if not ALLOWED_LEAF.match(lt)]
            if bad:
                print(f"FAIL {name}: column {col} has type {typ} "
                      f"(hazardous leaf {bad}) — cast it in the oracle")
                n_bad += 1
    print(f"{len(oracles)} oracles swept, {n_bad} hazardous columns")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
