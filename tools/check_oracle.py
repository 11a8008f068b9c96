#!/usr/bin/env python3
"""Local self-check harness (driver-side python, NOT shipped code).

Mimics the driver's correctness gate: reads Verify.scala's output dir
(<out>/<name>/ parquet + oracle_sql.json), runs each oracle SQL in DuckDB
against the same sf dir, and compares row sets (columns sorted by name,
rows sorted, values canonicalized).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_rows(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort()
    return [cols[i] for i in order], rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # filtered Verify run — only check dumped queries
        sql = oracles[name]
        try:
            got_cols, got = table_rows(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            exp_cols, exp = table_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: error {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
        elif got != exp:
            n_fail += 1
            diff = [(a, b) for a, b in zip(got, exp) if a != b][:3]
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows; first diffs:")
            for a, b in diff:
                print(f"   spark={a}\n   duck ={b}")
            if len(got) != len(exp):
                only_g = set(got) - set(exp)
                only_e = set(exp) - set(got)
                for r in list(only_g)[:2]:
                    print(f"   only-spark: {r}")
                for r in list(only_e)[:2]:
                    print(f"   only-duck : {r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
