#!/usr/bin/env python3
"""Sweep every oracle SQL for representation-hazard result types.

The driver's hash canonicalization is type-representation-sensitive: a
DuckDB HUGEINT (what SUM over integers widens to) or DECIMAL column can
hash-mismatch a bit-identical Spark BIGINT/DOUBLE column (this fired as
q165's red row in round 15). This tool runs each oracle SQL against a sf
dir and reports any result column whose DuckDB dtype is not one of the
Spark-representable set {BIGINT, INTEGER, DOUBLE, FLOAT, VARCHAR,
BOOLEAN, DATE, TIMESTAMP, BLOB, and list/struct thereof}.

Usage: python3 tools/type_sweep.py <sfDir> <oracle_sql.json>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SAFE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
        "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB"}


def safe_type(t):
    t = str(t)
    if t.endswith("[]"):
        return safe_type(t[:-2])
    if t.startswith("STRUCT(") and t.endswith(")"):
        # best-effort: flag if HUGEINT/DECIMAL appears anywhere inside
        return "HUGEINT" not in t and "DECIMAL" not in t and "INT128" not in t
    return t in SAFE


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_json) as f:
        oracles = json.load(f)
    n_flag = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                   if not safe_type(t)]
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            n_flag += 1
            continue
        if bad:
            print(f"FLAG {name}: {bad}")
            n_flag += 1
    print(f"swept {len(oracles)} queries, {n_flag} flagged")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
