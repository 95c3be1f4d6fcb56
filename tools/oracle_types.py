#!/usr/bin/env python3
"""Standing oracle output-type audit (§2.8 rule 4, round 10).

Usage: python3 tools/oracle_types.py <sfDir> <oracle_sql.json>

DESCRIBEs every oracle SQL against DuckDB views over the sf tables — no
Spark run needed — and fails if any output column's type falls outside
the closed set below. This mechanically extinguishes the r9 failure
class: DuckDB silently widens window/aggregate SUMs over BIGINT to
HUGEINT (and AVG-like forms to DECIMAL), which the driver's typed hash
rejects even when every value matches. Every such column needs an
explicit CAST in the oracle SQL.

Invoked by OracleTypeAuditSpec during `sbt test` and usable standalone.
Exit 0 = all oracle output types in the closed set; 1 = violation(s).
"""
import sys, os, json
import duckdb

# Closed set of oracle output types (§2.8 rule 4) — exactly the types
# the oracles emit today (DESCRIBE sweep, round 10); diffcheck.py
# imports this, so there is ONE copy. Anything else — in particular
# DuckDB's silent SUM/AVG widenings to HUGEINT or DECIMAL — needs an
# explicit CAST in the oracle SQL. Extending the set (e.g. DATE for a
# future calendar oracle) is a deliberate one-line change here.
ALLOWED_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "INTEGER"}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_json) as f:
        oracle = json.load(f)
    bad = 0
    for key in sorted(oracle):
        try:
            cols = con.execute(
                "SELECT column_name, column_type FROM "
                f"(DESCRIBE ({oracle[key]}))").fetchall()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}")
            bad += 1
            continue
        for c, ty in cols:
            if ty not in ALLOWED_TYPES:
                print(f"FAIL {key}: col {c} has type {ty}, outside "
                      f"{sorted(ALLOWED_TYPES)} — add an explicit CAST "
                      "(§2.8 rule 4)")
                bad += 1
    print(f"== {len(oracle)} oracles audited, {bad} type violations ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
