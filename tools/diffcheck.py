#!/usr/bin/env python3
"""Local differential harness (SURVEY §5.2): emulate the driver's DuckDB
oracle compare before the driver runs it.

Usage: python3 tools/diffcheck.py <sfDir> <outDir>
  where <outDir> is what graft.Verify wrote (per-query parquet dirs +
  oracle_sql.json). Registers each base table as a DuckDB view named
  after the table (bare-name convention per the SparkEntry scaladoc
  example "FROM lineitem"), runs each oracle SQL, and compares against
  the Spark-written parquet: column-name sets, row counts, and values
  cell-by-cell with exact equality (columns sorted by name, like the
  driver's hash).

FRESHNESS: run this against the dump the MOST RECENT graft.Verify wrote.
The q_source_csv/jsonl roundtrip oracles read side files under
target/roundtrip/ that Verify regenerates per run at ITS tier; comparing
an older dump after a different-tier Verify ran fails loudly on those
two keys' group counts (re-run Verify at the tier you are checking).

TYPE-STRICT (round 10): the driver's hash is typed, so value equality is
not enough — r9's only red row was a DuckDB window SUM(BIGINT) widening
seq_id to HUGEINT while the values matched. For every oracled key we now
DESCRIBE both sides and fail on (a) any per-column type mismatch between
the oracle result and the Spark-written parquet, and (b) any oracle
output type outside the closed set ALLOWED_TYPES — HUGEINT / UBIGINT /
DECIMAL / UHUGEINT widenings can never pass the driver, so they can
never pass here either.
"""
import sys, os, json, glob, math
import duckdb

# the closed oracle output-type set lives in ONE place (oracle_types.py,
# which OracleTypeAuditSpec also runs) — two drifting copies would
# recreate the class this audit exists to kill
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_types import ALLOWED_TYPES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    spark_dirs = sorted(d for d in os.listdir(outdir)
                        if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = 0
    for key in spark_dirs:
        files = glob.glob(os.path.join(outdir, key, "*.parquet"))
        if not files:
            print(f"FAIL {key}: no parquet output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{files[0]}')").fetchall()
        got_cols = [d[0] for d in con.description]
        if key not in oracle:
            print(f"SKIP {key}: no oracle (rows={len(got)})"); continue
        try:
            exp = con.execute(oracle[key]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {key}: columns spark={sorted(got_cols)} "
                  f"duck={sorted(exp_cols)}"); n_fail += 1; continue
        terr = type_audit(con, oracle[key], files[0])
        if terr:
            print(f"FAIL {key}: {terr}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {key}: rows spark={len(got)} duck={len(exp)}")
            n_fail += 1; continue
        # sort columns by name (driver convention), compare cell-exact
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        bad = None
        for i, (gr, er) in enumerate(zip(got, exp)):
            for gj, ej in zip(gidx, eidx):
                gv, ev = gr[gj], er[ej]
                if not cell_eq(gv, ev):
                    bad = (i, sorted(got_cols)[gidx.index(gj)], gv, ev)
                    break
            if bad: break
        if bad:
            i, c, gv, ev = bad
            print(f"FAIL {key}: row {i} col {c}: spark={gv!r} duck={ev!r}")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(spark_dirs)-n_pass-n_fail} skipped ==")
    return 1 if n_fail else 0

def type_audit(con, sql, spark_parquet):
    """Typed compare of the oracle's output schema against the
    Spark-written parquet's schema (both as DuckDB sees them), plus the
    ALLOWED_TYPES closed set. Returns an error string or None."""
    duck = dict(con.execute(
        f"SELECT column_name, column_type FROM (DESCRIBE ({sql}))"
    ).fetchall())
    spark = dict(con.execute(
        "SELECT column_name, column_type FROM (DESCRIBE (SELECT * FROM "
        f"read_parquet('{spark_parquet}')))").fetchall())
    for c, t in sorted(duck.items()):
        if t not in ALLOWED_TYPES:
            return (f"oracle col {c} has type {t}, outside the closed set "
                    f"{sorted(ALLOWED_TYPES)} — add an explicit CAST in the "
                    "oracle SQL (§2.8 rule 4)")
        st = spark.get(c)
        if st is not None and st != t:
            return (f"type mismatch on col {c}: spark parquet={st} vs "
                    f"oracle={t} — the driver's typed hash will fail this")
    return None

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
        return a == b  # exact — the driver hashes bytes
    return a == b

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
