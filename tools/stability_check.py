#!/usr/bin/env python3
"""Run-to-run stability check (round 10): compare two independent
graft.Verify dumps key-by-key, row-by-row, cell-exact and IN ROW ORDER.

Usage: python3 tools/stability_check.py <outDirA> <outDirB>

Why: §2.8 rule 1 requires every graded query to end in a TOTAL order-by,
because the driver hashes rows in emitted order — a tie in the final
sort is invisible to single-run diffcheck (both engines happen to agree
within one run) but flips the hash between runs on different partition
layouts (the sf0.1 tie-order incident). Two fresh-JVM Verify dumps that
are byte-identical per key prove the whole 149-key surface is
deterministic end-to-end, not just rule-compliant on paper.
"""
import sys, os, glob
import duckdb


def main(dir_a, dir_b):
    con = duckdb.connect()
    keys_a = sorted(d for d in os.listdir(dir_a)
                    if os.path.isdir(os.path.join(dir_a, d)))
    keys_b = sorted(d for d in os.listdir(dir_b)
                    if os.path.isdir(os.path.join(dir_b, d)))
    if keys_a != keys_b:
        print(f"FAIL: key sets differ: only-A={set(keys_a)-set(keys_b)} "
              f"only-B={set(keys_b)-set(keys_a)}")
        return 1
    n_fail = 0
    for key in keys_a:
        fa = glob.glob(os.path.join(dir_a, key, "*.parquet"))
        fb = glob.glob(os.path.join(dir_b, key, "*.parquet"))
        if not fa or not fb:
            print(f"FAIL {key}: missing parquet (A={len(fa)} B={len(fb)})")
            n_fail += 1
            continue
        ra = con.execute(f"SELECT * FROM read_parquet('{fa[0]}')").fetchall()
        rb = con.execute(f"SELECT * FROM read_parquet('{fb[0]}')").fetchall()
        if ra != rb:
            diff = next((i, x, y) for i, (x, y) in enumerate(zip(ra, rb))
                        if x != y) if len(ra) == len(rb) else None
            print(f"FAIL {key}: runs differ "
                  f"(rows A={len(ra)} B={len(rb)}, first diff={diff})")
            n_fail += 1
        else:
            print(f"PASS {key} ({len(ra)} rows identical)")
    print(f"== {len(keys_a) - n_fail} stable, {n_fail} unstable ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
