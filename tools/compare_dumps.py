#!/usr/bin/env python3
"""Compare two Verify dump directories query-by-query (the C2
partition-determinism gate, Spark-vs-Spark): same query names, same
columns, same canonicalized row multiset. Used to prove the registry
is shuffle-partition-independent at a fixture scale WITHOUT re-paying
the DuckDB oracle cost (the oracle side of check.py doesn't depend on
Spark's partitioning, so one oracle run per fixture suffices).

Usage: python3 tools/compare_dumps.py <dumpDirA> <dumpDirB>
"""
import os
import sys
import duckdb

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names_a = {n for n in os.listdir(a_dir)
               if os.path.isdir(os.path.join(a_dir, n))}
    names_b = {n for n in os.listdir(b_dir)
               if os.path.isdir(os.path.join(b_dir, n))}
    if names_a != names_b:
        print(f"FAIL query sets differ: only-A={sorted(names_a - names_b)} "
              f"only-B={sorted(names_b - names_a)}")
        sys.exit(1)
    con = duckdb.connect()
    n_pass = n_fail = 0
    for name in sorted(names_a):
        qa = f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')"
        qb = f"SELECT * FROM read_parquet('{b_dir}/{name}/*.parquet')"
        ca = [d[0] for d in con.execute(qa).description]
        cb = [d[0] for d in con.execute(qb).description]
        if sorted(ca) != sorted(cb):
            print(f"FAIL {name}: columns {sorted(ca)} vs {sorted(cb)}")
            n_fail += 1
            continue
        cols = ", ".join(f'"{c}"' for c in sorted(ca))
        diff = con.execute(
            f"SELECT COUNT(*) FROM ((SELECT {cols} FROM ({qa}) EXCEPT ALL "
            f"SELECT {cols} FROM ({qb})) UNION ALL "
            f"(SELECT {cols} FROM ({qb}) EXCEPT ALL "
            f"SELECT {cols} FROM ({qa})))").fetchone()[0]
        if diff:
            print(f"FAIL {name}: {diff} asymmetric rows")
            n_fail += 1
        else:
            n_rows = con.execute(f"SELECT COUNT(*) FROM ({qa})").fetchone()[0]
            print(f"PASS {name} ({n_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
