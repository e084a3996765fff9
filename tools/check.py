#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the fixture
tables in <sfDir>, and compares: column names (sorted), row count,
and exact values after sorting rows by all columns.
"""
import json, sys, math
import duckdb

def canon(rows):
    def k(row):
        return tuple((v is None, str(v)) for v in row)
    return sorted(rows, key=k)

def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # Driver parity: its differ goes through pandas, where DuckDB
        # HUGEINT becomes float64 while Spark's int64 stays integer —
        # values hash as "5.0" vs "5" and the row hash diverges even
        # when every value is numerically identical. Flag any column
        # whose type family differs between the two sides.
        def family(t):
            t = t.upper()
            if t == "HUGEINT" or t == "UHUGEINT":
                return "hugeint"  # own family: pandas-hostile
            if t in ("TINYINT","SMALLINT","INTEGER","BIGINT","UTINYINT",
                     "USMALLINT","UINTEGER","UBIGINT"):
                return "int"
            if t in ("FLOAT","DOUBLE") or t.startswith("DECIMAL"):
                return "float"
            return t
        got_types = dict(
            (c, t) for c, t, *_ in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall())
        exp_types = dict(
            (c, t) for c, t, *_ in con.execute("DESCRIBE " + sql).fetchall())
        ok = True
        type_bad = [(c, got_types.get(c), exp_types.get(c))
                    for c in got_types
                    if c in exp_types
                    and family(got_types[c]) != family(exp_types[c])]
        if type_bad:
            print(f"FAIL {name}: type-family mismatch {type_bad}")
            ok = False
        elif sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            ok = False
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            ok = False
        else:
            gi = [got_cols.index(c) for c in sorted(got_cols)]
            ei = [exp_cols.index(c) for c in sorted(exp_cols)]
            g = canon([[r[i] for i in gi] for r in got_rows])
            e = canon([[r[i] for i in ei] for r in exp_rows])
            for rn, (gr, er) in enumerate(zip(g, e)):
                bad = [(c, a, b) for c, a, b in zip(sorted(got_cols), gr, er)
                       if not values_equal(a, b)]
                if bad:
                    print(f"FAIL {name}: row {rn} diff {bad[:3]}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
