#!/usr/bin/env python3
"""DuckDB side of PlanFuzzSpec's randomized differential gate.

Usage: python3 tools/fuzz_runner.py <sfDir> <sqlFile> <outFile>

Reads one SQL statement per line from <sqlFile>, runs each against
DuckDB views over the fixture parquet (same setup as check.py), and
writes canonical blocks to <outFile>:

    #Q<i> OK <nrows>
    <field \x1f field \x1f ...>   (one line per row, rows sorted)
    ...
    #Q<i> ERR <message>

Value canon matches the Scala side: None -> \\N, everything else str().
The fuzz grammar only emits strings and integers (sums are integer
cents), so no float formatting ambiguity exists by construction.
"""
import sys
import duckdb

def main():
    sf_dir, sql_file, out_file = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in ["lineitem", "orders"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    def norm(v):
        return r"\N" if v is None else str(v)

    with open(out_file, "w") as out:
        for i, line in enumerate(open(sql_file)):
            sql = line.rstrip("\n")
            if not sql:
                continue
            try:
                rows = con.execute(sql).fetchall()
                srows = sorted("\x1f".join(norm(v) for v in r) for r in rows)
                out.write(f"#Q{i} OK {len(srows)}\n")
                for r in srows:
                    out.write(r + "\n")
            except Exception as e:
                msg = " ".join(str(e).split())
                out.write(f"#Q{i} ERR {msg}\n")

if __name__ == "__main__":
    main()
