#!/usr/bin/env python3
"""Zipf-skew the lineitem→part join key of an existing fixture.

scale10.py's copies keep the source's UNIFORM key distributions, so
`join_salted` and AQE skew-split have never faced real skew at scale
(round-8 verdict item 5). This tool rewrites l_partkey with a Zipf(1)
map over the existing part keys — FK validity preserved, every other
column and table copied unchanged:

    u  = hash(8·l_orderkey + l_linenumber) / 2^64   (deterministic)
    pk = min(N−1, floor(N^u) − 1)                    (N = #parts)

P(pk = 0) = ln2/lnN ≈ 7% of ALL lineitem rows on one key (~1400× the
uniform mean at N = 20k); the top ten keys absorb ≈ ln11/lnN ≈ 24%.
Verification-side tooling only (like scale10.py).

Usage: python3 tools/skew10.py <srcFixtureDir> <outDir>
(feed it the 10x fixture: skew10.py /tmp/sf1t /tmp/sf10z)
"""
import os
import sys
import duckdb

def main():
    src, out = sys.argv[1], sys.argv[2]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/part.parquet')").fetchone()[0]
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "documents", "embeddings"]:
        con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
                        TO '{out}/{t}.parquet' (FORMAT PARQUET)""")
    # events: TIMESTAMP(NANOS) survives only through pyarrow (see
    # scale10.py) — and it is unchanged here, so copy the file bytes
    import shutil
    shutil.copyfile(f"{src}/events.parquet", f"{out}/events.parquet")
    con.execute(f"""COPY (
        SELECT l_orderkey,
               least({n} - 1, CAST(floor(pow({n},
                   (hash(8 * l_orderkey + l_linenumber) % 1000000) / 1000000.0
               )) AS BIGINT) - 1) AS l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet'))
        TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    top = con.execute(f"""SELECT l_partkey, count(*) AS c
        FROM read_parquet('{out}/lineitem.parquet')
        GROUP BY 1 ORDER BY c DESC LIMIT 5""").fetchall()
    total = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/lineitem.parquet')").fetchone()[0]
    print("lineitem", total)
    for pk, c in top:
        print(f"hot partkey {pk}: {c} rows ({100.0 * c / total:.1f}%)")

if __name__ == "__main__":
    main()
