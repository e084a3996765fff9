#!/usr/bin/env python3
"""Generate the sf~1 stress fixture: 10x key-shifted copies of the
fact tables (lineitem/orders/events), dims and text/embedding tables
copied unchanged — join keys stay consistent (l_orderkey shifts with
o_orderkey; o_custkey/l_partkey/l_suppkey still point at the
unchanged dims). Verification-side tooling only (like check.py).

Usage: python3 tools/scale10.py <srcSfDir> <outDir> [copies=10]
"""
import sys
import duckdb

def main():
    src, out = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "documents", "embeddings"]:
        con.execute(f"""COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
                        TO '{out}/{t}.parquet' (FORMAT PARQUET)""")
    okey = con.execute(f"SELECT MAX(o_orderkey)+1 FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
    ekey = con.execute(f"SELECT MAX(event_id)+1 FROM read_parquet('{src}/events.parquet')").fetchone()[0]
    shifted = " UNION ALL ".join(
        f"SELECT o_orderkey + {k * okey} AS o_orderkey, o_custkey, o_orderstatus,"
        f" o_totalprice, o_orderdate, o_orderpriority"
        f" FROM read_parquet('{src}/orders.parquet')" for k in range(copies))
    con.execute(f"COPY ({shifted}) TO '{out}/orders.parquet' (FORMAT PARQUET)")
    shifted = " UNION ALL ".join(
        f"SELECT l_orderkey + {k * okey} AS l_orderkey, l_partkey, l_suppkey,"
        f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        f" l_returnflag, l_linestatus, l_shipdate"
        f" FROM read_parquet('{src}/lineitem.parquet')" for k in range(copies))
    con.execute(f"COPY ({shifted}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    # ts must stay TIMESTAMP(NANOS) — the engine's loader contract
    # (Tables.events reads the column as raw nanos via nanosAsLong) —
    # and DuckDB's parquet writer coerces to micros, so events goes
    # through pyarrow instead
    import pyarrow as pa
    import pyarrow.parquet as pq
    ev = pq.read_table(f"{src}/events.parquet")
    ids = ev.column("event_id")
    import pyarrow.compute as pc
    batches = []
    for k in range(copies):
        batches.append(ev.set_column(
            ev.schema.get_field_index("event_id"), "event_id",
            pc.add(ids, pa.scalar(k * ekey, type=ids.type))))
    pq.write_table(pa.concat_tables(batches), f"{out}/events.parquet")
    for t in ["orders", "lineitem", "events"]:
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(t, n)

if __name__ == "__main__":
    main()
