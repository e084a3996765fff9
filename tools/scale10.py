#!/usr/bin/env python3
"""Generate the sf~1 stress fixture: 10x key-shifted copies of the
fact tables (lineitem/orders/events), dims copied unchanged — join
keys stay consistent (l_orderkey shifts with o_orderkey;
o_custkey/l_partkey/l_suppkey still point at the unchanged dims).
Verification-side tooling only (like check.py).

docCopies > 1 additionally scales the TEXT/EMBEDDING axis:
  - documents: doc_id shifted per copy; for copy k > 0 every token
    gets a copy-unique letter suffix ("zz" + letter(k)), so the
    copies are token-disjoint — intra-copy near-dup structure is
    preserved exactly while NO cross-copy pair is a near-dup. Without
    this, 10 identical copies would make every doc a 10-group and
    pair outputs would grow ~45x for 10x input: the slope measured
    would be the fixture's, not the operator's. The dictionary grows
    ~10x — a deliberate worst case for the Heaps-bounded claims.
    n_chars is recomputed so the metadata stays honest.
  - embeddings: vec_id shifted per copy; copy k's vectors are
    cyclically rotated by k dims — norms (and intra-copy geometry)
    preserved EXACTLY with zero float arithmetic, cross-copy
    similarity scrambled.

Usage: python3 tools/scale10.py <srcSfDir> <outDir> [copies=10] [docCopies=1]
"""
import re
import sys
import duckdb

def scale_documents(src, out, copies):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pq.read_table(f"{src}/documents.parquet").to_pylist()
    shift = max(r["doc_id"] for r in t) + 1
    rows = []
    for k in range(copies):
        # two-letter base-26 suffix: unique for up to 677 copies (a
        # single letter repeats after 26, which would make copy 27
        # token-identical to copy 1 and flood the fixture with
        # cross-copy near-dups the slope must not contain)
        suf = "" if k == 0 else "zz" + \
            chr(ord('a') + (k - 1) // 26) + chr(ord('a') + (k - 1) % 26)
        for r in t:
            text = r["text"] if k == 0 else re.sub(
                r"[a-zA-Z]+", lambda m: m.group(0) + suf, r["text"])
            rows.append({"doc_id": r["doc_id"] + k * shift, "text": text,
                         "lang": r["lang"], "source": r["source"],
                         "n_chars": len(text)})
    pq.write_table(pa.Table.from_pylist(
        rows, schema=pq.read_schema(f"{src}/documents.parquet")),
        f"{out}/documents.parquet")
    return len(rows)

def scale_embeddings(src, out, copies):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pq.read_table(f"{src}/embeddings.parquet").to_pylist()
    shift = max(r["vec_id"] for r in t) + 1
    rows = []
    # rotation+sign-flip repeats with period 2*dim: copy 2*dim+k is
    # vector-identical to copy k, which would reintroduce the
    # cross-copy cosine-1 pairs the transform exists to avoid.
    # Every documented fixture (10x, 100x) sits far below the bound.
    dim = len(t[0]["embedding"])
    assert copies <= 2 * dim, (
        f"copies={copies} exceeds the distinctness period 2*dim={2*dim}; "
        "add a third per-cycle transform before scaling this far")
    for k in range(copies):
        for r in t:
            v = r["embedding"]
            # rotation repeats after dim copies (copy dim+1 would be
            # vector-identical to copy 1 → cross-copy cosine-1 pairs);
            # compose with a global sign flip per rotation cycle —
            # norms still preserved exactly, cycle-apart copies land
            # at cosine −1 (far below every similarity threshold)
            rot = k % len(v)
            w = v[rot:] + v[:rot]
            if (k // len(v)) % 2 == 1:
                w = [-x for x in w]
            rows.append({"vec_id": r["vec_id"] + k * shift,
                         "embedding": w, "label": r["label"]})
    pq.write_table(pa.Table.from_pylist(
        rows, schema=pq.read_schema(f"{src}/embeddings.parquet")),
        f"{out}/embeddings.parquet")
    return len(rows)

def main():
    src, out = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    doc_copies = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)
    plain = ["region", "nation", "customer", "supplier", "part"]
    if doc_copies > 1:
        n_docs = scale_documents(src, out, doc_copies)
        n_vecs = scale_embeddings(src, out, doc_copies)
        print("documents", n_docs)
        print("embeddings", n_vecs)
    else:
        plain += ["documents", "embeddings"]
    for t in plain:
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
