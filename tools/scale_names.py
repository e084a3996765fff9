#!/usr/bin/env python3
"""Scaled part-name catalog for the fuzzy/ER blocking-geometry slope.

The stock fixtures cannot measure blocking slopes: TPC-H part names
draw from one tiny pool, so /root/testdata/sf*/part.parquet holds the
SAME ~64 distinct names at every scale factor, and tools/scale10.py
copies `part` unchanged.  This tool synthesizes a catalog whose name
dictionary actually grows, with the token structure that makes
first-token blocking quadratic in the real world:

  - the FIRST token of every name comes from a small FIXED vocabulary
    (brands / leading adjectives — TPC-H's own 90-ish word list), so
    first-token blocks grow linearly with the catalog and their pair
    counts quadratically;
  - the remaining tokens come from a vocabulary that grows with the
    catalog per Heaps' law (V ~ N^0.7 — model numbers, specific
    descriptors), Zipf-skewed, so a name's RAREST token has bounded
    document frequency and rarest-token blocks stay near-constant.

Usage: scale_names.py <src_sf_dir> <out_dir> <K>
Writes <out_dir>/part.parquet with K * 2000 rows (distinct names),
schema-compatible with the fixture part table (p_partkey, p_name,
p_brand, p_size, p_retailprice + padding columns read by Tables.part).
Deterministic for a given K.
"""
import sys
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    schema_cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/part.parquet')").fetchall()]
    # fixed leading vocabulary: the actual token pool of the source names
    base = sorted({t for (name,) in con.execute(
        f"SELECT DISTINCT p_name FROM read_parquet('{src}/part.parquet')").fetchall()
        for t in name.split(" ")})
    n = 2000 * k
    # Heaps-law tail vocabulary: V = 200 * K^0.7, Zipf-skewed usage
    vtail = max(200, int(200 * (k ** 0.7)))
    tail = [f"{base[i % len(base)]}{i:05d}" for i in range(vtail)]
    rng = random.Random(42)  # same seed at every K: catalogs nest
    zipf_w = [1.0 / (i + 1) ** 0.8 for i in range(vtail)]
    rows = {c: [] for c in ("p_partkey", "p_name", "p_brand", "p_size",
                            "p_retailprice")}
    seen = set()
    i = 0
    while len(seen) < n:
        first = base[rng.randrange(len(base))]
        rest = rng.choices(tail, weights=zipf_w, k=4)
        name = " ".join([first] + rest)
        if name in seen:
            continue
        seen.add(name)
        rows["p_partkey"].append(i + 1)
        rows["p_name"].append(name)
        rows["p_brand"].append(f"Brand#{(i % 25) + 11}")
        rows["p_size"].append((i % 50) + 1)
        rows["p_retailprice"].append(round(900.0 + (i % 1000) * 0.1, 2))
        i += 1
    import os
    os.makedirs(out, exist_ok=True)
    t = pa.table({
        "p_partkey": pa.array(rows["p_partkey"], pa.int64()),
        "p_name": pa.array(rows["p_name"], pa.string()),
        "p_brand": pa.array(rows["p_brand"], pa.string()),
        "p_size": pa.array(rows["p_size"], pa.int32()),
        "p_retailprice": pa.array(rows["p_retailprice"], pa.float64()),
    })
    # null-fill any extra source columns so Tables.part's schema holds
    for c in schema_cols:
        if c not in t.column_names:
            t = t.append_column(c, pa.nulls(n, pa.string()))
    t = t.select(schema_cols)
    pq.write_table(t, f"{out}/part.parquet")
    print(f"wrote {out}/part.parquet: {n} names, "
          f"first-vocab={len(base)}, tail-vocab={vtail}")


if __name__ == "__main__":
    main()
