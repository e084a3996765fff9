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

def copy_suffix(k):
    """Copy-unique token suffix. k ∈ [1, 676]: the original "zz" +
    two-letter base-26 form (kept byte-identical so the 10x/100x
    fixtures reproduce across rounds). k ≥ 677: "qq" + three letters —
    a DIFFERENT marker, so the two forms can never collide: a suffixed
    token t1+"zz"+xy equal to t2+"qq"+uvw would need a 'z' to equal a
    'q' at some aligned position. ("qq" itself is as absent from the
    generator vocabulary as "zz".) Bound: 676 + 26³ = 18,252 copies.
    """
    if k == 0:
        return ""
    if k <= 676:
        return "zz" + chr(ord('a') + (k - 1) // 26) + chr(ord('a') + (k - 1) % 26)
    j = k - 677
    assert j < 26 ** 3, f"copy {k} exceeds the 18,252-copy suffix space"
    return ("qq" + chr(ord('a') + j // 676) + chr(ord('a') + (j // 26) % 26)
            + chr(ord('a') + j % 26))

def scale_documents(src, out, copies):
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pq.read_schema(f"{src}/documents.parquet")
    t = pq.read_table(f"{src}/documents.parquet").to_pylist()
    shift = max(r["doc_id"] for r in t) + 1
    # stream copies to the writer in modest batches: at 1000x the full
    # row list would be tens of GB of Python objects
    writer = pq.ParquetWriter(f"{out}/documents.parquet", schema)
    rows, total = [], 0
    for k in range(copies):
        suf = copy_suffix(k)
        for r in t:
            text = r["text"] if k == 0 else re.sub(
                r"[a-zA-Z]+", lambda m: m.group(0) + suf, r["text"])
            rows.append({"doc_id": r["doc_id"] + k * shift, "text": text,
                         "lang": r["lang"], "source": r["source"],
                         "n_chars": len(text)})
        if len(rows) >= 100_000 or k == copies - 1:
            writer.write_table(pa.Table.from_pylist(rows, schema=schema))
            total += len(rows)
            rows = []
    writer.close()
    return total

def scale_embeddings(src, out, copies):
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pq.read_schema(f"{src}/embeddings.parquet")
    t = pq.read_table(f"{src}/embeddings.parquet").to_pylist()
    shift = max(r["vec_id"] for r in t) + 1
    dim = len(t[0]["embedding"])
    # Per-copy transform: a SIGNED STRIDE PERMUTATION of the
    # coordinates — pure index shuffling, so norms (and intra-copy
    # geometry) are preserved EXACTLY with zero float arithmetic.
    #   copy k:  w[j] = ±v[(s·j + r) mod dim]
    # with rotation r = k mod dim, a global sign flip on odd rotation
    # cycles, and stride s = the (k div 2·dim)-th odd number (s=1 for
    # k < 2·dim, so the 10x and 100x fixtures are byte-identical to
    # the pre-round-9 rotation+flip scheme). Odd s is coprime to the
    # power-of-two dim, so the map is a bijection; distinct
    # (s, r, flip) triples give distinct transforms for up to
    # 2·dim·(dim/2) copies (dim 64 → 4096). Cross-copy similarity of
    # same-base vectors is |Σ ±v_i·v_σ(i)| for the fixed-point-free
    # relative permutation σ — scrambled for the fixture's spread
    # vectors (checked empirically below), while cross-BASE pairs were
    # never similar to begin with.
    assert copies <= 2 * dim * (dim // 2), (
        f"copies={copies} exceeds the transform space 2*dim*(dim/2)="
        f"{2 * dim * (dim // 2)}; add a fourth per-cycle transform")

    def transform(v, k):
        rot = k % dim
        s = 1 + 2 * (k // (2 * dim))
        w = [v[(s * j + rot) % dim] for j in range(dim)]
        if (k // dim) % 2 == 1:
            w = [-x for x in w]
        return w

    # Empirical fixture-quality check: sample relative transforms and
    # assert no same-base cross-copy pair lands near cosine 1 — the
    # invariant the whole doc-axis slope methodology rests on (a
    # cross-copy near-dup would make pair outputs superlinear in
    # copies). Sampled, not exhaustive: cost is vectors × samples.
    # Pairs are (k1, k2) with k1 ≠ k2 INCLUDING nonzero k1: the
    # relative transform between two nonzero copies (composed stride/
    # rotation/flip) lies in the same signed-stride group but largely
    # outside the k-vs-identity set, so sampling only k-vs-0 could
    # miss a high-cosine pair between copies k1,k2 > 0.
    if copies > 2 * dim:
        import random
        rnd = random.Random(9)
        sample_pairs = []
        while len(sample_pairs) < 40:
            k1 = rnd.randrange(0, copies)
            k2 = rnd.randrange(0, copies)
            if k1 != k2:
                sample_pairs.append((k1, k2))
        worst = 0.0
        for k1, k2 in sample_pairs:
            for r in t[:200]:
                v = r["embedding"]
                n2 = sum(x * x for x in v)
                if n2 == 0:
                    continue
                w1 = transform(v, k1)
                w2 = transform(v, k2)
                # transforms are signed permutations: norm-preserving,
                # so n2 is the right normalizer for both sides
                c = abs(sum(a * b for a, b in zip(w1, w2))) / n2
                worst = max(worst, c)
        assert worst < 0.8, (
            f"sampled cross-copy cosine {worst:.3f} — transform too weak "
            "for this vector distribution")

    writer = pq.ParquetWriter(f"{out}/embeddings.parquet", schema)
    rows, total = [], 0
    for k in range(copies):
        for r in t:
            rows.append({"vec_id": r["vec_id"] + k * shift,
                         "embedding": transform(r["embedding"], k),
                         "label": r["label"]})
        if len(rows) >= 100_000 or k == copies - 1:
            writer.write_table(pa.Table.from_pylist(rows, schema=schema))
            total += len(rows)
            rows = []
    writer.close()
    return total

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
