#!/usr/bin/env python3
"""Scale the driver testdata by an integer factor, preserving schema
(including events' TIMESTAMP(NANOS)) and FK consistency.

Usage: python3 tools/scale_up.py SRC_DIR DEST_DIR FACTOR

Replica r (r = 1..factor-1) offsets every key column by r * (max+1) of
its base table, so joins stay consistent and replicas are disjoint:
  orders/lineitem share the o_orderkey offset, orders.o_custkey tracks
  customer, lineitem.l_partkey/l_suppkey track part/supplier.
region/nation don't scale (TPC-H semantics). Documents get a per-replica
WORD RENAMING (every whitespace token suffixed) so exact- AND near-dup
structure scales linearly — cross-replica shingle sets are disjoint while
within-replica Jaccard is untouched; embeddings get a per-replica
sign-flip pattern (norm-preserving) so cross-replica cosines decorrelate
and near-dup pair counts scale linearly, not quadratically.

Deterministic: no RNG anywhere — offsets, suffixes, and sign patterns
are pure functions of (replica, position).
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def read(src, name):
    return pq.read_table(f"{src}/{name}.parquet")


def write(dest, name, table):
    # 50k-row row groups (pyarrow's default is 1M): Spark plans byte-range
    # splits but a split only carries the row groups whose MIDPOINT lands
    # in it — with 1M-row groups a 1.5M-row table ran as TWO tasks no
    # matter how many splits were planned, which is nothing like a real
    # many-file corpus and silently serialized every scan-side stage
    # (measured r16: the sf30 shingle pass 39 s on 2 effective tasks vs
    # 5 s properly spread). Real 100 TB tables span thousands of files;
    # small row groups are what makes the local curve representative.
    pq.write_table(table, f"{dest}/{name}.parquet", row_group_size=50000)


def offset_col(table, col, off):
    i = table.schema.get_field_index(col)
    arr = pa.compute.add(table.column(col), off)
    return table.set_column(i, table.schema.field(col), arr)


def main():
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dest, exist_ok=True)

    # key spans from the base tables
    def span(name, col):
        t = read(src, name)
        return pa.compute.max(t.column(col)).as_py() + 1

    spans = {
        "order": span("orders", "o_orderkey"),
        "cust": span("customer", "c_custkey"),
        "part": span("part", "p_partkey"),
        "supp": span("supplier", "s_suppkey"),
        "event": span("events", "event_id"),
        "user": span("events", "user_id"),
        "doc": span("documents", "doc_id"),
        "vec": span("embeddings", "vec_id"),
    }

    # non-scaling dimensions: verbatim copy
    for name in ("region", "nation"):
        write(dest, name, read(src, name))

    plans = {
        "customer": {"c_custkey": "cust"},
        "supplier": {"s_suppkey": "supp"},
        "part": {"p_partkey": "part"},
        "orders": {"o_orderkey": "order", "o_custkey": "cust"},
        "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                     "l_suppkey": "supp"},
        "events": {"event_id": "event", "user_id": "user"},
    }
    for name, keymap in plans.items():
        base = read(src, name)
        reps = []
        for r in range(factor):
            t = base
            for col, k in keymap.items():
                t = offset_col(t, col, r * spans[k])
            reps.append(t)
        write(dest, name, pa.concat_tables(reps))

    # documents: per-replica word renaming. A single appended suffix
    # token decorrelates EXACT dups but leaves cross-replica shingle
    # Jaccard at ~0.99 for long docs, so every base near-dup cluster of
    # size s becomes one cluster of size s*factor and pair counts grow
    # with factor^2 (at factor=100 that was ~345M pairs and an OOM).
    # Renaming EVERY whitespace token with a replica suffix is a
    # bijection on words: within-replica dup/near-dup structure is
    # preserved exactly (token sets map 1:1, shingle Jaccard unchanged),
    # while cross-replica shingle sets become fully disjoint — so both
    # exact- and near-dup pairs scale linearly, as the embeddings'
    # sign-flip already does for cosine pairs.
    base = read(src, "documents")
    reps = []
    for r in range(factor):
        t = offset_col(base, "doc_id", r * spans["doc"])
        if r > 0:
            suf = f"r{r}x"
            texts = pa.array(
                [None if v is None else
                 " ".join(w + suf if w else w for w in v.split(" "))
                 for v in t.column("text").to_pylist()],
                type=pa.string())
            i = t.schema.get_field_index("text")
            t = t.set_column(i, t.schema.field("text"), texts)
        reps.append(t)
    write(dest, "documents", pa.concat_tables(reps))

    # embeddings: norm-preserving per-replica sign flips
    base = read(src, "embeddings")
    dims = len(base.column("embedding")[0].as_py())
    reps = []
    for r in range(factor):
        t = offset_col(base, "vec_id", r * spans["vec"])
        if r > 0:
            # deterministic ±1 pattern per (replica, dim)
            bits = np.array([(r * 2654435761 + d * 40503) % 7 < 3
                             for d in range(dims)])
            signs = np.where(bits, np.float32(-1.0), np.float32(1.0))
            embs = t.column("embedding").combine_chunks()
            flat = embs.values.to_numpy(zero_copy_only=False)
            n = len(t)
            flipped = (flat.reshape(n, dims) * signs).astype(np.float32)
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(flipped.ravel(), type=pa.float32()), dims)
            # match the source list<float> type
            arr = arr.cast(pa.list_(pa.field("element", pa.float32())))
            i = t.schema.get_field_index("embedding")
            t = t.set_column(i, t.schema.field("embedding"), arr)
        reps.append(t)
    write(dest, "embeddings", pa.concat_tables(reps))

    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        n = pq.ParquetFile(f"{dest}/{name}.parquet").metadata.num_rows
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
