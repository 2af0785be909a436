#!/usr/bin/env python3
"""Replicate a testdata SF directory N× for bench-only scale rehearsals.

Each copy shifts every key/foreign-key column by copy_index * (max+1), so
the scaled corpus has N× the entities (more orders, more users, more docs)
rather than N rows per key — per-series/per-key cardinalities stay
constant, which is what a larger SF means. Document text and embeddings
are NOT perturbed: a 10× corpus where every text recurs 10 times is a
duplication-heavy worst case for the dedup/LSH family (real corpora are
duplication-heavy too), and identical vectors stress the ANN bucket joins.

Bench-only: the DuckDB oracle gate still runs against the driver's
original directories. Usage: make_scaled.py <srcDir> <dstDir> <copies>
"""
import sys, os, glob
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    # nation, region: dimension tables, copied as-is
}

def main(src, dst, copies):
    os.makedirs(dst, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(path)[: -len(".parquet")]
        t = pq.read_table(path)
        shift_cols = SHIFT_COLS.get(name, [])
        if not shift_cols:
            pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
            print(f"{name}: copied ({t.num_rows} rows)")
            continue
        strides = {
            c: pc.max(t.column(c)).as_py() + 1 for c in shift_cols
        }
        parts = []
        for i in range(copies):
            if i == 0:
                parts.append(t)
                continue
            cols = []
            for field in t.schema:
                col = t.column(field.name)
                if field.name in strides:
                    col = pc.add(col, pa.scalar(i * strides[field.name],
                                                type=field.type))
                cols.append(col)
            parts.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
