#!/usr/bin/env python3
"""Replicate a testdata SF directory N× for bench-only scale rehearsals.

Each copy shifts every key/foreign-key column by copy_index * domain
stride, so the scaled corpus has N× the entities (more orders, more
users, more docs) rather than N rows per key — per-series/per-key
cardinalities stay constant, which is what a larger SF means.

Strides are computed PER KEY DOMAIN from the domain's primary table
(max+1), not per table: if the same stride weren't applied to both
c_custkey and o_custkey, copies would dereference the WRONG customer
whenever the primary's max key has no referencing rows (TPC-H leaves
every third customer orderless), silently corrupting every scaled join.

Document TEXT is perturbed per replica with a stable suffix token
(" r<copy_index>"; copy 0 verbatim): verbatim replicas made every text
an exact 100-plex at sf10, which turned the LLM flagship probes into a
duplication-pathology measurement instead of a scale one (r14 verdict:
pipeline_curate emitted ZERO survivors because the eval slice contained
~every text; contamination read all-leakage). The suffix keeps doc
lengths and vocabulary shape (it adds one short token and ~100 vocab
entries corpus-wide) while making replicas NEAR-duplicates — which is
what a real crawl's multiplicity looks like: the MinHash/LSH family
still collapses replica cliques (high Jaccard), exact dedup correctly
does not, and survivors exist.

Embedding VECTORS get the same de-degeneration (r15 verdict): verbatim
vector replicas meant the distinct-vector mass never grew with SF —
every scaled ANN recall/sweep ran against tie-degenerate top-k and a
training set whose effective size was the base fixture's, so the m/k
conclusion ("codebook capacity pays only with training mass") could
never be re-asked at mass. Each replica i >= 1 adds a deterministic
epsilon ((i % 1021 + 1) * 2^-20, a dyadic-grid multiple, so the
engine's floor(x * 2^20) requantization sees it exactly rather than
on a grid-boundary coin flip) to ONE component ((i - 1) % dim,
rotating so different replica indices perturb different axes).
Replicas stay near-duplicates in vector space (epsilon ~1e-6..1e-3 on
one axis: same cells, near-ties broken deterministically) while the
distinct-vector count grows with SF. Copy 0 stays verbatim, so the
vec_id < 10/20/50 query slices and every oracle-gated directory are
untouched.

Bench-only: the DuckDB oracle gate still runs against the driver's
original directories. Usage: make_scaled.py <srcDir> <dstDir> <copies>
"""
import sys, os, glob
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# domain -> (primary table, primary key column): the stride source
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "dockey": ("documents", "doc_id"),
    "veckey": ("embeddings", "vec_id"),
    "eventkey": ("events", "event_id"),
    "userkey": ("events", "user_id"),
}

# table -> text column perturbed per replica (see module docstring)
TEXT_PERTURB = {"documents": "text"}

# table -> list<float> column perturbed per replica (see module docstring)
VEC_PERTURB = {"embeddings": "embedding"}

# domain -> eval-split modulus to PRESERVE under scaling: the repo's
# decontamination/curation queries hold out doc_id % 17 == 0 as the eval
# slice. An arbitrary stride scatters a base text's replicas across BOTH
# sides of that split — manufacturing eval->train content leakage the
# base fixture doesn't have (r14 sf10: pipeline_curate correctly emitted
# ZERO survivors because ~every train text had an eval-slice near-copy).
# Rounding the stride up to a multiple of the split modulus keeps each
# base text's replicas on ONE side — the content-level (group-aware)
# holdout SplitHygiene prescribes; a real benchmark is held out with its
# duplicates, not row-wise.
HOLDOUT_MOD = {"dockey": 17}

# table -> {column: domain}; nation/region are dimensions, copied as-is
COL_DOMAIN = {
    "documents": {"doc_id": "dockey"},
    "embeddings": {"vec_id": "veckey"},
    "events": {"event_id": "eventkey", "user_id": "userkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
}


def perturb_vectors(col, i):
    """Replica i's vector de-degeneration: one dyadic-grid epsilon on one
    rotating component (module docstring). Vectorized over the flattened
    float values; loud on ragged/null lists (the fixture is fixed-width —
    a silent fallback would reintroduce verbatim replicas)."""
    import numpy as np
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    assert arr.null_count == 0, "null embedding in fixture"
    lengths = pc.list_value_length(arr)
    dim = pc.min(lengths).as_py()
    assert dim == pc.max(lengths).as_py() and dim > 0, \
        f"ragged embedding lists (min {dim}, max {pc.max(lengths).as_py()})"
    flat = np.asarray(arr.flatten())  # honors offsets; float32
    out = flat.copy()
    eps = np.float32(((i % 1021) + 1) * 2.0 ** -20)
    j = (i - 1) % dim
    out[j::dim] += eps
    values = pa.array(out, type=arr.type.value_type)
    # rebuild contiguous offsets (flatten() already dropped any base
    # offset, and the width is uniform by the assert above)
    offsets = pa.array(np.arange(0, (len(arr) + 1) * dim, dim,
                                 dtype=np.int32), type=pa.int32())
    return pa.ListArray.from_arrays(offsets, values)


def domain_strides(src):
    strides = {}
    for dom, (table, col) in DOMAINS.items():
        path = os.path.join(src, f"{table}.parquet")
        if os.path.exists(path):
            t = pq.read_table(path, columns=[col])
            stride = pc.max(t.column(col)).as_py() + 1
            mod = HOLDOUT_MOD.get(dom)
            if mod:  # keep replica ids on the base id's side of the split
                stride += -stride % mod
            strides[dom] = stride
    return strides


def main(src, dst, copies):
    os.makedirs(dst, exist_ok=True)
    strides = domain_strides(src)
    for path in sorted(glob.glob(os.path.join(src, "*.parquet"))):
        name = os.path.basename(path)[: -len(".parquet")]
        t = pq.read_table(path)
        col_domain = COL_DOMAIN.get(name, {})
        if not col_domain:
            pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
            print(f"{name}: copied ({t.num_rows} rows)")
            continue
        # a domain without its primary table has no FK-aligned stride; a
        # per-table max+1 fallback would silently mis-align copies, so fail
        missing = sorted(d for d in set(col_domain.values()) if d not in strides)
        if missing:
            raise SystemExit(
                f"{name}: no stride for domain(s) "
                + ", ".join(f"{d} (primary table {DOMAINS[d][0]}.parquet)"
                            for d in missing)
                + f" — add the primary table(s) to {src} or scale the full dir")
        parts = []
        for i in range(copies):
            if i == 0:
                parts.append(t)
                continue
            cols = []
            for field in t.schema:
                col = t.column(field.name)
                if field.name in col_domain:
                    stride = strides[col_domain[field.name]]
                    col = pc.add(col, pa.scalar(i * stride, type=field.type))
                elif field.name == TEXT_PERTURB.get(name):
                    # stable per-replica suffix token; null text stays null
                    col = pc.binary_join_element_wise(
                        col, pa.scalar(f"r{i}", type=field.type),
                        pa.scalar(" ", type=field.type))
                elif field.name == VEC_PERTURB.get(name):
                    col = perturb_vectors(col, i)
                cols.append(col)
            parts.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
