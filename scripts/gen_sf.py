#!/usr/bin/env python
"""Deterministic scale-up of the driver's synthetic testdata.

Produces an ``sfN`` directory as a K-fold replica scale-up of a source SF
directory (default: sf0.1 x10 -> sf1), preserving each table's parquet
schema exactly. The driver's own generator is not available, so scaling
follows the standard replicate-with-key-shift technique (the same shape
TPC-H uses: fact/dim cardinalities grow linearly, fixed dims stay fixed):

- replica 0 is the ORIGINAL data bit-for-bit, so literal-predicate queries
  (vec_id < 10 probes, doc_id < 20 benchmark slice) keep their semantics —
  fixed probe sets against a K-times corpus;
- replicas 1..K-1 shift every primary/foreign key by r * (max_key + 1),
  consistently across fact tables, so join fan-outs and per-key group
  sizes are preserved within each replica;
- nation/region are FIXED dimensions (like TPC-H) and are not replicated;
- document text in replica r has every token prefixed with ``r<r>x`` so
  within-replica shingle/near-dup/winnowing structure replicates exactly
  while across replicas no shingle ever collides — near-dup output grows
  linearly with SF instead of quadratically via artificial twins
  (n_chars is recomputed to stay consistent with the rewritten text);
- embeddings in replica r get a seeded per-replica permutation +
  sign-flip of the 64 dimensions: an ORTHOGONAL transform, so all
  within-replica cosines/distances are preserved exactly while
  cross-replica vectors are uncorrelated — ANN/near-dup structure again
  scales linearly;
- events keep their timestamps (time-bucket groups grow K-fold, the
  realistic shape for a busier system) with event/user ids shifted.

Usage: python scripts/gen_sf.py [--src /root/testdata/sf0.1] \
           [--out <repo>/testdata/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (table, {column: key_space}) — every column shifted by r * (max+1) of its
# key space, computed from the source data below.
KEY_COLS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
KEY_SPACE_SOURCE = {  # key space -> (table, column) holding its full range
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
FIXED_DIMS = ("region", "nation")
FACTS = ("customer", "supplier", "part", "orders", "lineitem", "events",
         "documents", "embeddings")


def remap_tokens(text: str, r: int) -> str:
    p = f"r{r}x"
    return " ".join(p + t for t in text.split(" "))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "testdata", "sf1"))
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    spaces = {}
    for space, (tab, col) in KEY_SPACE_SOURCE.items():
        t = pq.read_table(f"{args.src}/{tab}.parquet", columns=[col])
        spaces[space] = int(t[col].to_numpy().max()) + 1

    for tab in FIXED_DIMS:
        src = pq.read_table(f"{args.src}/{tab}.parquet")
        pq.write_table(src, f"{args.out}/{tab}.parquet")
        print(f"{tab}: fixed dim, {src.num_rows} rows")

    for tab in FACTS:
        src = pq.read_table(f"{args.src}/{tab}.parquet")
        schema = src.schema
        reps = []
        for r in range(args.k):
            cols = {}
            # remap once per replica: text and n_chars derive from the
            # SAME pass (the string rewrite dominates the documents
            # scale-up — no reason to run it twice)
            remapped = ([remap_tokens(t, r) for t in
                         src["text"].to_pylist()]
                        if tab == "documents" and r > 0 else None)
            for name in schema.names:
                arr = src[name]
                if name in KEY_COLS.get(tab, {}):
                    shift = r * spaces[KEY_COLS[tab][name]]
                    vals = arr.to_numpy(zero_copy_only=False) + shift
                    cols[name] = pa.array(vals, type=schema.field(name).type)
                elif remapped is not None and name == "text":
                    cols[name] = pa.array(remapped, type=pa.string())
                elif remapped is not None and name == "n_chars":
                    # recomputed after token remap (kept consistent with text)
                    cols[name] = pa.array([len(t) for t in remapped],
                                          type=pa.int64())
                elif tab == "embeddings" and name == "embedding" and r > 0:
                    mat = np.array(arr.to_pylist(), dtype=np.float32)
                    rng = np.random.default_rng(42 + r)
                    perm = rng.permutation(mat.shape[1])
                    signs = rng.choice(np.float32([-1.0, 1.0]),
                                       size=mat.shape[1])
                    mat = mat[:, perm] * signs  # orthogonal: cosines preserved
                    cols[name] = pa.array(mat.tolist(),
                                          type=schema.field(name).type)
                else:
                    cols[name] = arr.combine_chunks()
            reps.append(pa.table(cols, schema=schema))
        out = pa.concat_tables(reps)
        # Bounded row groups: a parquet reader — Spark's FileSourceScan
        # AND DuckDB's parallel scan — cannot parallelize below row-group
        # granularity (a byte-range split with no row-group start is an
        # empty task), and pyarrow's default 1M-row groups made sf10
        # documents (61 MB) / embeddings (31 MB) SINGLE-row-group files
        # no engine could scan in parallel. Target ~64 groups per table
        # (two waves of 32 tasks) with a 10k-row floor so tiny groups
        # don't inflate encoding overhead on wide fact tables.
        rows_per_group = max(10_000, out.num_rows // 64)
        pq.write_table(out, f"{args.out}/{tab}.parquet",
                       row_group_size=rows_per_group)
        print(f"{tab}: {src.num_rows} -> {out.num_rows} rows "
              f"(row_group_size={rows_per_group})")


if __name__ == "__main__":
    main()
