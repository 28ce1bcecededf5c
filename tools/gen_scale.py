#!/usr/bin/env python3
"""Scale up the driver-generated testdata by replication with key
shifts — dev utility for the sf1 soak (not part of the library).

Each output table is N copies of the input with every id/key column
shifted per replica so keys stay unique and foreign keys stay
consistent WITHIN a replica (replica 0 is the original data). Text,
embeddings, and timestamps are left verbatim: cross-replica rows are
exact duplicates — the realistic shape of mirrored/boilerplate mass at
crawl scale, and exactly what the dedup operators' bucket caps are
designed to absorb.

Usage: gen_scale.py SRC_DIR DST_DIR N [table,table,...]
(the optional 4th arg restricts generation to those tables — e.g. the
sf100 soak only needs documents+embeddings, not a 600M-row lineitem)
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import os

# per-table key columns and their per-replica shift (int32 dims get a
# small shift to stay in range; int64 facts a large one)
SHIFTS = {
    "region":    {"r_regionkey": 1000},
    "nation":    {"n_nationkey": 1000, "n_regionkey": 1000},
    "customer":  {"c_custkey": 100_000_000, "c_nationkey": 1000},
    "supplier":  {"s_suppkey": 100_000_000, "s_nationkey": 1000},
    "part":      {"p_partkey": 100_000_000},
    "orders":    {"o_orderkey": 100_000_000, "o_custkey": 100_000_000},
    "lineitem":  {"l_orderkey": 100_000_000, "l_partkey": 100_000_000,
                  "l_suppkey": 100_000_000},
    "events":    {"event_id": 100_000_000, "user_id": 100_000_000},
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
}


def main(src, dst, n, only=None):
    os.makedirs(dst, exist_ok=True)
    for name, shifts in SHIFTS.items():
        if only and name not in only:
            continue
        t = pq.read_table(f"{src}/{name}.parquet")
        # stream replica-by-replica: concatenating N replicas first
        # holds N copies in memory (~60 GB for lineitem at N=1000).
        # `with` closes the writer on ANY exit path — a mid-replication
        # failure must not leave a footerless parquet file behind for a
        # later soak run to trip over.
        total = 0
        with pq.ParquetWriter(f"{dst}/{name}.parquet", t.schema) as writer:
            for i in range(n):
                r = t
                if i > 0:
                    for col, step in shifts.items():
                        idx = r.schema.get_field_index(col)
                        typ = r.schema.field(idx).type
                        shifted = pc.cast(
                            pc.add(pc.cast(r.column(idx), pa.int64()), i * step), typ)
                        r = r.set_column(idx, r.schema.field(idx), shifted)
                writer.write_table(r)
                total += r.num_rows
        print(f"{name}: {t.num_rows} -> {total} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]),
         set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None)
