#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset (10x sf0.1) as key-shifted copies,
preserving each table's physical schema (events.ts stays exactly as the
driver wrote it). Clones are deliberate worst cases: documents become
10-cliques for every near-dup family, events timestamps get 10x denser
per event_type.

Shifted keys per table keep join consistency:
  customer.c_custkey <-> orders.o_custkey; orders.o_orderkey <->
  lineitem.l_orderkey; events event_id/user_id; documents doc_id;
  embeddings vec_id. Dimension tables (region/nation/supplier/part) copy
  once, so lineitem.l_partkey/l_suppkey stay valid.

Usage: python3 scripts/make_sf1.py [outDir=/tmp/sf1] [copies=10]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10

SHIFTS = {  # table -> {column: per-copy shift}
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
    "customer": {"c_custkey": 10_000_000},
}
COPY_ONCE = ["region", "nation", "supplier", "part"]

import os
os.makedirs(OUT, exist_ok=True)
for t in COPY_ONCE:
    tab = pq.read_table(f"{SRC}/{t}.parquet")
    pq.write_table(tab, f"{OUT}/{t}.parquet")
    print(f"{t}: {tab.num_rows} (copied once)")
for t, shifts in SHIFTS.items():
    tab = pq.read_table(f"{SRC}/{t}.parquet")
    copies = []
    for i in range(K):
        c = tab
        for col, shift in shifts.items():
            idx = c.schema.get_field_index(col)
            shifted = pa.compute.add(c.column(col), i * shift)
            c = c.set_column(idx, c.schema.field(col),
                             shifted.cast(c.schema.field(col).type))
        copies.append(c)
    big = pa.concat_tables(copies)
    pq.write_table(big, f"{OUT}/{t}.parquet")
    print(f"{t}: {tab.num_rows} -> {big.num_rows}")
