#!/usr/bin/env python3
"""Synthesize a 10x fixture (sf1.0) from the driver's sf0.1 tables.

No driver sf1.0 fixture exists; this replicates each sf0.1 table 10x with
FK-preserving key offsets (same recipe as the round-7 gate, BENCH_LOCAL.md):

  customer   c_custkey            +1M  per copy
  orders     o_orderkey/o_custkey +10M/+1M
  lineitem   l_orderkey/l_partkey/l_suppkey +10M/+1M/+100k
  part       p_partkey            +1M
  supplier   s_suppkey            +100k
  documents  doc_id               +1M   (text replicated verbatim -> true
                                        duplicate PAIRS grow quadratically;
                                        see the round-7 scale-probe notes)
  events     event_id/user_id     +10M
  embeddings vec_id               +1M
  region/nation: single-copy dims.

Usage: python3 harness/synth_sf1.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1.0
"""
# row_group_size=65536: pyarrow's default (1M rows) wrote the 500k-row
# documents table as ONE 156MB row group, which parquet readers cannot
# split -- every document scan ran as a single Spark task and the sf10
# text-family probes measured scan serialization, not operator cost.
# Bounded row groups are what any production writer emits.
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0")
COPIES = 10

# table -> {column: per-copy offset}
OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "documents": {"doc_id": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 10_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
SINGLE_COPY = ["region", "nation"]


def main():
    DST.mkdir(parents=True, exist_ok=True)
    for name in SINGLE_COPY:
        t = pq.read_table(SRC / f"{name}.parquet")
        pq.write_table(t, DST / f"{name}.parquet", version="2.6", row_group_size=65536)
        print(f"{name}: {t.num_rows} rows (single copy)")
    for name, offs in OFFSETS.items():
        t = pq.read_table(SRC / f"{name}.parquet")
        copies = []
        for i in range(COPIES):
            c = t
            for col, step in offs.items():
                idx = c.schema.get_field_index(col)
                shifted = pc.add(c.column(col), pa.scalar(i * step,
                                 type=c.schema.field(col).type))
                c = c.set_column(idx, c.schema.field(col), shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
        # version 2.6 preserves the source timestamp physical type
        pq.write_table(out, DST / f"{name}.parquet", version="2.6", row_group_size=65536)
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
