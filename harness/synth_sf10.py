#!/usr/bin/env python3
"""Synthesize the sf10 probe fixture (100x sf0.1). Part 1/2 (r12):
documents (500k), embeddings (200k), lineitem (60M). Part 3 (r13):
the FK'd star-schema dims and the events stream, so the join/window/
event families can be probed at 100x too. Same FK-preserving
replication recipe as synth_sf1.py: 100 copies with CONSISTENT
per-copy key offsets on both sides of every FK (l_orderkey and
o_orderkey step together, o_custkey and c_custkey, l_suppkey and
s_suppkey, l_partkey and p_partkey), so referential integrity holds
in every copy. nation/region are genuine dims — copied once,
unshifted, and every copy's c_nationkey/s_nationkey still resolves.
events replicates by (event_id, user_id): each copy is a fresh user
population over the SAME time range — per-user sessions/funnels stay
intact while windows see 100x density, which is exactly the scale-up
shape a real event stream has.

Usage: python3 harness/synth_sf10.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf10
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
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10")
COPIES = 100

OFFSETS = {
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
}

# small dims: single unshifted copy keeps every replicated FK valid
COPY_AS_IS = ["nation", "region"]


def main():
    DST.mkdir(parents=True, exist_ok=True)
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
        pq.write_table(out, DST / f"{name}.parquet", version="2.6", row_group_size=65536)
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")
    for name in COPY_AS_IS:
        t = pq.read_table(SRC / f"{name}.parquet")
        pq.write_table(t, DST / f"{name}.parquet", version="2.6", row_group_size=65536)
        print(f"{name}: {t.num_rows} rows (dim, unreplicated)")


if __name__ == "__main__":
    main()
