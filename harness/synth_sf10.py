#!/usr/bin/env python3
"""Synthesize the sf10 probe fixture (100x sf0.1) for the
scale-sensitive families only (VERDICT r11 task 7): documents (500k),
embeddings (200k), lineitem (60M — the bench warmup table). Same
FK-preserving replication recipe as synth_sf1.py, 100 copies with the
same per-copy key offsets (sf0.1 keys are far below one step, so no
copy collides).

Usage: python3 harness/synth_sf10.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/sf10
"""
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
}


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
        pq.write_table(out, DST / f"{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
