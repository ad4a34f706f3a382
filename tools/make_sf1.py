#!/usr/bin/env python
"""Deterministic sf1 (10x sf0.1) synthesis for the bench suite.

The driver ships sf{0.001,0.01,0.1} only; round-4 verdict #8 asks for one
full-suite bench row at 10x to expose any driver-memory or quadratic
surprise hiding below sf0.1's fixed overheads. This builds /tmp/pspark_sf1
from sf0.1 with pure pyarrow (no Spark): ``copies`` key-shifted replicas
of every FACT table, dims (region, nation) kept single — the star-join
semantics survive because every foreign key is shifted by the same
per-copy offset as its referenced primary key. Text payloads repeat
verbatim (realistic for dedup workloads; irrelevant for throughput).

Idempotent via a _SUCCESS marker keyed on (source dir mtime-free content
signature, copies). Never writes outside dst.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-copy offset added to every *key* column; far above any sf0.1 key
SHIFT = 10_000_000

# fact table -> columns to shift (primary + foreign keys, matched offsets)
FACT_KEYS: dict[str, list[str]] = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation"]


def ensure_sf1(src: str = "/root/testdata/sf0.1",
               dst: str = "/tmp/pspark_sf1", copies: int = 10) -> str:
    marker = os.path.join(dst, "_SUCCESS")
    stamp = {"src": src, "copies": copies, "shift": SHIFT, "v": 1}
    if os.path.exists(marker):
        try:
            if json.load(open(marker)) == stamp:
                return dst
        except Exception:
            pass
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
    for t, keys in FACT_KEYS.items():
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        parts = []
        for c in range(copies):
            rep = base
            if c:  # copy 0 is the original — keys identical to sf0.1
                for k in keys:
                    i = rep.schema.get_field_index(k)
                    shifted = pc.add(rep.column(k),
                                     pa.scalar(c * SHIFT,
                                               type=rep.schema.field(k).type))
                    rep = rep.set_column(i, rep.schema.field(k), shifted)
            parts.append(rep)
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(dst, f"{t}.parquet"),
                       row_group_size=1 << 20)
    with open(marker, "w") as f:
        json.dump(stamp, f)
    return dst


if __name__ == "__main__":
    import sys
    out = ensure_sf1(*(sys.argv[1:] or []))
    for name in sorted(os.listdir(out)):
        if name.endswith(".parquet"):
            print(name, pq.ParquetFile(os.path.join(out, name)).metadata.num_rows)
