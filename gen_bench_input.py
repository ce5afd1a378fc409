#!/usr/bin/env python
"""Materialize the bench transcript table (FIXTURES.md §1 at bench
scale) to parquet, once. Pure pyarrow streaming writer — no Spark —
chunked so memory stays bounded. Rows are globally seed-shuffled, so
whale conversations spread uniformly across files (no file-level skew;
the pipeline's salting still handles key-level skew in rollups).

Usage: python gen_bench_input.py [n_convs] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_textract_enhancer_spark.fixtures import generate_transcripts

N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.bench/transcripts"
N_FILES = 64

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def main() -> None:
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    rows, _ = generate_transcripts(seed=42, n_convs=N_CONVS, with_goldens=False)
    n = len(rows)
    per = -(-n // N_FILES)
    total = 0
    for i in range(N_FILES):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            break
        tbl = pa.Table.from_pylist(
            [
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "role": r["role"],
                    "text": r["text"],
                    "tool": r["tool"],
                    "ts": r["ts"].replace(tzinfo=None),
                }
                for r in chunk
            ],
            schema=SCHEMA,
        )
        pq.write_table(tbl, os.path.join(OUT, f"part-{i:04d}.parquet"))
        total += len(chunk)
    print(f"wrote {total} turns over {min(N_FILES, i + 1)} files to {OUT}")


if __name__ == "__main__":
    main()
