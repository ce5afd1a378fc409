#!/usr/bin/env python
"""Materialize the committed golden_spans fixture (FIXTURES.md §3):
the single-node oracle's output for the seed=42 small corpus, written
as parquet into tests/goldens/. Committed to git — the Spark pipeline
must match this FILE per-turn, so core/generator co-drift across
rounds is caught, not silently re-baselined.

Regenerate ONLY on an intentional behavior change:
    python make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amazon_textract_enhancer_spark import oracle
from amazon_textract_enhancer_spark.fixtures import generate_transcripts

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "goldens")
SEED, N_CONVS = 42, 25


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rows, _ = generate_transcripts(seed=SEED, n_convs=N_CONVS)
    spans = oracle.extract_rows(rows)
    tbl = pa.Table.from_pylist(
        [
            {
                "conv_id": s["conv_id"],
                "turn_idx": s["turn_idx"],
                "kind": s["kind"],
                "extracted_text": s["extracted_text"],
                "n_tables": len(s["tables"]),
                "n_forms": len(s["forms"]),
                "tables_json": json.dumps(s["tables"], sort_keys=True),
                "forms_json": json.dumps(s["forms"], sort_keys=True),
                "skipped": bool(s["counters"]["skipped"]),
            }
            for s in spans
        ],
        schema=pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("kind", pa.string()),
                ("extracted_text", pa.string()),
                ("n_tables", pa.int32()),
                ("n_forms", pa.int32()),
                ("tables_json", pa.string()),
                ("forms_json", pa.string()),
                ("skipped", pa.bool_()),
            ]
        ),
    )
    path = os.path.join(OUT, f"golden_spans_seed{SEED}_n{N_CONVS}.parquet")
    pq.write_table(tbl, path)
    print(f"wrote {tbl.num_rows} golden rows to {path}")


if __name__ == "__main__":
    main()
