"""Spark UDF stages — the JVM↔Python Arrow boundary, paid ONCE.

Design (SURVEY.md §3.1/§4): all source-side filters and projections are
authored BEFORE these stages (Catalyst cannot push predicates through a
pandas UDF), and each stage emits narrow, separately-prunable columns.
The extraction itself is embarrassingly parallel per turn — no shuffle
is required at all for the extract stage; shuffles appear only in
conversation-level rollups (which use explicit salting, operators/
scale.py) and in serving-side joins.

Everything here delegates per-turn work to ``core.extract_turn`` — the
same function the single-node oracle runs — via ``mapInPandas`` so the
Arrow batch transfer is vectorized and there is no per-row Python at
the Spark API level (BASELINE.json:15).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from .core import extract_turn
from .schemas import (
    BLOCKS_LONG_SCHEMA,
    EXTRACTED_SPANS_SCHEMA,
    NODES_LONG_SCHEMA,
)

_INPUT_COLS = ["conv_id", "turn_idx", "role", "ts", "text"]


def _block_to_row(b: dict) -> dict:
    """Textract-JSON-shaped block dict → BLOCK_SCHEMA row dict
    (Relationships de-normalized into typed id arrays)."""
    rels: dict[str, list[str]] = {}
    for rel in b.get("Relationships") or []:
        rels.setdefault(rel["Type"], []).extend(rel.get("Ids") or [])
    bb = (b.get("Geometry") or {}).get("BoundingBox")
    geometry = (
        {
            "left": float(bb["Left"]),
            "top": float(bb["Top"]),
            "width": float(bb["Width"]),
            "height": float(bb["Height"]),
        }
        if bb
        else None
    )
    return {
        "id": b["Id"],
        "block_type": b["BlockType"],
        "text": b.get("Text"),
        "confidence": float(b["Confidence"]) if b.get("Confidence") is not None else None,
        "row_index": b.get("RowIndex"),
        "column_index": b.get("ColumnIndex"),
        "row_span": b.get("RowSpan"),
        "column_span": b.get("ColumnSpan"),
        "entity_types": b.get("EntityTypes"),
        "selection_status": b.get("SelectionStatus"),
        "page": b.get("Page"),
        "geometry": geometry,
        "child_ids": rels.get("CHILD"),
        "value_ids": rels.get("VALUE"),
        "answer_ids": rels.get("ANSWER"),
        "merged_ids": rels.get("MERGED_CELL"),
    }


def extract_spans(transcripts: DataFrame) -> DataFrame:
    """The fused extraction stage: transcripts → extracted_spans.

    One ``mapInPandas`` node; output schema EXTRACTED_SPANS_SCHEMA
    (narrow columns: metrics queries never deserialize ``tables``).
    """
    import pandas as pd

    cols = [c for c in _INPUT_COLS if c in transcripts.columns]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            texts = pdf["text"]
            conv = pdf["conv_id"]
            turn = pdf["turn_idx"]
            out = {
                "conv_id": conv,
                "turn_idx": turn,
                "role": pdf["role"] if "role" in pdf else pd.Series([None] * n),
                "ts": pdf["ts"] if "ts" in pdf else pd.Series([None] * n),
                "kind": [],
                "extracted_text": [],
                "tables": [],
                "forms": [],
                "counters": [],
            }
            for key_c, key_t, text in zip(conv, turn, texts):
                res = extract_turn(f"{key_c}|{key_t}", text)
                out["kind"].append(res["kind"])
                out["extracted_text"].append(res["extracted_text"])
                out["tables"].append(res["tables"])
                out["forms"].append(res["forms"])
                out["counters"].append(res["counters"])
            yield pd.DataFrame(out)

    return transcripts.select(*cols).mapInPandas(fn, EXTRACTED_SPANS_SCHEMA)


def extract_blocks_long(transcripts: DataFrame) -> DataFrame:
    """Exploded long-format ``blocks`` table (SURVEY.md §1.4 (b)):
    one row per synthesized Block, for relational B1–B12 queries."""
    import pandas as pd

    cols = [c for c in ("conv_id", "turn_idx", "text") if c in transcripts.columns]
    names = [f.name for f in BLOCKS_LONG_SCHEMA.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key_c, key_t, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                res = extract_turn(f"{key_c}|{key_t}", text)
                for b in res["blocks"]:
                    row = _block_to_row(b)
                    row["conv_id"] = key_c
                    row["turn_idx"] = key_t
                    rows.append(row)
            yield pd.DataFrame(rows, columns=names)

    return transcripts.select(*cols).mapInPandas(fn, BLOCKS_LONG_SCHEMA)


def extract_nodes_long(transcripts: DataFrame) -> DataFrame:
    """Exploded long-format DOM ``nodes`` table for relational D3/D4."""
    import pandas as pd

    cols = [c for c in ("conv_id", "turn_idx", "text") if c in transcripts.columns]
    names = [f.name for f in NODES_LONG_SCHEMA.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key_c, key_t, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                res = extract_turn(f"{key_c}|{key_t}", text)
                for nd in res["nodes"]:
                    nd = dict(nd)
                    nd["conv_id"] = key_c
                    nd["turn_idx"] = key_t
                    nd.pop("in_link", None)
                    rows.append(nd)
            yield pd.DataFrame(rows, columns=names)

    return transcripts.select(*cols).mapInPandas(fn, NODES_LONG_SCHEMA)
