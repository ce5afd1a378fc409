"""Spark UDF stages — the JVM↔Python Arrow boundary, paid ONCE.

Design (SURVEY.md §3.1/§4): all source-side filters and projections are
authored BEFORE these stages (Catalyst cannot push predicates through a
Python UDF), and each stage emits narrow, separately-prunable columns.
The extraction itself is embarrassingly parallel per turn — no shuffle
is required at all for the extract stage; shuffles appear only in
conversation-level rollups (explicit salting, operators/scale.py) and
serving-side joins.

Implementation detail that matters at scale: the stages use
``mapInArrow`` and build output RecordBatches with explicit pyarrow
types. PySpark's generic pandas→Arrow converter walks nested
struct/array columns row-by-row in Python (~6x slower end-to-end for
our TABLE_SPAN/KV_SPAN columns, measured in-sandbox); ``pa.array`` with
an explicit type is a single C++ call. Passthrough columns (conv_id,
turn_idx, role, ts) are forwarded as the INPUT batch's own Arrow
arrays — zero copies, zero type drift.

Everything delegates per-turn work to ``core.extract_turn`` — the same
function the single-node oracle runs — so there is no per-row Python
at the Spark API level (BASELINE.json:15) and oracle equality is by
construction.
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


def _arrow_schema(spark_schema):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def extract_spans(transcripts: DataFrame) -> DataFrame:
    """The fused extraction stage: transcripts → extracted_spans.

    One ``mapInArrow`` node; output schema EXTRACTED_SPANS_SCHEMA
    (narrow columns: metrics queries never deserialize ``tables``).
    """
    import pyarrow as pa

    has_role = "role" in transcripts.columns
    has_ts = "ts" in transcripts.columns
    cols = ["conv_id", "turn_idx"] + (["role"] if has_role else []) + (
        ["ts"] if has_ts else []
    ) + ["text"]
    src = transcripts.select(*cols)

    out_schema = EXTRACTED_SPANS_SCHEMA
    arrow_out = _arrow_schema(out_schema)
    t_tables = arrow_out.field("tables").type
    t_forms = arrow_out.field("forms").type
    t_counters = arrow_out.field("counters").type

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            conv = rb.column(rb.schema.get_field_index("conv_id"))
            turn = rb.column(rb.schema.get_field_index("turn_idx"))
            texts = rb.column(rb.schema.get_field_index("text")).to_pylist()
            keys_c = conv.to_pylist()
            keys_t = turn.to_pylist()
            n = len(texts)
            kinds, main, tables, forms, counters = [], [], [], [], []
            for kc, kt, tx in zip(keys_c, keys_t, texts):
                res = extract_turn(f"{kc}|{kt}", tx)
                kinds.append(res["kind"])
                main.append(res["extracted_text"])
                tables.append(res["tables"])
                forms.append(res["forms"])
                counters.append(res["counters"])
            if has_role:
                role = rb.column(rb.schema.get_field_index("role"))
            else:
                role = pa.nulls(n, pa.string())
            if has_ts:
                ts = rb.column(rb.schema.get_field_index("ts"))
            else:
                ts = pa.nulls(n, arrow_out.field("ts").type)
            yield pa.RecordBatch.from_arrays(
                [
                    conv,
                    turn,
                    role,
                    ts.cast(arrow_out.field("ts").type),
                    pa.array(kinds, pa.string()),
                    pa.array(main, pa.string()),
                    pa.array(tables, t_tables),
                    pa.array(forms, t_forms),
                    pa.array(counters, t_counters),
                ],
                names=[f.name for f in out_schema.fields],
            )

    return src.mapInArrow(fn, out_schema)


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


def _exploded_stage(transcripts: DataFrame, spark_schema, rows_of) -> DataFrame:
    """Shared shape for the exploded blocks/nodes long tables."""
    import pyarrow as pa

    src = transcripts.select("conv_id", "turn_idx", "text")
    arrow_out = _arrow_schema(spark_schema)
    names = [f.name for f in spark_schema.fields]

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            convs = rb.column(0).to_pylist()
            turns = rb.column(1).to_pylist()
            texts = rb.column(2).to_pylist()
            rows: list[dict] = []
            for kc, kt, tx in zip(convs, turns, texts):
                res = extract_turn(f"{kc}|{kt}", tx)
                for row in rows_of(res):
                    row["conv_id"] = kc
                    row["turn_idx"] = kt
                    rows.append(row)
            arrays = [
                pa.array([r.get(name) for r in rows], arrow_out.field(name).type)
                for name in names
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return src.mapInArrow(fn, spark_schema)


def extract_blocks_long(transcripts: DataFrame) -> DataFrame:
    """Exploded long-format ``blocks`` table (SURVEY.md §1.4 (b)):
    one row per synthesized Block, for relational B1–B12 queries."""

    def rows_of(res: dict):
        return (_block_to_row(b) for b in res["blocks"])

    return _exploded_stage(transcripts, BLOCKS_LONG_SCHEMA, rows_of)


def extract_nodes_long(transcripts: DataFrame) -> DataFrame:
    """Exploded long-format DOM ``nodes`` table for relational D3/D4."""

    def rows_of(res: dict):
        return (dict(nd) for nd in res["nodes"])

    return _exploded_stage(transcripts, NODES_LONG_SCHEMA, rows_of)
