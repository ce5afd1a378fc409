"""M2 equality proof: the Catalyst-planned B4/B5/B6/B9/B10 dataflow over
the exploded blocks table produces byte-identical results to the fused
in-UDF path (core/blocks.py) on the whole fixture corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_textract_enhancer_spark.operators.blocks_relational import (
    container_texts,
    document_text_relational,
    kv_relational,
    tables_relational,
)
from amazon_textract_enhancer_spark.stages import extract_blocks_long, extract_spans


@pytest.fixture(scope="module")
def blocks_df(transcripts_df):
    return extract_blocks_long(transcripts_df).cache()


@pytest.fixture(scope="module")
def fused_spans(transcripts_df):
    return extract_spans(transcripts_df).cache()


def test_document_text_matches_fused(blocks_df, fused_spans):
    rel = {
        (r["conv_id"], r["turn_idx"]): r["extracted_text"]
        for r in document_text_relational(blocks_df).collect()
    }
    fused = fused_spans.filter(F.col("kind") == "layout").select(
        "conv_id", "turn_idx", "extracted_text"
    ).collect()
    assert len(fused) > 50
    for r in fused:
        want = r["extracted_text"]
        got = rel.get((r["conv_id"], r["turn_idx"]), "")
        assert got == want, (r["conv_id"], r["turn_idx"])


def test_table_csv_matches_fused(blocks_df, fused_spans):
    rel = {}
    for r in tables_relational(blocks_df).collect():
        rel[(r["conv_id"], r["turn_idx"], r["table_id"])] = (
            r["n_rows"], r["n_cols"], r["page"], r["csv"]
        )
    n = 0
    layout_only = fused_spans.filter(F.col("kind") == "layout")
    for row in layout_only.select("conv_id", "turn_idx", "tables").collect():
        for tb in row["tables"]:
            key = (row["conv_id"], row["turn_idx"], tb["table_id"])
            assert key in rel
            assert rel[key] == (tb["n_rows"], tb["n_cols"], tb["page"], tb["csv"]), key
            n += 1
    assert n == len(rel) and n > 10


def test_kv_pairs_match_fused(blocks_df, fused_spans):
    rel: dict = {}
    for r in kv_relational(blocks_df).collect():
        rel.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (r["key"], r["value"], r["page"], r["selection"])
        )
    n = 0
    layout_only = fused_spans.filter(F.col("kind") == "layout")
    for row in layout_only.select("conv_id", "turn_idx", "forms").collect():
        want = [(f["key"], f["value"], f["page"], f["selection"]) for f in row["forms"]]
        got = rel.get((row["conv_id"], row["turn_idx"]), [])
        assert sorted(got) == sorted(want), (row["conv_id"], row["turn_idx"])
        n += len(want)
    assert n > 10


def test_container_texts_order_sensitivity(spark):
    """The struct-sorted aggregation recovers CHILD order even when the
    blocks table arrives shuffled (the №1 correctness trap)."""
    rows = [
        # LINE with 3 words, child order w2, w1, w3 (deliberately not id order)
        ("c", 0, "l1", "LINE", None, None, ["w2", "w1", "w3"]),
        ("c", 0, "w1", "WORD", "beta", None, None),
        ("c", 0, "w2", "WORD", "alpha", None, None),
        ("c", 0, "w3", "WORD", "gamma", None, None),
        ("c", 0, "s1", "SELECTION_ELEMENT", None, "SELECTED", None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, id string, block_type string, "
        "text string, selection_status string, child_ids array<string>",
    ).repartition(4)
    out = container_texts(df, ["LINE"]).collect()
    assert out[0]["text"] == "alpha beta gamma"


def test_merged_cells_relational_matches_fused_on_ingested_json(spark):
    """B7 on the relational path (VERDICT r1 item 6): a raw Textract
    response containing MERGED_CELL, ingested through
    parse_response_chunks, must render the SAME grid as the fused core
    (anchor carries merged text, constituents swallowed, dims keep the
    merged span's extent)."""
    import json

    from amazon_textract_enhancer_spark.core.blocks import reconstruct_tables
    from amazon_textract_enhancer_spark.core.csvutil import render_csv  # noqa: F401
    from amazon_textract_enhancer_spark.sources.blockjson import parse_response_chunks

    def w(i, text):
        return {"Id": f"w{i}", "BlockType": "WORD", "Text": text, "Confidence": 99.0}

    def cell(i, r, c, word_ids, rs=1, cs=1):
        b = {"Id": f"c{i}", "BlockType": "CELL", "RowIndex": r, "ColumnIndex": c,
             "RowSpan": rs, "ColumnSpan": cs, "Confidence": 96.0}
        if word_ids:
            b["Relationships"] = [{"Type": "CHILD", "Ids": word_ids}]
        return b

    blocks_json = [
        {"Id": "p1", "BlockType": "PAGE", "Page": 1,
         "Relationships": [{"Type": "CHILD", "Ids": ["t1"]}]},
        {"Id": "t1", "BlockType": "TABLE", "Page": 1,
         "Relationships": [
             {"Type": "CHILD", "Ids": ["c1", "c2", "c3", "c4", "c5", "c6"]},
             {"Type": "MERGED_CELL", "Ids": ["m1", "m2"]},
         ]},
        # header row: c1+c2 merged horizontally ("big title"), c3 normal
        cell(1, 1, 1, ["w1", "w2"]), cell(2, 1, 2, []), cell(3, 1, 3, ["w3"]),
        # body row: c4 normal, c5+c6 merged ("sum 42" from constituents)
        cell(4, 2, 1, ["w4"]), cell(5, 2, 2, ["w5"]), cell(6, 2, 3, ["w6"]),
        {"Id": "m1", "BlockType": "MERGED_CELL", "RowIndex": 1, "ColumnIndex": 1,
         "RowSpan": 1, "ColumnSpan": 2,
         "Relationships": [{"Type": "CHILD", "Ids": ["c1", "c2"]}]},
        {"Id": "m2", "BlockType": "MERGED_CELL", "RowIndex": 2, "ColumnIndex": 2,
         "RowSpan": 1, "ColumnSpan": 2,
         "Relationships": [{"Type": "CHILD", "Ids": ["c5", "c6"]}]},
        w(1, "big"), w(2, "title"), w(3, "hdr"),
        w(4, "left"), w(5, "sum"), w(6, "42"),
    ]
    resp = {"JobStatus": "SUCCEEDED", "NextToken": None, "Blocks": blocks_json}
    chunks = spark.createDataFrame(
        [("doc1", 0, 0, json.dumps(resp))],
        "conv_id string, turn_idx int, page_seq int, response_json string",
    )
    ingested = parse_response_chunks(chunks)
    got = tables_relational(ingested).collect()
    assert len(got) == 1
    g = got[0]

    want = reconstruct_tables(blocks_json)[0]
    assert (g["n_rows"], g["n_cols"]) == (want["n_rows"], want["n_cols"]) == (2, 3)
    assert g["csv"] == want["csv"] == "big title,,hdr\nleft,sum 42,"
