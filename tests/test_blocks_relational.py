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
