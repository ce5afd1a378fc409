"""A4/A5/B11/B14 — raw Textract-style response JSON ingestion: a user
of the reference brings paginated GetDocumentAnalysis JSON and the
relational post-processing runs on it unchanged, including
order-preserving chunk union, duplicate-block dedup, and QUERY→ANSWER.
"""

from __future__ import annotations

import json

import pytest

from amazon_textract_enhancer_spark.operators.blocks_relational import (
    document_text_relational,
    kv_relational,
    tables_relational,
)
from amazon_textract_enhancer_spark.sources.blockjson import (
    answers_relational,
    parse_response_chunks,
)


def _word(i, text):
    return {"Id": f"w{i}", "BlockType": "WORD", "Text": text, "Confidence": 99.0}


def _chunks_fixture():
    # chunk 0: PAGE + first LINE (+ overlap of l1 re-fetched in chunk 1)
    chunk0 = {
        "JobStatus": "SUCCEEDED",
        "NextToken": "tok1",
        "Blocks": [
            {
                "Id": "p1", "BlockType": "PAGE", "Page": 1,
                "Relationships": [{"Type": "CHILD", "Ids": ["l1", "l2", "t1", "k1", "q1"]}],
            },
            {
                "Id": "l1", "BlockType": "LINE", "Text": "hello world",
                "Confidence": 98.0,
                "Relationships": [{"Type": "CHILD", "Ids": ["w1", "w2"]}],
            },
            _word(1, "hello"), _word(2, "world"),
        ],
    }
    chunk1 = {
        "JobStatus": "SUCCEEDED",
        "NextToken": None,
        "Blocks": [
            # duplicate l1 (page overlap on re-fetch) — must dedup
            {
                "Id": "l1", "BlockType": "LINE", "Text": "hello world",
                "Confidence": 98.0,
                "Relationships": [{"Type": "CHILD", "Ids": ["w1", "w2"]}],
            },
            {
                "Id": "l2", "BlockType": "LINE", "Text": "second line",
                "Confidence": 97.0,
                "Relationships": [{"Type": "CHILD", "Ids": ["w3", "w4"]}],
            },
            _word(3, "second"), _word(4, "line"),
            # 1x2 table
            {
                "Id": "t1", "BlockType": "TABLE", "Page": 1,
                "Relationships": [{"Type": "CHILD", "Ids": ["c1", "c2"]}],
            },
            {"Id": "c1", "BlockType": "CELL", "RowIndex": 1, "ColumnIndex": 1,
             "RowSpan": 1, "ColumnSpan": 1, "Confidence": 96.0,
             "Relationships": [{"Type": "CHILD", "Ids": ["w5"]}]},
            {"Id": "c2", "BlockType": "CELL", "RowIndex": 1, "ColumnIndex": 2,
             "RowSpan": 1, "ColumnSpan": 1, "Confidence": 96.0,
             "Relationships": [{"Type": "CHILD", "Ids": ["w6"]}]},
            _word(5, "a,b"), _word(6, "c"),
            # KV pair
            {"Id": "k1", "BlockType": "KEY_VALUE_SET", "EntityTypes": ["KEY"],
             "Confidence": 95.0, "Page": 1,
             "Relationships": [{"Type": "VALUE", "Ids": ["v1"]},
                               {"Type": "CHILD", "Ids": ["w7"]}]},
            {"Id": "v1", "BlockType": "KEY_VALUE_SET", "EntityTypes": ["VALUE"],
             "Confidence": 94.0,
             "Relationships": [{"Type": "CHILD", "Ids": ["w8"]}]},
            _word(7, "Total:"), _word(8, "$42"),
            # QUERY → ANSWER
            {"Id": "q1", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "What is the total?", "Alias": "TOTAL"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["qr1"]}]},
            {"Id": "qr1", "BlockType": "QUERY_RESULT", "Text": "$42",
             "Confidence": 88.0},
        ],
    }
    return [
        ("doc1", 0, 0, json.dumps(chunk0)),
        ("doc1", 0, 1, json.dumps(chunk1)),
    ]


@pytest.fixture(scope="module")
def ingested(spark):
    chunks = spark.createDataFrame(
        _chunks_fixture(),
        "conv_id string, turn_idx int, page_seq int, response_json string",
    )
    return parse_response_chunks(chunks).cache()


def test_dedup_and_block_census(ingested):
    assert ingested.filter("id = 'l1'").count() == 1  # overlap deduped
    # 4 blocks in chunk0 + 14 new in chunk1 (l1 overlap collapsed)
    assert ingested.count() == 18


def test_document_text_from_json(ingested):
    out = document_text_relational(ingested).collect()
    assert out[0]["extracted_text"] == "hello world\nsecond line"


def test_table_csv_from_json(ingested):
    t = tables_relational(ingested).collect()[0]
    assert (t["n_rows"], t["n_cols"]) == (1, 2)
    assert t["csv"] == '"a,b",c'


def test_kv_from_json(ingested):
    kv = kv_relational(ingested).collect()[0]
    assert (kv["key"], kv["value"]) == ("Total:", "$42")


def test_query_answer_from_json(ingested):
    a = answers_relational(ingested).collect()[0]
    assert a["question"] == "What is the total?"
    assert a["answer"] == "$42"
    assert abs(a["confidence"] - 88.0) < 1e-6


def test_c3_c4_serving_fetch(spark, transcripts_df):
    """C3 table fetch + C4 case-insensitive form lookup over spans."""
    from pyspark.sql import functions as F

    from amazon_textract_enhancer_spark.operators.serving import (
        c3_fetch_table,
        c4_fetch_form_value,
    )
    from amazon_textract_enhancer_spark.stages import extract_spans

    spans = extract_spans(transcripts_df).cache()
    try:
        with_table = spans.filter(F.size("tables") >= 1).select(
            "conv_id", "turn_idx"
        ).first()
        got = c3_fetch_table(spans, with_table["conv_id"], with_table["turn_idx"], 1).collect()
        assert len(got) == 1 and got[0]["csv"]
        # out-of-range table index → empty, not error
        none = c3_fetch_table(spans, with_table["conv_id"], with_table["turn_idx"], 99).collect()
        assert none == []

        row = (
            spans.select("conv_id", F.explode("forms").alias("kv"))
            .select("conv_id", F.col("kv.key").alias("key"), F.col("kv.value").alias("value"))
            .first()
        )
        # deliberately query with wrong case + padding
        got_kv = c4_fetch_form_value(spans, row["conv_id"], "  " + row["key"].upper() + " ").collect()
        assert any(r["value"] == row["value"] for r in got_kv)
    finally:
        spans.unpersist()


def test_answer_pick_is_first_resolved_query_result(spark):
    """B11 semantics alignment (r5): one row per QUERY block; the
    answer is the FIRST ANSWER id that resolves to a QUERY_RESULT —
    dangling ids and non-QUERY_RESULT targets are skipped in order; a
    query with nothing resolvable keeps its row with ("", 0.0). Matches
    core.blocks.answer_queries exactly (the ★ twin's reference)."""
    import json

    chunk = {
        "JobStatus": "SUCCEEDED",
        "Blocks": [
            # dangling first id, then a real result -> skip-then-find
            {"Id": "qa", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "a?"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["ghost", "r1"]}]},
            {"Id": "r1", "BlockType": "QUERY_RESULT", "Text": "A1",
             "Confidence": 91.0},
            # first id resolves to a WORD (not QUERY_RESULT) -> type skip
            {"Id": "qb", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "b?"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["w1", "r2"]}]},
            {"Id": "w1", "BlockType": "WORD", "Text": "nope",
             "Confidence": 99.0},
            {"Id": "r2", "BlockType": "QUERY_RESULT", "Text": "B1",
             "Confidence": 92.0},
            # no ANSWER relationship -> default row, not a dropped row
            {"Id": "qc", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "c?"}},
            # two resolvable ids -> FIRST wins (the break in B11)
            {"Id": "qd", "BlockType": "QUERY", "Page": 1,
             "Query": {"Text": "d?"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["r3", "r4"]}]},
            {"Id": "r3", "BlockType": "QUERY_RESULT", "Text": "D-first",
             "Confidence": 80.0},
            {"Id": "r4", "BlockType": "QUERY_RESULT", "Text": "D-second",
             "Confidence": 85.0},
        ],
    }
    df = spark.createDataFrame(
        [("c", 0, 0, json.dumps(chunk))],
        "conv_id string, turn_idx int, page_seq int, response_json string",
    )
    got = {
        r["question"]: (r["answer"], round(r["confidence"], 2))
        for r in answers_relational(parse_response_chunks(df)).collect()
    }
    assert got == {
        "a?": ("A1", 91.0),
        "b?": ("B1", 92.0),
        "c?": ("", 0.0),
        "d?": ("D-first", 80.0),
    }

    # and the pure-Python reference agrees on the same blocks
    from amazon_textract_enhancer_spark.core.blocks import answer_queries

    ref = {
        a["question"]: (a["answer"], round(a["confidence"], 2))
        for a in answer_queries(chunk["Blocks"])
    }
    assert ref == got


def test_answer_null_text_result_still_wins_and_page_defaults(spark):
    """B11 r5 regression: a QUERY_RESULT with NO Text is still RESOLVED
    — the reference breaks at it and serves ("", its confidence), so a
    later text-bearing id must NOT overtake it (the old window ordered
    on answer.isNull() and did exactly that). Also pins the reference's
    ``int(qb.get("Page") or 1)`` default for a QUERY without Page."""
    import json

    chunk = {
        "JobStatus": "SUCCEEDED",
        "Blocks": [
            # first resolved result has no Text -> ("", 50.0) wins
            {"Id": "qe", "BlockType": "QUERY", "Page": 3,
             "Query": {"Text": "e?"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["r5", "r6"]}]},
            {"Id": "r5", "BlockType": "QUERY_RESULT", "Confidence": 50.0},
            {"Id": "r6", "BlockType": "QUERY_RESULT", "Text": "late",
             "Confidence": 80.0},
            # QUERY without Page -> page defaults to 1
            {"Id": "qf", "BlockType": "QUERY",
             "Query": {"Text": "f?"},
             "Relationships": [{"Type": "ANSWER", "Ids": ["r7"]}]},
            {"Id": "r7", "BlockType": "QUERY_RESULT", "Text": "F1",
             "Confidence": 70.0},
        ],
    }
    df = spark.createDataFrame(
        [("c", 0, 0, json.dumps(chunk))],
        "conv_id string, turn_idx int, page_seq int, response_json string",
    )
    got = {
        r["question"]: (r["answer"], round(r["confidence"], 2), r["page"])
        for r in answers_relational(parse_response_chunks(df)).collect()
    }
    assert got == {"e?": ("", 50.0, 3), "f?": ("F1", 70.0, 1)}

    from amazon_textract_enhancer_spark.core.blocks import answer_queries

    ref = {
        a["question"]: (a["answer"], round(a["confidence"], 2), a["page"])
        for a in answer_queries(chunk["Blocks"])
    }
    assert ref == got
