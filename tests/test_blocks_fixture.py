"""FIXTURES.md §2 — hand-authored Block-forest cases, shaped exactly per
the Textract Block model (vendor/textract-service-2.json:1430-1495),
covering every BlockType × Relationship case of SURVEY.md §2.B.
"""

from __future__ import annotations

from amazon_textract_enhancer_spark.core import (
    answer_queries,
    build_block_map,
    document_text,
    extract_kv_pairs,
    get_text,
    reconstruct_tables,
)
from amazon_textract_enhancer_spark.core.blocks import merge_paginated
from amazon_textract_enhancer_spark.fixtures import generate_transcripts
from amazon_textract_enhancer_spark.core import extract_turn
from amazon_textract_enhancer_spark.schemas import (
    BLOCK_TYPES,
    ENTITY_TYPES,
    RELATIONSHIP_TYPES,
    SELECTION_STATUSES,
    TEXT_TYPES,
)


def _w(i, text):
    return {"Id": f"w{i}", "BlockType": "WORD", "Text": text, "Confidence": 99.0}


def _line(i, word_ids, text=None):
    return {
        "Id": f"l{i}",
        "BlockType": "LINE",
        "Text": text,
        "Confidence": 98.0,
        "Relationships": [{"Type": "CHILD", "Ids": word_ids}],
    }


def _page(i, child_ids, page=1):
    return {
        "Id": f"p{i}",
        "BlockType": "PAGE",
        "Page": page,
        "Relationships": [{"Type": "CHILD", "Ids": child_ids}],
    }


def test_page_line_word_text_assembly():
    blocks = [
        _page(1, ["l1", "l2"]),
        _line(1, ["w1", "w2"], "hello world"),
        _line(2, ["w3"], "bye"),
        _w(1, "hello"), _w(2, "world"), _w(3, "bye"),
    ]
    bmap = build_block_map(blocks)
    assert get_text(bmap["l1"], bmap) == "hello world"
    assert document_text(blocks, bmap) == "hello world\nbye"


def test_selection_element_convention():
    blocks = [
        _line(1, ["w1", "s1"]),
        _w(1, "agree"),
        {"Id": "s1", "BlockType": "SELECTION_ELEMENT", "SelectionStatus": "SELECTED"},
        _line(2, ["w2", "s2"]),
        _w(2, "decline"),
        {"Id": "s2", "BlockType": "SELECTION_ELEMENT", "SelectionStatus": "NOT_SELECTED"},
    ]
    bmap = build_block_map(blocks)
    assert get_text(bmap["l1"], bmap) == "agree X"
    assert get_text(bmap["l2"], bmap) == "decline"


def _cell(i, r, c, word_ids, rs=1, cs=1, ent=None):
    b = {
        "Id": f"c{i}", "BlockType": "CELL", "RowIndex": r, "ColumnIndex": c,
        "RowSpan": rs, "ColumnSpan": cs, "Confidence": 97.0,
    }
    if word_ids:
        b["Relationships"] = [{"Type": "CHILD", "Ids": word_ids}]
    if ent:
        b["EntityTypes"] = ent
    return b


def test_full_3x3_table_grid():
    cells, words = [], []
    i = 0
    for r in range(1, 4):
        for c in range(1, 4):
            i += 1
            words.append(_w(100 + i, f"t{r}{c}"))
            cells.append(_cell(i, r, c, [f"w{100 + i}"],
                               ent=["COLUMN_HEADER"] if r == 1 else None))
    table = {"Id": "t1", "BlockType": "TABLE", "Page": 1,
             "Relationships": [{"Type": "CHILD", "Ids": [c["Id"] for c in cells]}]}
    blocks = [table] + cells + words
    out = reconstruct_tables(blocks)
    assert len(out) == 1
    t = out[0]
    assert (t["n_rows"], t["n_cols"]) == (3, 3)
    assert t["csv"] == "t11,t12,t13\nt21,t22,t23\nt31,t32,t33"
    assert all(c["is_header"] for c in t["cells"] if c["r"] == 1)
    assert not any(c["is_header"] for c in t["cells"] if c["r"] > 1)


def test_table_missing_cells_empty_fill():
    cells = [_cell(1, 1, 1, ["w1"]), _cell(2, 2, 2, ["w2"])]
    words = [_w(1, "a"), _w(2, "b")]
    table = {"Id": "t1", "BlockType": "TABLE",
             "Relationships": [{"Type": "CHILD", "Ids": ["c1", "c2"]}]}
    t = reconstruct_tables([table] + cells + words)[0]
    assert t["csv"] == "a,\n,b"


def test_table_spans_and_merged_cell():
    # 2x2 where (1,1)-(1,2) is one merged cell with text "big title"
    words = [_w(1, "big"), _w(2, "title"), _w(3, "x"), _w(4, "y")]
    c1 = _cell(1, 1, 1, ["w1", "w2"], cs=1)
    c2 = _cell(2, 1, 2, [], cs=1)
    c3 = _cell(3, 2, 1, ["w3"])
    c4 = _cell(4, 2, 2, ["w4"])
    merged = {
        "Id": "m1", "BlockType": "MERGED_CELL", "RowIndex": 1, "ColumnIndex": 1,
        "RowSpan": 1, "ColumnSpan": 2,
        "Relationships": [{"Type": "CHILD", "Ids": ["c1", "c2"]}],
    }
    table = {
        "Id": "t1", "BlockType": "TABLE",
        "Relationships": [
            {"Type": "CHILD", "Ids": ["c1", "c2", "c3", "c4"]},
            {"Type": "MERGED_CELL", "Ids": ["m1"]},
        ],
    }
    t = reconstruct_tables([table, merged, c1, c2, c3, c4] + words)[0]
    assert (t["n_rows"], t["n_cols"]) == (2, 2)
    # anchor gets merged text, swallowed constituent is blanked
    assert t["csv"] == "big title,\nx,y"


def test_csv_hostile_cell_text():
    words = [_w(1, 'a,b'), _w(2, 'q"r')]
    c1 = _cell(1, 1, 1, ["w1"])
    c2 = _cell(2, 1, 2, ["w2"])
    table = {"Id": "t1", "BlockType": "TABLE",
             "Relationships": [{"Type": "CHILD", "Ids": ["c1", "c2"]}]}
    t = reconstruct_tables([table, c1, c2] + words)[0]
    assert t["csv"] == '"a,b","q""r"'


def test_kv_pairs_with_selection_value():
    blocks = [
        {"Id": "k1", "BlockType": "KEY_VALUE_SET", "EntityTypes": ["KEY"],
         "Confidence": 95.0, "Page": 1,
         "Relationships": [{"Type": "VALUE", "Ids": ["v1"]},
                           {"Type": "CHILD", "Ids": ["w1"]}]},
        {"Id": "v1", "BlockType": "KEY_VALUE_SET", "EntityTypes": ["VALUE"],
         "Confidence": 94.0,
         "Relationships": [{"Type": "CHILD", "Ids": ["w2", "w3"]}]},
        {"Id": "k2", "BlockType": "KEY_VALUE_SET", "EntityTypes": ["KEY"],
         "Confidence": 93.0, "Page": 1,
         "Relationships": [{"Type": "VALUE", "Ids": ["v2"]},
                           {"Type": "CHILD", "Ids": ["w4"]}]},
        {"Id": "v2", "BlockType": "KEY_VALUE_SET", "EntityTypes": ["VALUE"],
         "Confidence": 92.0,
         "Relationships": [{"Type": "CHILD", "Ids": ["s1"]}]},
        {"Id": "s1", "BlockType": "SELECTION_ELEMENT", "SelectionStatus": "SELECTED"},
        _w(1, "Name:"), _w(2, "Jane"), _w(3, "Doe"), _w(4, "Agreed"),
    ]
    kv = extract_kv_pairs(blocks)
    assert [(p["key"], p["value"], p["selection"]) for p in kv] == [
        ("Name:", "Jane Doe", None),
        ("Agreed", "X", "SELECTED"),
    ]


def test_query_answer():
    blocks = [
        {"Id": "q1", "BlockType": "QUERY", "Page": 1,
         "Query": {"Text": "What is the total?", "Alias": "TOTAL"},
         "Relationships": [{"Type": "ANSWER", "Ids": ["qr1"]}]},
        {"Id": "qr1", "BlockType": "QUERY_RESULT", "Text": "$42.00",
         "Confidence": 88.5},
    ]
    out = answer_queries(blocks)
    assert out == [{"alias": "TOTAL", "question": "What is the total?",
                    "answer": "$42.00", "confidence": 88.5, "page": 1}]


def test_dangling_relationship_id_skipped_and_counted():
    counters = {}
    blocks = [_line(1, ["w1", "wMISSING"]), _w(1, "only")]
    bmap = build_block_map(blocks)
    assert get_text(bmap["l1"], bmap, counters) == "only"
    assert counters["dangling_ids"] == 1


def test_paginated_chunk_union_preserves_order_and_dedupes():
    c1 = [_page(1, ["l1"]), _line(1, ["w1"], "one"), _w(1, "one")]
    c2 = [_line(1, ["w1"], "one"),  # overlap: re-fetched block
          _line(2, ["w2"], "two"), _w(2, "two")]
    merged = merge_paginated([c1, c2])
    ids = [b["Id"] for b in merged]
    assert ids == ["p1", "l1", "w1", "l2", "w2"]
    # page references l1 only; doc text intact
    assert document_text(merged) == "one"


def test_multipage_document_text_page_order():
    blocks = [
        _page(2, ["l2"], page=2),
        _page(1, ["l1"], page=1),
        _line(1, ["w1"], "first"),
        _line(2, ["w2"], "second"),
        _w(1, "first"), _w(2, "second"),
    ]
    assert document_text(blocks) == "first\nsecond"


def test_enum_conformance_of_synthesized_blocks():
    """SURVEY.md §5.5 — every enum string D5 emits ∈ the [SVC] enums."""
    rows, _ = generate_transcripts(seed=42, n_convs=30)
    checked = 0
    for r in rows:
        res = extract_turn(f"{r['conv_id']}|{r['turn_idx']}", r["text"])
        for b in res["blocks"]:
            assert b["BlockType"] in BLOCK_TYPES
            for e in b.get("EntityTypes") or []:
                assert e in ENTITY_TYPES
            for rel in b.get("Relationships") or []:
                assert rel["Type"] in RELATIONSHIP_TYPES
            if "SelectionStatus" in b:
                assert b["SelectionStatus"] in SELECTION_STATUSES
            if "TextType" in b:
                assert b["TextType"] in TEXT_TYPES
            if "Confidence" in b:
                assert 0.0 <= b["Confidence"] <= 100.0
            checked += 1
    assert checked > 1000
