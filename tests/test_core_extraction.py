"""M0 tests — pure-Python core vs generation-intent goldens.

The goldens are planted by the generator (fixtures.py), NOT computed by
the extractor, so these tests are non-circular: they prove the density
heuristics / grid detection / KV pairing recover exactly the planted
main content (SURVEY.md §5.1).
"""

from __future__ import annotations

import pytest

from amazon_textract_enhancer_spark.core import (
    extract_turn,
    parse_csv,
    render_csv,
    sniff_kind,
)
from amazon_textract_enhancer_spark.fixtures import generate_transcripts


@pytest.fixture(scope="module")
def fixture_data():
    rows, goldens = generate_transcripts(seed=42, n_convs=25)
    gmap = {(g["conv_id"], g["turn_idx"]): g for g in goldens}
    return rows, gmap


def test_generator_is_deterministic():
    r1, g1 = generate_transcripts(seed=42, n_convs=5)
    r2, g2 = generate_transcripts(seed=42, n_convs=5)
    assert r1 == r2
    assert g1 == g2
    r3, _ = generate_transcripts(seed=43, n_convs=5)
    assert r1 != r3


def test_sniff_kinds(fixture_data):
    rows, gmap = fixture_data
    for r in rows:
        g = gmap[(r["conv_id"], r["turn_idx"])]
        if r["text"] == "":
            continue  # empty → plain by definition
        assert sniff_kind(r["text"]) == g["kind"], r["text"][:120]


def test_extracted_text_matches_planted_golden(fixture_data):
    rows, gmap = fixture_data
    n = 0
    for r in rows:
        g = gmap[(r["conv_id"], r["turn_idx"])]
        res = extract_turn(f"{r['conv_id']}|{r['turn_idx']}", r["text"])
        assert res["extracted_text"] == g["text"], (
            g["kind"], r["text"][:300], res["extracted_text"][:300], g["text"][:300])
        n += 1
    assert n > 200  # the fixture is non-trivial


def test_tables_match_planted_grids(fixture_data):
    rows, gmap = fixture_data
    seen_tables = 0
    for r in rows:
        g = gmap[(r["conv_id"], r["turn_idx"])]
        res = extract_turn(f"{r['conv_id']}|{r['turn_idx']}", r["text"])
        assert len(res["tables"]) == len(g["tables"])
        for got, want in zip(res["tables"], g["tables"]):
            assert got["n_rows"] == want["n_rows"]
            assert got["n_cols"] == want["n_cols"]
            assert got["page"] == want["page"]
            # grid text equality via the CSV (round-trips cell placement)
            assert parse_csv(got["csv"]) == want["rows"]
            # first row is COLUMN_HEADER-flagged (layout.py convention)
            hdr = [c for c in got["cells"] if c["r"] == 1]
            assert all(c["is_header"] for c in hdr)
            seen_tables += 1
    assert seen_tables > 10


def test_forms_match_planted_kv(fixture_data):
    rows, gmap = fixture_data
    seen = 0
    for r in rows:
        g = gmap[(r["conv_id"], r["turn_idx"])]
        res = extract_turn(f"{r['conv_id']}|{r['turn_idx']}", r["text"])
        got = [(f["key"], f["value"], f["page"]) for f in res["forms"]]
        want = [(f["key"], f["value"], f["page"]) for f in g["forms"]]
        assert sorted(got) == sorted(want)
        seen += len(want)
    assert seen > 10


def test_empty_payload_is_skipped_not_failed():
    res = extract_turn("k|0", "")
    assert res["extracted_text"] == ""
    assert res["counters"]["skipped"] is True
    assert res["counters"]["skip_reason"] == "empty"
    res2 = extract_turn("k|1", None)
    assert res2["counters"]["skipped"] is True


def test_extraction_is_deterministic(fixture_data):
    rows, _ = fixture_data
    r = rows[0]
    a = extract_turn("k|0", r["text"])
    b = extract_turn("k|0", r["text"])
    assert a == b


def test_csv_roundtrip_property():
    import random

    rng = random.Random(7)
    alphabet = ['a', 'b', ',', '"', '\n', ' ', 'x,y', '""', 'q"r']
    for _ in range(200):
        g = [
            ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 5)))
             for _ in range(rng.randint(1, 4))]
            for _ in range(rng.randint(1, 4))
        ]
        assert parse_csv(render_csv(g)) == g
